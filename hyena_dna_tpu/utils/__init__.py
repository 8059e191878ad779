from hyena_dna_tpu.utils.config import (
    instantiate,
    load_config,
    apply_overrides,
    resolve_interpolations,
)
from hyena_dna_tpu.utils.registry import REGISTRY

__all__ = [
    "instantiate",
    "load_config",
    "apply_overrides",
    "resolve_interpolations",
    "REGISTRY",
]
