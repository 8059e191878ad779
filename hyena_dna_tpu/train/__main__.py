"""CLI entry: `python -m hyena_dna_tpu.train experiment=hg38/hg38_hyena k=v ...`

Mirrors the reference's `python -m train experiment=... key=val` Hydra entry
(`/root/reference/train.py:679-691`) on the dependency-free config system:
`configs/config.yaml` is the base, an `experiment=` override composes an
experiment file onto it, remaining args are dot-overrides.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

from hyena_dna_tpu.train.trainer import Trainer

def _enable_compile_cache():
    """Persistent XLA compilation cache: long-context programs take minutes
    to compile; cache survives process restarts (seqlen-warmup stages, bench
    reruns)."""
    import os

    import jax as _jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


_enable_compile_cache()
from hyena_dna_tpu.utils.config import (
    apply_overrides,
    deep_merge,
    load_config,
    resolve_interpolations,
)

CONFIG_DIR = Path(__file__).resolve().parents[2] / "configs"


def process_config(cfg):
    """Drop interpolation-only keys (leading "__"), mirroring the
    reference's `process_config` (`src/utils/train.py:56-96`)."""
    if isinstance(cfg, dict):
        return {k: process_config(v) for k, v in cfg.items()
                if not (isinstance(k, str) and k.startswith("__"))}
    if isinstance(cfg, list):
        return [process_config(v) for v in cfg]
    return cfg


def build_config(argv):
    overrides = []
    experiment = None
    for arg in argv:
        if arg.startswith("experiment="):
            experiment = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    cfg = load_config(CONFIG_DIR / "config.yaml", CONFIG_DIR)
    if experiment:
        exp = load_config(CONFIG_DIR / "experiment" / f"{experiment}.yaml", CONFIG_DIR)
        cfg = deep_merge(cfg, exp)
    cfg = apply_overrides(cfg, overrides)
    cfg = resolve_interpolations(cfg)
    return process_config(cfg)


def _config_max_seq(cfg) -> int:
    """Largest context the run will see, for the scoped-vmem decision."""
    ds = cfg.get("dataset", {}) or {}
    vals = [ds.get(k) or 0 for k in
            ("max_length", "max_length_val", "max_length_test")]
    l_max = ((cfg.get("model", {}) or {}).get("layer", {}) or {}).get("l_max")
    vals.append(l_max or 0)
    return max([v for v in vals if isinstance(v, (int, float))] or [0])


def main(argv=None):
    cfg = build_config(argv if argv is not None else sys.argv[1:])
    # before the TPU backend initializes: raise the Pallas scoped-vmem
    # budget — except for chain-conv contexts (fft >= 2^20) where the
    # default budget measures ~15% faster (see utils/tpu_flags.py)
    ensure_tpu_flags(max_seq_len=int(_config_max_seq(cfg)))
    trainer = Trainer(cfg)
    return trainer.fit()


if __name__ == "__main__":
    main()
