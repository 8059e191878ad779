"""Central `_name_` registries, mirroring `/root/reference/src/utils/registry.py:1-62`.

Dead entries in the reference registry (s4d, h3, vit_b_16, bpnet — modules
absent from the snapshot, SURVEY §2.3) are intentionally not reproduced.
Datamodules register themselves in `hyena_dna_tpu.data.datamodules`.
"""

from __future__ import annotations

from typing import Callable, Dict


def _lazy(path: str, attr: str) -> Callable:
    def build(*args, **kwargs):
        import importlib

        mod = importlib.import_module(path)
        return getattr(mod, attr)(*args, **kwargs)

    return build


MODEL_REGISTRY: Dict[str, Callable] = {
    # reference `registry.py:22-28`
    "lm": _lazy("hyena_dna_tpu.models", "ConvLMHeadModel"),
    "lm_simple": _lazy("hyena_dna_tpu.models", "ConvLMHeadModel"),  # no flash-attn split needed
    "dna_embedding": _lazy("hyena_dna_tpu.models", "DNAEmbeddingModel"),
    "model": _lazy("hyena_dna_tpu.models.sequence_model", "SequenceModel"),
    # AdaptiveLMTask assembly (`src/tasks/tasks.py:332-379`) as one module
    "adaptive_lm": _lazy("hyena_dna_tpu.models.adaptive_softmax", "AdaptiveLMModel"),
}

LAYER_REGISTRY: Dict[str, Callable] = {
    # reference `registry.py:31-40`
    "id": _lazy("hyena_dna_tpu.models.sequence_model", "SequenceIdentity"),
    "ff": _lazy("hyena_dna_tpu.models.sequence_model", "FF"),
    "mha": _lazy("hyena_dna_tpu.models", "MHA"),
    "hyena": _lazy("hyena_dna_tpu.models", "HyenaOperator"),
    "hyena-filter": _lazy("hyena_dna_tpu.models", "HyenaFilter"),
    "long-conv": _lazy("hyena_dna_tpu.models.long_conv", "LongConv"),
}

CALLBACK_REGISTRY: Dict[str, Callable] = {
    # reference `registry.py:43-56`
    "timer": _lazy("hyena_dna_tpu.train.callbacks", "Timer"),
    "params": _lazy("hyena_dna_tpu.train.callbacks", "ParamsLog"),
    "learning_rate_monitor": _lazy("hyena_dna_tpu.train.callbacks", "LearningRateMonitor"),
    "model_checkpoint": _lazy("hyena_dna_tpu.train.callbacks", "ModelCheckpoint"),
    "seqlen_warmup_reload": _lazy("hyena_dna_tpu.train.callbacks", "SeqlenWarmupReload"),
}

MODEL_STATE_HOOK_REGISTRY: Dict[str, Callable] = {
    # reference `registry.py:58-62` -> long_conv_lm.py:569-627
    "load_backbone": _lazy("hyena_dna_tpu.train.checkpoint", "load_backbone_hook"),
}

REGISTRY: Dict[str, Dict[str, Callable]] = {
    "model": MODEL_REGISTRY,
    "layer": LAYER_REGISTRY,
    "callbacks": CALLBACK_REGISTRY,
    "model_state_hook": MODEL_STATE_HOOK_REGISTRY,
}
