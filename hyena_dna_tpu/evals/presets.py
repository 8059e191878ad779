"""Eval preset loading: `configs/evals/*.yaml` -> eval CLI settings.

The reference ships eval presets (`/root/reference/configs/evals/*.yaml`)
consumed by its eval scripts' yaml loaders (`evals/hg38_inference.py:30-50`,
`soft_prompting_genomics.py`, `instruction_tuned_genomics.py`). Here each
preset feeds the matching CLI through `--preset`:

  * `hyena_dna_512ksl.yaml` (model shape for the 512k-seqlen checkpoint)
    -> `hg38_inference --preset ...` builds the model from its `model:`
    block instead of the tiny defaults.
  * `soft_prompting_genomics.yaml` / `instruction_tuned_genomics.yaml`
    -> `icl_cli --preset ...` takes mode + tuning hyperparameters +
    dataset settings as defaults (explicit CLI flags still win).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

from hyena_dna_tpu.utils.config import load_config


def load_eval_preset(path: str) -> Dict[str, Any]:
    p = Path(path)
    if not p.exists():  # allow bare names: "soft_prompting_genomics"
        repo = Path(__file__).resolve().parents[2]
        p = repo / "configs" / "evals" / (path.removesuffix(".yaml") + ".yaml")
    return load_config(str(p))


def build_model_from_preset(model_cfg: Dict[str, Any]):
    """ConvLMHeadModel from a preset's `model:` block (LM family only)."""
    from hyena_dna_tpu.models import ConvLMHeadModel

    cfg = dict(model_cfg)
    name = cfg.pop("_name_", "lm")
    assert name == "lm", f"eval presets build the LM family, got {name!r}"
    layer = dict(cfg.pop("layer"))
    layer.setdefault("_name_", "hyena")
    return ConvLMHeadModel(
        d_model=cfg["d_model"],
        n_layer=cfg["n_layer"],
        d_inner=cfg.get("d_inner", 4 * cfg["d_model"]),
        vocab_size=cfg.get("vocab_size", 12),
        pad_vocab_size_multiple=cfg.get("pad_vocab_size_multiple", 8),
        residual_in_fp32=cfg.get("residual_in_fp32", True),
        embed_dropout=cfg.get("embed_dropout", 0.1),
        resid_dropout=cfg.get("resid_dropout", 0.0),
        checkpoint_mixer=cfg.get("checkpoint_mixer", False),
        checkpoint_mlp=cfg.get("checkpoint_mlp", False),
        layer=layer,
    )


def apply_icl_preset(args, preset: Dict[str, Any], explicit: set):
    """Fill argparse `args` from an ICL eval preset; flags the user passed
    explicitly (names in `explicit`) keep their CLI values."""
    ev = preset.get("eval", {})
    ds = preset.get("dataset", {})
    mapping = {
        "mode": ev.get("_name_"),
        "lr": ev.get("lr"),
        "steps": ev.get("steps"),
        "n_soft": ev.get("n_tunable_tokens"),
        "dataset_name": ds.get("dataset_name"),
        "shots": ds.get("shots"),
        "max_length": ds.get("max_length"),
        "batch_size": ds.get("batch_size"),
    }
    for name, value in mapping.items():
        if value is not None and name not in explicit:
            setattr(args, name, value)
    return args
