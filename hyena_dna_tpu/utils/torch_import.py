"""Torch-checkpoint importer: map reference PyTorch state dicts onto the flax
parameter tree, for logit/perplexity parity against published
`LongSafari/hyenadna-*` weights.

Key-layout parity targets:
  * reference module tree `ConvLMHeadModel`
    (`/root/reference/src/models/sequence/long_conv_lm.py:400-502`):
    `backbone.embeddings.word_embeddings.weight`,
    `backbone.layers.{i}.mixer.*`, `.norm1/2.*`, `.mlp.fc1/fc2.*`,
    `backbone.ln_f.*`, tied `lm_head.weight`;
  * Lightning checkpoints prefix everything with `model.` and include
    torchmetrics state (`/root/reference/evals/hg38_inference.py:57-71`);
  * gradient-checkpointed runs insert `.mixer.layer.` / `.mlp.layer.`
    (`/root/reference/huggingface.py:28-67` inject_substring).

Weight-layout conversions (torch -> flax):
  * nn.Linear weight (out, in) -> Dense kernel (in, out): transpose;
  * depthwise Conv1d weight (C, 1, K) -> (C, K): squeeze;
  * LayerNorm weight -> scale;
  * Embedding weight: unchanged;
  * Sin's shared `freq` appears once per MLP position in the torch state
    dict (same tensor repeated) -> single flax param;
  * `lm_head.weight` dropped (tied to embeddings in both frameworks).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np
from flax import traverse_util


def _normalize_key(key: str) -> Optional[str]:
    """Strip wrapper prefixes / checkpoint-remat artifacts; None = drop."""
    if key.startswith("model."):
        key = key[len("model."):]
    # metric buffers from the Lightning module
    if key.startswith(("train_torchmetrics", "val_torchmetrics", "test_torchmetrics")):
        return None
    # remat wrappers (`huggingface.py:28-45`)
    key = key.replace(".mixer.layer.", ".mixer.")
    key = key.replace(".mlp.layer.", ".mlp.")
    if key == "lm_head.weight":
        return None  # tied
    return key


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference torch state dict -> flax params (nested dict of numpy)."""
    out: Dict[tuple, np.ndarray] = {}
    inner_linear_max: Dict[str, int] = {}

    # first pass: find the last implicit_filter index per layer (mlp_out)
    for raw in sd:
        key = _normalize_key(raw)
        if key is None:
            continue
        m = re.match(r"(.*filter_fn)\.implicit_filter\.(\d+)\.weight$", key)
        if m:
            prefix, idx = m.group(1), int(m.group(2))
            inner_linear_max[prefix] = max(inner_linear_max.get(prefix, 0), idx)

    def put(path: str, value: np.ndarray):
        out[tuple(path.split("/"))] = np.asarray(value)

    for raw, val in sd.items():
        key = _normalize_key(raw)
        if key is None:
            continue
        val = np.asarray(val)
        parts = key.split(".")

        # backbone.layers.{i}.X -> backbone/layers_{i}/X
        key = re.sub(r"\blayers\.(\d+)\.", lambda m: f"layers_{m.group(1)}.", key)

        # --- embeddings ---
        if key.endswith("embeddings.word_embeddings.weight"):
            put(key.replace(".", "/").replace("/weight", "/embedding"), val)
            continue
        if key.endswith("embeddings.position_embeddings.weight"):
            put(key.replace(".", "/").replace("/weight", "/embedding"), val)
            continue

        # --- layer norms (norm1/norm2/ln_f) ---
        if re.search(r"\b(norm1|norm2|ln_f)\.(weight|bias)$", key):
            key = key.replace(".weight", "/scale").replace(".bias", "/bias")
            put(key.replace(".", "/"), val)
            continue

        # --- hyena mixer ---
        if ".mixer." in key:
            m = re.match(r"(.*)\.mixer\.(.*)$", key)
            base, rest = m.group(1).replace(".", "/") + "/mixer", m.group(2)
            if rest in ("in_proj.weight", "out_proj.weight"):
                put(f"{base}/{rest.split('.')[0]}/kernel", val.T)
            elif rest in ("in_proj.bias", "out_proj.bias"):
                put(f"{base}/{rest.split('.')[0]}/bias", val)
            elif rest == "short_filter.weight":
                put(f"{base}/short_filter_weight", val[:, 0, :])
            elif rest == "short_filter.bias":
                put(f"{base}/short_filter_bias", val)
            elif rest == "filter_fn.bias":
                put(f"{base}/filter_fn/bias", val)
            elif rest == "filter_fn.pos_emb.z":
                put(f"{base}/filter_fn/pos_emb_z", val)
            elif rest == "filter_fn.pos_emb.t":
                pass  # frozen linspace, derived
            elif rest == "filter_fn.modulation.deltas":
                put(f"{base}/filter_fn/deltas", val)
            elif re.match(r"filter_fn\.implicit_filter\.(\d+)\.(weight|bias|freq)$", rest):
                idx, leaf = re.match(
                    r"filter_fn\.implicit_filter\.(\d+)\.(weight|bias|freq)$", rest
                ).groups()
                idx = int(idx)
                prefix_t = _normalize_key(raw)
                prefix_t = re.match(r"(.*filter_fn)\.", prefix_t).group(1)
                last = inner_linear_max.get(prefix_t, 0)
                if leaf == "freq":
                    put(f"{base}/filter_fn/freq", val)  # shared Sin; same tensor
                elif idx == 0:
                    put(f"{base}/filter_fn/mlp_in/{'kernel' if leaf=='weight' else 'bias'}",
                        val.T if leaf == "weight" else val)
                elif idx == last:
                    assert leaf == "weight", "mlp_out has no bias"
                    put(f"{base}/filter_fn/mlp_out/kernel", val.T)
                else:
                    j = idx // 2 - 1  # linear layers at even indices 2,4,...
                    put(f"{base}/filter_fn/mlp_inner_{j}/{'kernel' if leaf=='weight' else 'bias'}",
                        val.T if leaf == "weight" else val)
            # attention mixers
            elif rest in ("Wqkv.weight", "out_proj.weight"):
                put(f"{base}/{rest.split('.')[0]}/kernel", val.T)
            elif rest in ("Wqkv.bias",):
                put(f"{base}/Wqkv/bias", val)
            else:
                raise KeyError(f"unmapped mixer key: {raw} ({rest})")
            continue

        # --- classification head (standalone_hyenadna.py:869-905 use_head) ---
        if re.search(r"\bhead\.output_transform\.(weight|bias)$", key):
            leaf = "kernel" if key.endswith("weight") else "bias"
            put(f"head/output_transform/{leaf}", val.T if leaf == "kernel" else val)
            continue

        # --- fine-tune decoder head (Lightning `decoder.0.output_transform`,
        # evals/hg38_inference_decoder.py:151-155) ---
        m = re.match(r"decoder\.0\.output_transform\.(weight|bias)$", key)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            put(f"decoder/output_transform/{leaf}", val.T if leaf == "kernel" else val)
            continue

        # --- MLP ---
        if re.search(r"\bmlp\.fc[12]\.(weight|bias)$", key):
            m = re.match(r"(.*)\.mlp\.(fc[12])\.(weight|bias)$", key)
            base = m.group(1).replace(".", "/")
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            v = val.T if leaf == "kernel" else val
            put(f"{base}/mlp/{m.group(2)}/{leaf}", v)
            continue

        raise KeyError(f"unmapped key: {raw}")

    return traverse_util.unflatten_dict(out)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .ckpt/.pt file into a {key: numpy} dict (lazy torch import)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def import_pretrained(path: str) -> Dict:
    """Convenience: torch checkpoint file -> flax params tree."""
    return convert_state_dict(load_torch_checkpoint(path))
