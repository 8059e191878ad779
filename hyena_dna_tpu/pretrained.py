"""Pretrained-model surface: the `HyenaDNAModel` standalone API and
`from_pretrained` loading of published checkpoints.

Parity targets:
  * `HyenaDNAModel` (`/root/reference/standalone_hyenadna.py:869-937`):
    backbone + optional pooled classification head (`use_head`/`n_classes`);
  * `HyenaDNAPreTrainedModel.from_pretrained`
    (`/root/reference/huggingface.py:70-127`): read `config.json` +
    `weights.ckpt` from a LongSafari-layout directory (or any torch .ckpt),
    build the scratch model, convert weights (incl. gradient-checkpoint key
    surgery, handled inside `torch_import`). Downloading is out of scope in
    this zero-egress environment — pass a local directory (e.g. a git-lfs
    clone of `LongSafari/hyenadna-tiny-1k-seqlen`).

Returns `(model, params)` — params as a jax-ready tree; with `use_head` the
head params are freshly initialized (the published checkpoints carry no
head, same as the reference scratch head).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn
from flax import traverse_util

from hyena_dna_tpu.data.tokenizer import CharacterTokenizer
from hyena_dna_tpu.models import DNAEmbeddingModel, ConvLMHeadModel
from hyena_dna_tpu.models.heads import SequenceDecoder


class HyenaDNAModel(fnn.Module):
    """Standalone model: LM backbone, returning logits (use_head=False ->
    hidden states; use_head=True -> pooled class logits)."""

    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    layer: Optional[dict] = None
    attn_layer_idx: Optional[tuple] = None
    attn_cfg: Optional[dict] = None
    max_position_embeddings: int = 0
    resid_dropout: float = 0.0
    embed_dropout: float = 0.1
    layer_norm_epsilon: float = 1e-5
    residual_in_fp32: bool = False
    pad_vocab_size_multiple: int = 1
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    use_head: bool = False
    n_classes: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            d_model=self.d_model,
            n_layer=self.n_layer,
            d_inner=self.d_inner,
            vocab_size=self.vocab_size,
            layer=self.layer,
            attn_layer_idx=self.attn_layer_idx,
            attn_cfg=self.attn_cfg,
            max_position_embeddings=self.max_position_embeddings,
            resid_dropout=self.resid_dropout,
            embed_dropout=self.embed_dropout,
            layer_norm_epsilon=self.layer_norm_epsilon,
            residual_in_fp32=self.residual_in_fp32,
            pad_vocab_size_multiple=self.pad_vocab_size_multiple,
            checkpoint_mixer=self.checkpoint_mixer,
            checkpoint_mlp=self.checkpoint_mlp,
            dtype=self.dtype,
        )
        self.embedding_model = DNAEmbeddingModel(**kw, name="model")
        if self.use_head:
            self.head = SequenceDecoder(
                d_model=self.d_model, d_output=self.n_classes, l_output=0,
                mode="pool", name="head",
            )

    def __call__(self, input_ids: jax.Array, deterministic: bool = True):
        hidden, _ = self.embedding_model(input_ids, deterministic=deterministic)
        if self.use_head:
            return self.head(hidden)
        return hidden


def from_pretrained(
    path: str | Path,
    use_head: bool = False,
    n_classes: int = 2,
    config: Optional[dict] = None,
    dtype: Any = jnp.float32,
) -> Tuple[HyenaDNAModel, dict, CharacterTokenizer]:
    """Load a LongSafari-layout directory (config.json + weights.ckpt) or a
    bare torch checkpoint + explicit config.

    Returns (model, params, tokenizer)."""
    from hyena_dna_tpu.utils.torch_import import import_pretrained

    path = Path(path)
    if path.is_dir():
        if config is None:
            config = json.loads((path / "config.json").read_text())
        ckpt_file = path / "weights.ckpt"
    else:
        assert config is not None, "need explicit config for a bare checkpoint"
        ckpt_file = path

    cfg = dict(config)
    for drop in ("fused_mlp", "fused_dropout_add_ln", "device", "dtype",
                 "initializer_cfg", "gradient_checkpointing"):
        cfg.pop(drop, None)
    layer = dict(cfg.get("layer") or {})
    layer.pop("fused_fft_conv", None)
    layer.pop("fused_bias_fc", None)
    # published checkpoints are loaded by standalone_hyenadna.py, whose
    # ExponentialModulation defaults to shift=0.05 (`standalone_hyenadna.py:140`
    # — differs from src/.../hyena.py:142's 0.0); match it unless configured
    layer.setdefault("shift", 0.05)
    cfg["layer"] = layer

    model = HyenaDNAModel(use_head=use_head, n_classes=n_classes, dtype=dtype, **cfg)

    seq_len = int(layer.get("l_max", 1024))
    sample = jnp.zeros((1, min(seq_len, 128)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]

    loaded = import_pretrained(str(ckpt_file))
    # imported tree is rooted at `backbone`; ours nests under model/backbone
    flat_new = dict(traverse_util.flatten_dict(params))
    flat_loaded = traverse_util.flatten_dict(loaded)
    n_hit = 0
    for lpath, val in flat_loaded.items():
        target = ("model",) + lpath
        if target in flat_new:
            assert flat_new[target].shape == val.shape, (
                f"shape mismatch {target}: {flat_new[target].shape} vs {val.shape}"
            )
            flat_new[target] = jnp.asarray(val)
            n_hit += 1
        else:
            raise KeyError(f"checkpoint key {'/'.join(lpath)} not in model")
    assert n_hit > 0, "no weights imported"
    params = traverse_util.unflatten_dict(flat_new)

    tokenizer = CharacterTokenizer(model_max_length=seq_len + 2)
    return model, params, tokenizer
