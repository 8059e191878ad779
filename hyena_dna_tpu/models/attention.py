"""Multi-head attention mixer.

The reference uses flash-attn's `MHA` for layers listed in `attn_layer_idx`
(`/root/reference/src/models/sequence/long_conv_lm.py:64-83`; config
`configs/model/layer/mha_dna.yaml`: num_heads, causal=True). Parameterization:
a single packed `Wqkv: d -> 3d` projection and `out_proj: d -> d` (vendored
semantics at `/root/reference/src/models/sequence/simple_lm.py:26-148`), with
softmax scale 1/sqrt(head_dim).

TPU-first: `jax.nn.dot_product_attention` lowers to XLA's fused attention on
TPU; causal masking is handled inside the primitive (no materialized mask).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


class MHA(fnn.Module):
    d_model: int
    num_heads: int = 1
    causal: bool = True
    dropout: float = 0.0
    use_bias: bool = True
    rotary_emb_dim: int = 0
    softmax_scale: Optional[float] = None
    n_layer: int = 1
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, l, d = x.shape
        assert d == self.d_model
        h = self.num_heads
        hd = d // h

        qkv = fnn.Dense(
            3 * d,
            use_bias=self.use_bias,
            kernel_init=fnn.initializers.normal(stddev=self.init_std),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
            name="Wqkv",
        )(x)
        qkv = qkv.reshape(b, l, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.rotary_emb_dim > 0:
            q, k = _apply_rotary(q, k, self.rotary_emb_dim)

        scale = self.softmax_scale or 1.0 / math.sqrt(hd)
        out = jax.nn.dot_product_attention(
            q, k, v, scale=scale, is_causal=self.causal
        )
        if self.dropout > 0.0 and not deterministic:
            out = fnn.Dropout(rate=self.dropout, name="attn_drop")(
                out, deterministic=False
            )
        out = out.reshape(b, l, d)
        out = fnn.Dense(
            d,
            use_bias=self.use_bias,
            kernel_init=fnn.initializers.normal(
                stddev=self.init_std / math.sqrt(2 * self.n_layer)
            ),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out

    @property
    def d_output(self) -> int:
        return self.d_model


def _apply_rotary(q: jax.Array, k: jax.Array, rotary_dim: int):
    """Rotary embeddings over the first `rotary_dim` features (GPT-NeoX style,
    interleaved=False as in flash-attn's default)."""
    l = q.shape[1]
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, rotary_dim, 2) / rotary_dim))
    t = jnp.arange(l)
    freqs = jnp.outer(t, inv_freq)  # (L, rotary_dim/2)
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]

    def rot(x):
        x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        x1, x2 = jnp.split(x_rot, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
        return jnp.concatenate([out, x_pass], axis=-1).astype(x.dtype)

    return rot(q), rot(k)
