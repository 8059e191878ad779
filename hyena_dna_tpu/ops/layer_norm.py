"""LayerNorm with f32 statistics and reduced-precision output.

Why not `flax.linen.LayerNorm`: with `dtype=float32` (required for parity
with the reference's fp32 norms, `long_conv_lm.py:331` / flash-attn
dropout_add_layer_norm) the flax op materializes the NORMALIZED f32
(B, L, d) tensor as a fusion output — XLA saves it for the backward — and
the downstream bf16 cast is a second full pass. At the 32k bench shape that
is 2 x 134 MB of HBM traffic per norm per direction, ~2.9 ms/layer across
the norm chain.

This version is a `custom_vjp`:
  * forward computes mean/rstd in f32 but writes ONLY the `out_dtype`
    (bf16) result plus the (B, L, 1) stats;
  * the backward recomputes x_hat from the saved INPUT (the carried f32
    residual — the same buffer the block already holds, so no extra copy)
    and produces dx/dscale/dbias in one fusion.

The math is the standard LN gradient:
  x_hat = (x - mean) * rstd
  dyw   = dy * scale
  dx    = rstd * (dyw - mean(dyw) - x_hat * mean(dyw * x_hat))
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_f32(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   eps: float, out_dtype: Any) -> jax.Array:
    return _ln_fwd(x, scale, bias, eps, out_dtype)[0]


def _ln_fwd(x, scale, bias, eps, out_dtype):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xc * rstd) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype), (x, mean, rstd, scale)


def _ln_bwd(eps, out_dtype, res, dy):
    x, mean, rstd, scale = res
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    x_hat = (x32 - mean) * rstd
    dyw = dy32 * scale.astype(jnp.float32)
    m1 = jnp.mean(dyw, axis=-1, keepdims=True)
    m2 = jnp.mean(dyw * x_hat, axis=-1, keepdims=True)
    dx = (rstd * (dyw - m1 - x_hat * m2)).astype(x.dtype)
    red = tuple(range(dy32.ndim - 1))
    dscale = jnp.sum(dy32 * x_hat, axis=red).astype(scale.dtype)
    dbias = jnp.sum(dy32, axis=red).astype(scale.dtype)
    return dx, dscale, dbias


layer_norm_f32.defvjp(_ln_fwd, _ln_bwd)


class LayerNormF32(fnn.Module):
    """Drop-in for `fnn.LayerNorm(dtype=f32)` + downstream cast: f32 stats,
    `out_dtype` output, scatter-free fused backward. Parameter names/shapes
    ("scale", "bias") match `fnn.LayerNorm` so checkpoints interchange.

    Called with a second argument `res`, it becomes the fused
    residual-add + LN unit (the flash-attn `dropout_add_layer_norm` analog,
    `ops/pallas_ln.py`) and returns `(y, res_out)` where
    `res_out = (x + res)` rounded to the residual dtype."""

    epsilon: float = 1e-5
    out_dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (TPU backend); bool to force
    interpret: bool = False

    @fnn.compact
    def __call__(self, x: jax.Array, res: jax.Array | None = None):
        d = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (d,), jnp.float32)
        if res is not None:
            from hyena_dna_tpu.ops.pallas_ln import add_ln

            use = False if self.is_initializing() else self.use_pallas
            return add_ln(x, res, scale, bias, eps=self.epsilon,
                          out_dtype=self.out_dtype, res_dtype=res.dtype,
                          use_pallas=use, interpret=self.interpret)
        return layer_norm_f32(x, scale, bias, self.epsilon, self.out_dtype)
