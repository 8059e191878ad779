"""Pallas TPU kernel: fused residual-add + LayerNorm (fwd + bwd).

The TPU analog of flash-attn's `dropout_add_layer_norm` CUDA kernel
(`/root/reference/src/models/sequence/long_conv_lm.py:31-33,297-305`): the
per-block "dropout -> add -> LN" glue. Dropout stays outside (rate is 0.0
in the hg38 recipes; when active, XLA fuses the mask-multiply into this
kernel's input read), the add+LN is what pays HBM traffic.

Why a kernel: at the 32k bench shape the bf16 residual stream's glue
(2 add+LN units x 8 layers) measures 16.7 ms/step under XLA while its
fused-traffic floor is ~10.5 ms — XLA materializes the f32 add result and
the normalized tensor as separate fusion outputs. This kernel makes HBM see
exactly four tensors per unit and direction:

  forward : read h, res_in            write res_out, y
  backward: read res_out, dy, dres_up write d_total (+ (8,d) param grads)

The backward recomputes mean/rstd from the stored bf16 `res_out` (one VPU
pass over a tile already in VMEM) instead of saving stats, so the VJP
residual is a tensor the block keeps anyway. Since `res_out = h + res_in`,
one output `d_total = dLN/dx + dres_up` serves as BOTH dh and dres_in.

Semantics (shared with the `_add_ln_ref` twin used off-TPU / at init):
  res_out = (f32(h) + f32(res_in)).astype(res_dtype)   # one rounding
  y       = LayerNorm_f32stats(res_out) * scale + bias -> out_dtype
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyena_dna_tpu.ops.layer_norm import layer_norm_f32


def _row_stats(x32, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc, rstd


def _fwd_kernel(h_ref, r_ref, s_ref, b_ref, y_ref, ro_ref, *, eps):
    x32 = h_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    ro = x32.astype(ro_ref.dtype)
    ro_ref[:] = ro
    xc, rstd = _row_stats(ro.astype(jnp.float32), eps)
    y = (xc * rstd) * s_ref[0][None, :] + b_ref[0][None, :]
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(ro_ref, dy_ref, dup_ref, s_ref, dx_ref, ds_ref, db_ref, *, eps):
    i = pl.program_id(0)
    xc, rstd = _row_stats(ro_ref[:].astype(jnp.float32), eps)
    x_hat = xc * rstd
    dy = dy_ref[:].astype(jnp.float32)
    dyw = dy * s_ref[0][None, :]
    m1 = jnp.mean(dyw, axis=-1, keepdims=True)
    m2 = jnp.mean(dyw * x_hat, axis=-1, keepdims=True)
    dx = rstd * (dyw - m1 - x_hat * m2) + dup_ref[:].astype(jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    ds = jnp.broadcast_to(jnp.sum(dy * x_hat, axis=0, keepdims=True),
                          ds_ref.shape)
    db = jnp.broadcast_to(jnp.sum(dy, axis=0, keepdims=True), db_ref.shape)

    @pl.when(i == 0)
    def _():
        ds_ref[:] = ds
        db_ref[:] = db

    @pl.when(i != 0)
    def _():
        ds_ref[:] = ds_ref[:] + ds
        db_ref[:] = db_ref[:] + db


def _pick_tile(n: int) -> int | None:
    for t in (2048, 1024, 512, 256):
        if n % t == 0:
            return t
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def add_ln_fused(h, res, scale, bias, eps: float, out_dtype: Any,
                 interpret: bool = False):
    """(y, res_out) = fused add + LayerNorm over rows of 2-D (N, d) inputs."""
    return _fwd(h, res, scale, bias, eps, out_dtype, interpret)[0]


def _fwd(h, res, scale, bias, eps, out_dtype, interpret):
    n, d = h.shape
    t = _pick_tile(n)
    assert t is not None, n
    y, ro = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), out_dtype),
            jax.ShapeDtypeStruct((n, d), res.dtype),
        ],
        interpret=interpret,
    )(h, res, scale.reshape(1, d).astype(jnp.float32),
      bias.reshape(1, d).astype(jnp.float32))
    return (y, ro), (ro, scale)


def _bwd(eps, out_dtype, interpret, saved, cts):
    ro, scale = saved
    dy, dup = cts
    n, d = ro.shape
    t = _pick_tile(n)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), ro.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        interpret=interpret,
    )(ro, jnp.asarray(dy, ro.dtype), jnp.asarray(dup, ro.dtype),
      scale.reshape(1, d).astype(jnp.float32))
    return dx, dx, ds[0].astype(scale.dtype), db[0].astype(scale.dtype)


add_ln_fused.defvjp(_fwd, _bwd)


def _add_ln_ref(h, res, scale, bias, eps, out_dtype, res_dtype):
    """XLA twin with identical semantics (used off-TPU, at init, and for
    non-tileable shapes / non-bf16 residual streams)."""
    res_out = (h.astype(jnp.float32) + res.astype(jnp.float32)).astype(res_dtype)
    y = layer_norm_f32(res_out, scale, bias, eps, out_dtype)
    return y, res_out


def add_ln(h, res, scale, bias, *, eps: float = 1e-5,
           out_dtype: Any = jnp.bfloat16, res_dtype: Any = jnp.bfloat16,
           use_pallas: bool | None = None, interpret: bool = False):
    """Dispatcher: (y, res_out) with leading dims flattened internally.

    Routes to the Pallas kernel when on TPU (or `interpret`) and the shape
    tiles (d % 128 == 0, rows divisible by 256); otherwise the XLA twin.
    """
    res_dtype = jnp.dtype(res_dtype)
    lead = h.shape[:-1]
    d = h.shape[-1]
    n = 1
    for s in lead:
        n *= s
    use = use_pallas
    if use is None:
        import os

        env = os.environ.get("HYENA_FUSED_ADD_LN")
        # Default OFF (measured, v5e, 32k bench shape): in isolation the
        # kernel beats the XLA glue (14.55 vs 16.39 ms/step for the 16-unit
        # chain) but in the full model it is a producer/consumer fusion
        # BARRIER — XLA folds parts of the add+LN into the mixer/MLP
        # epilogues, and walling them off costs +12 ms/step (115.4 vs
        # 103.4 ms model_train). Same verdict as the fused MLP
        # (ops/pallas_mlp.py): XLA's own fusion wins at the model level.
        use = (env == "1") if env is not None else interpret
    eligible = (
        use
        and res_dtype == jnp.bfloat16
        and jnp.dtype(out_dtype) == jnp.bfloat16
        and d % 128 == 0
        and _pick_tile(n) is not None
    )
    if not eligible:
        return _add_ln_ref(h, res, scale, bias, eps, out_dtype, res_dtype)
    h2 = h.reshape(n, d).astype(jnp.bfloat16)
    r2 = res.reshape(n, d).astype(jnp.bfloat16)
    y, ro = add_ln_fused(h2, r2, scale, bias, eps, jnp.dtype(out_dtype),
                         interpret)
    return y.reshape(*lead, d), ro.reshape(*lead, d)
