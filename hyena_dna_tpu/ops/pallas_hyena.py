"""Pallas TPU kernel: fused Hyena front end
(in-projection matmul -> layout transpose -> causal depthwise conv -> gate).

Why a kernel here: the XLA graph for the Hyena mixer front end is
  u (B,L,d) --matmul--> (B,L,3d) --relayout--> (B,3d,L)
  --depthwise k=3 conv--> (B,3d,L) --split+multiply--> v*x1, x0
Each arrow is an HBM round trip of the (3d, L) tensor; the matmul output,
the relayout, and the conv each read and write ~3dL elements. Fused, the
kernel streams u tiles through VMEM once: MXU matmul, in-register transpose,
conv against a 2-column carry from the previous tile (sequential grid), and
the first gate multiply — writing only the two (d, L) results. ~4x less HBM
traffic for this segment (SURVEY §7 hard part 5: "fusing gating into the
conv via Pallas").

Forward = Pallas; backward = a custom VJP composed of plain XLA ops (matmul
transposes + conv transpose), which XLA fuses well on its own.

Channel layout matches `HyenaOperator` order=2 (`hyena.py:414-430` semantics
specialized to heads=1/blocks=1): projection channels [x0 | x1 | v],
outputs (v*x1, x0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, w_ref, bp_ref, wc_ref, bc_ref, vx_ref, x0_ref, carry):
    """One (batch b, length-tile l) program.

    u_ref: (1, TL, d); w_ref: (d, 3d); bp_ref: (1, 3d); wc_ref: (3, 3d);
    bc_ref: (1, 3d); vx_ref/x0_ref: (1, d, TL); carry: (2, 3d) VMEM scratch
    holding the previous tile's last two projected rows.
    """
    i_l = pl.program_id(1)

    @pl.when(i_l == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    u = u_ref[0]  # (TL, d)
    proj = jnp.dot(u, w_ref[:], preferred_element_type=jnp.float32)
    proj = proj + bp_ref[0][None, :]  # (TL, 3d) fp32

    prev = carry[:]  # (2, 3d)
    ext = jnp.concatenate([prev, proj], axis=0)  # (TL+2, 3d)
    tl = proj.shape[0]
    conv = (
        ext[0:tl] * wc_ref[0][None, :]
        + ext[1 : tl + 1] * wc_ref[1][None, :]
        + ext[2 : tl + 2] * wc_ref[2][None, :]
        + bc_ref[0][None, :]
    )  # (TL, 3d)
    carry[:] = proj[tl - 2 : tl]

    d = conv.shape[-1] // 3
    x0 = conv[:, 0:d]
    x1 = conv[:, d : 2 * d]
    v = conv[:, 2 * d : 3 * d]
    vx = v * x1
    vx_ref[0] = vx.T.astype(vx_ref.dtype)  # (d, TL)
    x0_ref[0] = x0.T.astype(x0_ref.dtype)


def _fwd_pallas(u, w, bp, wc, bc, *, tile_l: int, interpret: bool):
    b, l, d = u.shape
    d3 = w.shape[-1]
    n_l = l // tile_l
    grid = (b, n_l)
    out_dtype = u.dtype

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_l, d), lambda bi, li: (bi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, tile_l), lambda bi, li: (bi, 0, li),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tile_l), lambda bi, li: (bi, 0, li),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d3 // 3, l), out_dtype),
            jax.ShapeDtypeStruct((b, d3 // 3, l), out_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, d3), jnp.float32)],
        interpret=interpret,
    )(u, w, bp, wc, bc)


def _reference_fwd(u, w, bp, wc, bc):
    """Plain-XLA evaluation of the same math (used for bwd recompute and as
    the numerical oracle)."""
    proj = (u @ w.astype(u.dtype)) + bp.astype(u.dtype)  # (B, L, 3d)
    projT = jnp.swapaxes(proj, -1, -2).astype(jnp.float32)  # (B, 3d, L)
    from hyena_dna_tpu.ops.short_conv import short_conv_1d

    conv = short_conv_1d(projT, jnp.swapaxes(wc, 0, 1), bc)  # (B, 3d, L)
    d = conv.shape[1] // 3
    x0, x1, v = conv[:, :d], conv[:, d : 2 * d], conv[:, 2 * d :]
    return (v * x1).astype(u.dtype), x0.astype(u.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_proj_conv_gate(u, w, bp, wc, bc, tile_l: int = 512, interpret: bool = False):
    """(vx, x0) = fused front end.

    u: (B, L, d); w: (d, 3d); bp: (3d,) proj bias; wc: (3, 3d) conv taps in
    time-major layout (wc[j] multiplies x[t-2+j]); bc: (3d,) conv bias.
    L must be divisible by tile_l.
    """
    bp2 = bp.reshape(1, -1)
    bc2 = bc.reshape(1, -1)
    return tuple(_fwd_pallas(u, w, bp2, wc, bc2, tile_l=tile_l, interpret=interpret))


def _fpcg_fwd(u, w, bp, wc, bc, tile_l, interpret):
    out = fused_proj_conv_gate(u, w, bp, wc, bc, tile_l, interpret)
    return out, (u, w, bp, wc, bc)


def _fpcg_bwd(tile_l, interpret, res, grads):
    u, w, bp, wc, bc = res
    dvx, dx0 = grads
    f32 = jnp.float32
    # recompute the conv outputs (cheap relative to storing (B, 3d, L))
    proj = (u.astype(f32) @ w.astype(f32)) + bp.astype(f32)
    projT = jnp.swapaxes(proj, -1, -2)  # (B, 3d, L)
    from hyena_dna_tpu.ops.short_conv import short_conv_1d

    conv = short_conv_1d(projT, jnp.swapaxes(wc, 0, 1).astype(f32), bc.astype(f32))
    d = conv.shape[1] // 3
    x1, v = conv[:, d : 2 * d], conv[:, 2 * d :]

    dvx = dvx.astype(f32)
    dconv = jnp.concatenate(
        [dx0.astype(f32), dvx * v, dvx * x1], axis=1
    )  # (B, 3d, L) in channel order [x0, x1, v]

    # transpose (correlation) of the causal depthwise conv:
    # y[t] = sum_j wc[j] x[t-2+j]  =>  dx[s] = sum_j wc[j] dy[s+2-j]
    l = dconv.shape[-1]
    dprojT = jnp.zeros_like(dconv)
    for j in range(3):
        shift = 2 - j  # dy index offset
        if shift == 0:
            term = dconv * wc[j][None, :, None]
        else:
            term = jnp.pad(dconv, [(0, 0), (0, 0), (0, shift)])[..., shift:] * (
                wc[j][None, :, None]
            )
        dprojT = dprojT + term
    dbc = jnp.sum(dconv, axis=(0, 2))
    # conv-tap grads: dwc[j, c] = sum_{b,t} dconv[b,c,t] * projT[b,c,t-2+j]
    dwc = []
    for j in range(3):
        shift = 2 - j
        if shift == 0:
            src = projT
        else:
            src = jnp.pad(projT, [(0, 0), (0, 0), (shift, 0)])[..., :l]
        dwc.append(jnp.sum(dconv * src, axis=(0, 2)))
    dwc = jnp.stack(dwc, axis=0)

    dproj = jnp.swapaxes(dprojT, -1, -2)  # (B, L, 3d)
    du = (dproj @ w.astype(f32).T).astype(u.dtype)
    dw = jnp.einsum("bld,blc->dc", u.astype(f32), dproj).astype(w.dtype)
    dbp = jnp.sum(dproj, axis=(0, 1)).astype(bp.dtype)
    return du, dw, dbp, dwc.astype(wc.dtype), dbc.astype(bc.dtype)


fused_proj_conv_gate.defvjp(_fpcg_fwd, _fpcg_bwd)
