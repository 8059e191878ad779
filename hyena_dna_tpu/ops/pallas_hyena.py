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

Forward AND backward are Pallas. The first-cut XLA backward (kept as
`_fpcg_bwd_xla` for CPU/tests) recomputes proj/conv and then streams the
(B, 3d, L) f32 tensors through ~10 separate fusions — profiled at ~70-100 ms
of the 268 ms 32k train step (the single largest bucket). The Pallas
backward streams each length tile once: recompute proj/conv from u (the
tile's two left-boundary rows ride in as a precomputed side input), form
dconv from the gate grads, apply the transposed conv against a 2-row
anti-causal carry by walking tiles right-to-left, and emit du plus
f32 parameter-grad accumulators that live in VMEM across the whole grid.

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


def _bwd_kernel(u_ref, up_ref, w_ref, bp_ref, wc_ref, bc_ref, dvx_ref, dx0_ref,
                du_ref, dw_ref, dbp_ref, dwc_ref, dbc_ref, dcarry):
    """One (batch b, reversed length-tile) program of the fused backward.

    Tiles are visited right-to-left (index maps reverse the length axis) so
    the transposed causal conv's anti-causal 2-row halo can ride in `dcarry`.
    `up_ref` holds the two u rows left of the tile (zeros for the first
    tile), from which the forward conv's left context is recomputed.
    Parameter grads accumulate in f32 VMEM output blocks across the grid.
    """
    bi = pl.program_id(0)
    li = pl.program_id(1)  # li == 0 is the RIGHTMOST tile
    f32 = jnp.float32

    def mm(a, b, contract):
        # default precision: the MXU rounds inputs to bf16, accumulates f32
        # (same as the forward kernel's jnp.dot)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((), ())),
            preferred_element_type=f32,
        )

    u = u_ref[0]  # (TL, d)
    w = w_ref[:]
    proj = mm(u, w, ((1,), (0,))) + bp_ref[0][None, :]  # (TL, 3d) f32
    # left context rows; the forward's carry starts at ZERO for the global
    # first tile (zero-padding of proj+bias), so suppress the bias there
    prev = mm(up_ref[0, 0], w, ((1,), (0,))) + bp_ref[0][None, :]  # (2, 3d)
    is_global_first = li == pl.num_programs(1) - 1  # reversed walk
    prev = jnp.where(is_global_first, jnp.zeros_like(prev), prev)
    ext = jnp.concatenate([prev, proj], axis=0)  # (TL+2, 3d)
    tl = proj.shape[0]
    wc = wc_ref[:].astype(f32)
    conv = (
        ext[0:tl] * wc[0][None, :]
        + ext[1 : tl + 1] * wc[1][None, :]
        + ext[2 : tl + 2] * wc[2][None, :]
        + bc_ref[0][None, :]
    )
    d = conv.shape[-1] // 3
    x1 = conv[:, d : 2 * d]
    v = conv[:, 2 * d :]

    dvx = dvx_ref[0].astype(f32).T  # (TL, d)
    dx0 = dx0_ref[0].astype(f32).T
    # channel order [x0 | x1 | v]; vx = v * x1
    dconv = jnp.concatenate([dx0, dvx * v, dvx * x1], axis=1)  # (TL, 3d)

    @pl.when(li == 0)
    def _():
        dcarry[:] = jnp.zeros_like(dcarry)

    nxt = dcarry[:]  # right tile's first two dconv rows
    dext = jnp.concatenate([dconv, nxt], axis=0)  # (TL+2, 3d)
    # transpose of conv[t] = sum_j wc[j] ext[t+j]: dproj[s] = sum_j wc[j] dext[s+2-j]
    dproj = (
        dext[2 : tl + 2] * wc[0][None, :]
        + dext[1 : tl + 1] * wc[1][None, :]
        + dext[0:tl] * wc[2][None, :]
    )
    dcarry[:] = dconv[0:2]

    du_ref[0] = mm(dproj, w, ((1,), (1,))).astype(du_ref.dtype)  # (TL, d)

    dw_c = mm(u, dproj, ((0,), (0,)))  # (d, 3d)
    dbp_c = jnp.sum(dproj, axis=0)[None, :]  # (1, 3d)
    dwc_c = jnp.stack(
        [jnp.sum(dconv * ext[j : tl + j], axis=0) for j in range(3)], axis=0
    )  # (3, 3d)
    dbc_c = jnp.sum(dconv, axis=0)[None, :]

    first = jnp.logical_and(bi == 0, li == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = dw_c
        dbp_ref[:] = dbp_c
        dwc_ref[:] = dwc_c
        dbc_ref[:] = dbc_c

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw_c
        dbp_ref[:] = dbp_ref[:] + dbp_c
        dwc_ref[:] = dwc_ref[:] + dwc_c
        dbc_ref[:] = dbc_ref[:] + dbc_c


def _bwd_pallas(u, w, bp, wc, bc, dvx, dx0, *, tile_l: int, interpret: bool):
    b, l, d = u.shape
    d3 = w.shape[-1]
    n_l = l // tile_l
    # two u rows left of each tile (zeros for tile 0), recomputed into the
    # forward conv's carry inside the kernel
    up = jnp.pad(
        u.reshape(b, n_l, tile_l, d)[:, : n_l - 1, tile_l - 2 :, :],
        [(0, 0), (1, 0), (0, 0), (0, 0)],
    )  # (B, n_l, 2, d)
    rev = lambda li: n_l - 1 - li
    f32 = jnp.float32
    du, dw, dbp, dwc, dbc = pl.pallas_call(
        _bwd_kernel,
        grid=(b, n_l),
        in_specs=[
            pl.BlockSpec((1, tile_l, d), lambda bi, li: (bi, rev(li), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, d), lambda bi, li: (bi, rev(li), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3 // 3, tile_l), lambda bi, li: (bi, 0, rev(li)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3 // 3, tile_l), lambda bi, li: (bi, 0, rev(li)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_l, d), lambda bi, li: (bi, rev(li), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), u.dtype),
            jax.ShapeDtypeStruct((d, d3), f32),
            jax.ShapeDtypeStruct((1, d3), f32),
            jax.ShapeDtypeStruct((3, d3), f32),
            jax.ShapeDtypeStruct((1, d3), f32),
        ],
        scratch_shapes=[pltpu.VMEM((2, d3), f32)],
        interpret=interpret,
    )(u, up, w, bp.reshape(1, -1), wc, bc.reshape(1, -1), dvx, dx0)
    return du, dw, dbp.reshape(-1), dwc, dbc.reshape(-1)


def _fpcg_fwd(u, w, bp, wc, bc, tile_l, interpret):
    out = fused_proj_conv_gate(u, w, bp, wc, bc, tile_l, interpret)
    return out, (u, w, bp, wc, bc)


def _fpcg_bwd(tile_l, interpret, res, grads):
    """Pallas streaming backward (the fwd is only ever invoked on TPU or in
    interpret mode, so the same holds here); `_fpcg_bwd_xla` retained as the
    plain-XLA oracle."""
    u, w, bp, wc, bc = res
    dvx, dx0 = grads
    du, dw, dbp, dwc, dbc = _bwd_pallas(
        u, w.astype(jnp.float32), bp.astype(jnp.float32),
        wc.astype(jnp.float32), bc.astype(jnp.float32), dvx, dx0,
        tile_l=tile_l, interpret=interpret,
    )
    return (du, dw.astype(w.dtype), dbp.astype(bp.dtype),
            dwc.astype(wc.dtype), dbc.astype(bc.dtype))


def _fpcg_bwd_xla(tile_l, interpret, res, grads):
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
