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


# Mosaic requires the sublane (second-to-last) dim of a VMEM block to be a
# multiple of 8; one length tile contributes only tile_l//m (often 2) rows
# of the (rows_pad, m) layout, so output blocks span _ROWS_BLK rows and are
# REVISITED by consecutive grid steps (block index li // gpb is monotone;
# the block stays VMEM-resident until it changes).
_ROWS_BLK = 8


def _kernel4(u_ref, w_ref, bp_ref, wc_ref, bc_ref, vx_ref, x0_ref, carry,
             *, n_real: int, rpt: int):
    """4-D-output variant of _kernel: one (batch, length-tile) program that
    writes its (d, TL) results as rpt = TL//m rows of the conv kernel's
    (d, rows_pad, m) layout, with tile programs past the real sequence
    (i_l >= n_real) emitting zeros — the causal FFT pad, written once at
    the source instead of via a pad + relayout copy over the flat array
    (see fftconv_outer_fwd4)."""
    i_l = pl.program_id(1)

    @pl.when(i_l == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    mm = vx_ref.shape[3]
    gpb = _ROWS_BLK // rpt

    @pl.when(i_l >= n_real)
    def _():
        z = jnp.zeros((vx_ref.shape[1], rpt, mm), vx_ref.dtype)
        _store_rows(vx_ref, x0_ref, z, z, i_l, rpt, gpb)

    @pl.when(i_l < n_real)
    def _():
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
        x0 = conv[:, 0:d].T
        x1 = conv[:, d : 2 * d]
        v = conv[:, 2 * d : 3 * d]
        vx = (v * x1).T  # (d, TL)
        dd = vx.shape[0]
        _store_rows(vx_ref, x0_ref,
                    vx.reshape(dd, rpt, mm).astype(vx_ref.dtype),
                    x0.reshape(dd, rpt, mm).astype(x0_ref.dtype),
                    i_l, rpt, gpb)


def _store_rows(vx_ref, x0_ref, val_v, val_x, i_l, rpt, gpb):
    """Store this program's rpt rows into the revisited 8-row output block.

    Mosaic cannot prove dynamic sublane offsets 8-aligned, so the (small,
    compile-time) gpb possibilities are unrolled as static sub-block
    stores under pl.when."""
    for g in range(gpb):
        @pl.when((i_l % gpb) == g)
        def _(g=g):
            vx_ref[0, :, g * rpt:(g + 1) * rpt, :] = val_v
            x0_ref[0, :, g * rpt:(g + 1) * rpt, :] = val_x


def _fwd_pallas4(u, w, bp, wc, bc, *, rows_pad: int, m: int, tile_l: int,
                 interpret: bool):
    b, l, d = u.shape
    d3 = w.shape[-1]
    n_real = l // tile_l
    rpt = tile_l // m
    gpb = _ROWS_BLK // rpt
    n_lp = rows_pad * m // tile_l
    grid = (b, n_lp)
    out_dtype = u.dtype
    # tile programs past the real length never read their (clamped) u block
    u_idx = lambda bi, li: (bi, jnp.minimum(li, n_real - 1), 0)
    o_idx = lambda bi, li: (bi, 0, li // gpb, 0)

    return pl.pallas_call(
        functools.partial(_kernel4, n_real=n_real, rpt=rpt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_l, d), u_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda bi, li: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, _ROWS_BLK, m), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, _ROWS_BLK, m), o_idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d3 // 3, rows_pad, m), out_dtype),
            jax.ShapeDtypeStruct((b, d3 // 3, rows_pad, m), out_dtype),
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
    f32 = jnp.float32
    dvx = dvx_ref[0].astype(f32).T  # (TL, d)
    dx0 = dx0_ref[0].astype(f32).T
    _bwd_body(u_ref, up_ref, w_ref, bp_ref, wc_ref, bc_ref, dvx, dx0,
              du_ref, dw_ref, dbp_ref, dwc_ref, dbc_ref, dcarry)


def _bwd_kernel4(u_ref, up_ref, w_ref, bp_ref, wc_ref, bc_ref, dvx_ref,
                 dx0_ref, du_ref, dw_ref, dbp_ref, dwc_ref, dbc_ref, dcarry,
                 *, rpt: int):
    """Backward program reading the cotangents in the conv kernel's 4-D
    (1, d, _ROWS_BLK, m) block layout (see _fwd_pallas4; blocks revisited
    across the reversed walk). Grad rows past the real sequence are never
    visited: the padded tail of vx/x0 is a constant zero, so those
    cotangents carry no information (matching the pad-VJP slice of the
    flat path)."""
    f32 = jnp.float32
    li = pl.program_id(1)
    rev = pl.num_programs(1) - 1 - li  # real tile id
    gpb = _ROWS_BLK // rpt
    mm = dvx_ref.shape[3]
    d = dvx_ref.shape[1]

    def pick(blk):
        """Extract this program's rpt rows from the (resident) 8-row block.

        Mosaic rejects dynamic sublane offsets, so the gpb static slice
        cases are combined by a binary select_n tree on the bits of
        rev % gpb (select_n lowers to cheap vselects; Mosaic caps it at 2
        cases per call, hence the tree). Measured on v5e at the 450k
        shape: +1.1 ms over the flat backward vs +4.2 ms for a
        scalar-mask multiply-accumulate and 'rotate with non-32-bit data'
        unimplemented for pltpu.roll on bf16. The block itself is fetched
        once per revisit group (index changes every gpb programs)."""
        cases = [blk[:, g * rpt:(g + 1) * rpt, :] for g in range(gpb)]
        g = rev % gpb
        while len(cases) > 1:
            half = len(cases) // 2
            bit = g & 1
            cases = [jax.lax.select_n(bit, cases[2 * i], cases[2 * i + 1])
                     for i in range(half)]
            g = g >> 1
        return cases[0].reshape(d, rpt * mm).astype(f32)

    dvx = pick(dvx_ref[0]).T  # (TL, d)
    dx0 = pick(dx0_ref[0]).T
    _bwd_body(u_ref, up_ref, w_ref, bp_ref, wc_ref, bc_ref, dvx, dx0,
              du_ref, dw_ref, dbp_ref, dwc_ref, dbc_ref, dcarry)


def _bwd_body(u_ref, up_ref, w_ref, bp_ref, wc_ref, bc_ref, dvx, dx0,
              du_ref, dw_ref, dbp_ref, dwc_ref, dbc_ref, dcarry):
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


def _bwd_pallas4(u, w, bp, wc, bc, dvx4, dx04, *, rows_pad: int, m: int,
                 tile_l: int, interpret: bool):
    """Backward over the REAL tiles only, reading 4-D cotangent blocks."""
    b, l, d = u.shape
    d3 = w.shape[-1]
    n_l = l // tile_l
    rpt = tile_l // m
    gpb = _ROWS_BLK // rpt
    up = jnp.pad(
        u.reshape(b, n_l, tile_l, d)[:, : n_l - 1, tile_l - 2 :, :],
        [(0, 0), (1, 0), (0, 0), (0, 0)],
    )  # (B, n_l, 2, d)
    rev = lambda li: n_l - 1 - li
    g_idx = lambda bi, li: (bi, 0, rev(li) // gpb, 0)
    f32 = jnp.float32
    du, dw, dbp, dwc, dbc = pl.pallas_call(
        functools.partial(_bwd_kernel4, rpt=rpt),
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
            pl.BlockSpec((1, d3 // 3, _ROWS_BLK, m), g_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3 // 3, _ROWS_BLK, m), g_idx,
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
    )(u, up, w, bp.reshape(1, -1), wc, bc.reshape(1, -1), dvx4, dx04)
    return du, dw, dbp.reshape(-1), dwc, dbc.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_proj_conv_gate4(u, w, bp, wc, bc, rows_pad: int, m: int,
                          tile_l: int = 512, interpret: bool = False):
    """(vx4, x04) = fused front end emitting the conv kernel's 4-D layout.

    Same math as fused_proj_conv_gate, but the outputs are
    (B, d, rows_pad, m) with rows past ceil(L/m) zero-filled — i.e. the
    causal-FFT zero padding AND the (d, rows, m) retile are folded into the
    kernel's output writes, so the conv (fftconv_outer_fwd4) consumes them
    with no pad / relayout ops in between. Requires L % tile_l == 0,
    tile_l % m == 0, (rows_pad*m) % tile_l == 0 and rows_pad*m >= L.
    """
    bp2 = bp.reshape(1, -1)
    bc2 = bc.reshape(1, -1)
    return tuple(_fwd_pallas4(u, w, bp2, wc, bc2, rows_pad=rows_pad, m=m,
                              tile_l=tile_l, interpret=interpret))


def _fpcg4_fwd(u, w, bp, wc, bc, rows_pad, m, tile_l, interpret):
    out = fused_proj_conv_gate4(u, w, bp, wc, bc, rows_pad, m, tile_l,
                                interpret)
    return out, (u, w, bp, wc, bc)


def _fpcg4_bwd(rows_pad, m, tile_l, interpret, res, grads):
    u, w, bp, wc, bc = res
    dvx4, dx04 = grads
    du, dw, dbp, dwc, dbc = _bwd_pallas4(
        u, w.astype(jnp.float32), bp.astype(jnp.float32),
        wc.astype(jnp.float32), bc.astype(jnp.float32), dvx4, dx04,
        rows_pad=rows_pad, m=m, tile_l=tile_l, interpret=interpret,
    )
    return (du, dw.astype(w.dtype), dbp.astype(bp.dtype),
            dwc.astype(wc.dtype), dbc.astype(bc.dtype))


fused_proj_conv_gate4.defvjp(_fpcg4_fwd, _fpcg4_bwd)


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
