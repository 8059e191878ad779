"""Pallas TPU kernel: outer-radix fused FFT conv for fft 2^20/2^21.

The 450k/1M contexts (the reference's headline regime) need fft sizes
2^20/2^21, where the single-channel 2-factor kernel's dense (r, m)
matrices make it only tie the XLA chain (n*(r+m) MXU MACs vs the chain's
n*(f1+f2+f3)), and a balanced in-VMEM 3-factor kernel dies on Mosaic's
lowering of the middle (f1, f2, f3) <-> (f2, f1, f3) relayout — measured
on v5e at n=2^20: chain fwd 37.1 ms, balanced fused-3 with jnp.transpose
45.8 ms AND miscompiled (rel err 1.13 on-chip vs 2e-3 in interpret), a
skip-transpose cost probe 30.9 ms, i.e. the relayout eats the entire win.

This kernel removes the transpose from the algorithm instead of lowering
it better. Decompose n = n1 * (r * m) with a SMALL outer radix n1 (16):

  time index t = a1*(r*m) + b*m + c  ->  ref layout (a1*r + b, c):
    rows are (a1, b), lanes are c; the (B, C, L) -> (B, C, h1*r, m)
    reshape is free in HBM.

  stage 1 (contract a1, the OUTER row-block digit): for each output
    digit q1, G[q1] = sum_a1 W_n1^{a1 q1} * x[a1-block]. n1 is a
    compile-time constant, so this is an unrolled chain of scalar*block
    multiply-adds on the VPU — coefficients are Python floats baked into
    the program, zero-coefficient terms elided. No matmul, no relayout.

  twiddle T1[q1, s] = W_n^{q1 s} — elementwise, table precomputed in the
    same (n1*r, m) layout.

  stage 2: n1 independent complex 2-factor sub-FFTs of size r*m, one per
    q1 row-block — each is the proven pure-2-D pipeline of the narrow
    kernel (left-matmul contract b on sublanes, twiddle, right-matmul
    contract c on lanes; complex Karatsuba = 3 real matmuls per pass).

  The spectrum layout (q1, beta, gamma) is internal: the filter spectrum,
  the bin multiply, and the inverse all share it. The inverse mirrors the
  pipeline with conjugated/normalized matrices, and its final stage-1
  emits only the first h1 = n1/2 row blocks (causal zero padding means
  input blocks a1 >= h1 are zero and output is only needed there too).

Per-point MXU cost ~ 3*(r+m) complex-Karatsuba MACs (1536 at 2^20 with
r=m=256) vs the direct 2-factor's 3*(1024+1024); stage 1 adds n1 VPU
MACs/point. The whole conv (both transforms, bin multiply, inverse,
D-skip) runs in one kernel: one HBM round trip vs the chain's ~6.

HERMITIAN HALVING (round 5): all inputs are real, so every spectrum is
Hermitian and the q1 row-blocks pair conjugately — with the folded
twiddles, T_{n1-q1}(s) = conj(T_{q1}(s)) exactly. Only blocks
q1 = 0..n1/2 are computed anywhere (9 of 16 at n1=16) and the inverse
emit doubles the interior blocks' real combos: ~44% less MXU/VPU work
and ~44% smaller const tables/scratch, identical math (see
_stage1_coefs). The reference's cuFFT path gets the same factor from
R2C/C2R plans; its fused kernel caps at fft 16384 regardless.

Replaces the reference's long-context conv path, which has no fused
kernel at these sizes (its CUDA fftconv caps at fft_size 16384,
/root/reference/csrc/fftconv/fftconv.cpp:114-115; beyond that it runs
eager torch.fft). Backward mirrors ops/pallas_fftconv.py's narrow
backward: recompute both transforms in-kernel, accumulate the filter
gradient's spectrum in f32 scratch across the batch grid, Parseval dD.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT_DTYPE = jnp.bfloat16
_STORE_DTYPE = jnp.bfloat16

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=110 * 1024 * 1024)

# n -> (n1, r, m). Gated by ops/fftconv.py's dispatch (plan_outer).
# Round-4 extensions below 2^20, all measured on v5e at B=1, C=256
# (scripts/bench_conv_outer.py; "chain" = the previously routed path):
#   2^17: outer (4,256,128) train  9.8 ms vs packed-fused 13.8 (fwd 7.2/8.6)
#   2^18: outer (16,128,128) train 17.7 ms vs packed-split 22.5 (fwd 10.8/12.6)
#   2^19: outer (16,128,256) train 29.5 ms vs narrow 29.3 TIE, fwd 16.0
#         vs 19.8 — the fwd win matters because long-context steps remat
#         mixers (forward runs twice per step); 256k step 735 -> 682 ms.
_OUTER_BY_N = {
    1 << 17: (4, 256, 128),
    1 << 18: (16, 128, 128),
    1 << 19: (16, 128, 256),
    1 << 20: (16, 256, 256),
    1 << 21: (16, 512, 256),
}

# Below this size the batch-pair PACKED kernels (ops/pallas_fftconv.py)
# win whenever they can pack (two real batch rows per complex transform —
# at B=2 the packed conv costs ~one unpacked conv for two rows, beating
# the outer kernel's per-row cost). The outer kernel takes these sizes
# only when the batch is odd (unpackable, e.g. the B=1 long-context case).
_OUTER_NEEDS_ODD_BATCH_BELOW = 1 << 19


def plan_outer(n: int, c: int, seqlen: int, bsz: int):
    """(n1, r, m) if the outer-radix fused kernel covers this conv."""
    spec = _OUTER_BY_N.get(n)
    if spec is None:
        return None
    if n < _OUTER_NEEDS_ODD_BATCH_BELOW and bsz % 2 == 0:
        return None
    n1, r, m = spec
    if seqlen > (n1 // 2) * r * m:
        return None
    return spec


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(_DOT_DTYPE), b.astype(_DOT_DTYPE),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_STORE_DTYPE)


def _kara_l(br, bi, bs, ar, ai):
    """B @ A, complex A, constant complex B (bs = br + bi); 3 matmuls."""
    t1 = _mm(br[:], ar)
    t2 = _mm(bi[:], ai)
    t3 = _mm(bs[:], ar + ai)
    return t1 - t2, t3 - t1 - t2


def _kara_r(ar, ai, br, bi, bs):
    """A @ B, complex A, constant complex B; 3 matmuls."""
    t1 = _mm(ar, br[:])
    t2 = _mm(ai, bi[:])
    t3 = _mm(ar + ai, bs[:])
    return t1 - t2, t3 - t1 - t2


def _stage1_coefs(n1: int):
    """Python-float coefficient tables for the outer radix, HERMITIAN-HALVED.

    All conv inputs are real, so every spectrum the kernel touches is
    Hermitian and the q1 row-blocks pair up exactly: with the folded
    twiddles, T_{n1-q1}(s) = conj(T_{q1}(s)) and the outer inverse
    coefficient conjugates the same way, so block (n1-q1)'s contribution
    to the (real) output is the conjugate of block q1's. Only blocks
    q1 = 0..n1/2 are therefore computed ANYWHERE (fwd, product, inverse,
    emit) — 9 of 16 at n1=16 — and the inverse emit doubles the real
    combo for the interior blocks 0 < q1 < n1/2. ~44% less MXU/VPU work
    and VMEM than the full-block kernel at identical math.

    fwd[q1][a1] = W_n1^{a1 q1} (complex, as (re, im) pair), q1 <= n1/2;
    inv[a1][q1] = w * W_n1^{-a1 q1} / n1 with w = 2 for 0 < q1 < n1/2.
    """
    h1 = n1 // 2
    fwd = [[(math.cos(2 * math.pi * a1 * q1 / n1),
             -math.sin(2 * math.pi * a1 * q1 / n1))
            for a1 in range(h1)] for q1 in range(h1 + 1)]
    inv = [[((2.0 if 0 < q1 < h1 else 1.0) *
             math.cos(2 * math.pi * a1 * q1 / n1) / n1,
             (2.0 if 0 < q1 < h1 else 1.0) *
             math.sin(2 * math.pi * a1 * q1 / n1) / n1)
            for q1 in range(h1 + 1)] for a1 in range(h1)]
    return fwd, inv


def _consts_outer(n1: int, r: int, m: int):
    """DFT matrices + twiddle tables, built with jnp ops (NOT numpy
    literals: a (n1*r, m) table inlined as an HLO constant puts megabytes
    into the serialized module — enough to break remote-compile payload
    limits — whereas the iota+cos graph is a few ops that XLA folds).

    Round-4 twiddle fold: the outer twiddle is separable,
    W_n^{q1(b*m+c)} = A[q1,b] * B[q1,c] with A = W_{n1*r}^{q1 b} and
    B = W_n^{q1 c}. A folds into per-q1 pass-A matrices
    (frq[q1*r+beta, b] = F_r[beta,b] * A[q1,b]; the inverse's conjugate
    folds into qrq the same way) and B folds into the sub twiddle
    (twf[q1*r+beta, c] = W_{rm}^{beta c} * B[q1,c]; the inverse twiddle is
    exactly conj(twf)). This deletes one full elementwise complex multiply
    per point per transform — measured ~2 ms/conv-fwd of VPU time at 2^20
    — at the cost of n1-stacked (n1*r, r) matrix tables. All four tables
    share the angle form +-2*pi * col * (beta*n1 + q1) / period."""
    n = n1 * r * m
    f32 = jnp.float32

    def stacked_angle(sign, period, dim1, cols, cross_row=False):
        """angle[q1, d1, c] = sign * 2*pi/period * mod(d1*c*n1 + q1*x,
        period) with x = c (forward tables: the A/B factors attach to the
        data index, which is the matrix COLUMN) or x = d1 when cross_row
        (the inverse matrix qrq: conj(A[q1,b]) scales output ROWS b).
        Digit products stay < 2^24 (exact in f32) for every planned size;
        reduce mod the period BEFORE scaling so cos/sin arguments stay in
        [0, 2*pi) — f32 cos at thousands of radians drifts ~1e-4.

        Hermitian halving: only q1 = 0..n1/2 rows are ever consumed (see
        _stage1_coefs), so the tables stack hq = n1/2 + 1 blocks."""
        hq = n1 // 2 + 1
        q1 = jax.lax.broadcasted_iota(f32, (hq, dim1, cols), 0)
        d1 = jax.lax.broadcasted_iota(f32, (hq, dim1, cols), 1)
        ci = jax.lax.broadcasted_iota(f32, (hq, dim1, cols), 2)
        x = d1 if cross_row else ci
        ang = (sign * 2.0 * math.pi / period) * jnp.mod(
            jnp.mod(d1 * ci * n1, float(period)) + q1 * x, float(period))
        return ang.reshape(hq * dim1, cols)

    def dft(k):
        ri = jax.lax.broadcasted_iota(f32, (k, k), 0)
        ci = jax.lax.broadcasted_iota(f32, (k, k), 1)
        ang = (-2.0 * math.pi / k) * jnp.mod(ri * ci, float(k))
        return jnp.cos(ang), jnp.sin(ang)

    fmr, fmi = dft(m)
    p1 = n1 * r
    # frq[q1*r+beta, b] = F_r[beta,b] * A[q1,b]: rows (q1, beta), cols b
    afr = stacked_angle(-1.0, p1, r, r)
    frq_r, frq_i = jnp.cos(afr), jnp.sin(afr)
    # qrq[q1*r+b, beta] = conj(F_r[b,beta] * A[q1,b]) / r: rows (q1, b) —
    # the conj(A) factor scales output ROWS b, hence cross_row
    aqr = stacked_angle(+1.0, p1, r, r, cross_row=True)
    qrq_r, qrq_i = jnp.cos(aqr) / r, jnp.sin(aqr) / r
    # twf[q1*r+beta, c] = W_{rm}^{beta c} * W_n^{q1 c}: rows (q1, beta)
    atw = stacked_angle(-1.0, n, r, m)
    out = dict(
        frq_r=frq_r.astype(_STORE_DTYPE),
        frq_i=frq_i.astype(_STORE_DTYPE),
        frq_s=(frq_r + frq_i).astype(_STORE_DTYPE),
        fmr=fmr, fmi=fmi, fms=fmr + fmi,
        qrq_r=qrq_r.astype(_STORE_DTYPE),
        qrq_i=qrq_i.astype(_STORE_DTYPE),
        qrq_s=(qrq_r + qrq_i).astype(_STORE_DTYPE),
        qmr=fmr / m, qmi=-fmi / m, qms=(fmr - fmi) / m,
        twf_r=jnp.cos(atw).astype(_STORE_DTYPE),
        twf_i=jnp.sin(atw).astype(_STORE_DTYPE),
    )
    return out


_CONST_KEYS = ("frq_r", "frq_i", "frq_s", "fmr", "fmi", "fms",
               "qrq_r", "qrq_i", "qrq_s", "qmr", "qmi", "qms",
               "twf_r", "twf_i")


def _stage1_block(x_blocks, coefs, q1):
    """sum_a1 coef[a1] * x_blocks[a1] -> (re, im) f32 pair (or (re, None)
    when every imaginary coefficient is zero)."""
    accr = None
    acci = None
    for a1, xb in enumerate(x_blocks):
        cr, ci = coefs[q1][a1]
        if abs(cr) > 1e-12:
            term = xb if cr == 1.0 else (-xb if cr == -1.0 else xb * cr)
            accr = term if accr is None else accr + term
        if abs(ci) > 1e-12:
            term = xb if ci == 1.0 else (-xb if ci == -1.0 else xb * ci)
            acci = term if acci is None else acci + term
    if accr is None:
        accr = jnp.zeros_like(x_blocks[0])
    return accr, acci


def _fwd_block(x_blocks, coefs, q1, r, C):
    """One q1 row-block of the forward transform: stage-1 combo + twiddle-
    folded pass-A + combined sub twiddle + pass-B. Returns (r, m) pair."""
    st = _STORE_DTYPE
    gr, gi = _stage1_block(x_blocks, coefs, q1)
    sl = slice(q1 * r, (q1 + 1) * r)
    gr = gr.astype(st)
    if gi is None:
        # all-real stage-1 coefficients (q1 = 0 and q1 = n1/2):
        # real-input pass A, 2 matmuls
        ar = _mm(C["frq_r"][sl, :], gr)
        ai = _mm(C["frq_i"][sl, :], gr)
    else:
        gi = gi.astype(st)
        ar, ai = _kara_l(C["frq_r"][sl, :], C["frq_i"][sl, :],
                         C["frq_s"][sl, :], gr, gi)
    twr = C["twf_r"][sl, :].astype(st)
    twi = C["twf_i"][sl, :].astype(st)
    ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
    return _kara_r(ar, ai, C["fmr"], C["fmi"], C["fms"])


def _inv_block(wr, wi, q1, r, C):
    """One q1 row-block of the inverse: sub-IFFT with the conj outer
    twiddle folded into conj(twf) and the qrq matrices. Returns the H
    block pair (r, m) feeding the final stage-1 combo."""
    st = _STORE_DTYPE
    ar, ai = _kara_r(wr, wi, C["qmr"], C["qmi"], C["qms"])
    sl = slice(q1 * r, (q1 + 1) * r)
    twr = C["twf_r"][sl, :].astype(st)
    twi = C["twf_i"][sl, :].astype(st)
    ar, ai = ar * twr + ai * twi, ai * twr - ar * twi  # conj combined tw
    return _kara_l(C["qrq_r"][sl, :], C["qrq_i"][sl, :],
                   C["qrq_s"][sl, :], ar, ai)


def _read_blocks(ref, h1, r):
    return [ref[a1 * r:(a1 + 1) * r, :] for a1 in range(h1)]


def _stage1_inverse_emit(hr_blocks, hi_blocks, inv_coefs, u_blocks, d_ref,
                         y_ref, h1, r, nq):
    """Final combo: y[a1] = sum_{q1<=n1/2} w*Re(coef * H_q1) + u*D per
    block — the Hermitian-paired upper blocks ride inside the doubled
    interior coefficients (see _stage1_coefs)."""
    for a1 in range(h1):
        acc = None
        for q1 in range(nq):
            cr, ci = inv_coefs[a1][q1]
            if abs(cr) > 1e-12:
                t = hr_blocks[q1] if cr == 1.0 else hr_blocks[q1] * cr
                acc = t if acc is None else acc + t
            if abs(ci) > 1e-12:
                t = hi_blocks[q1] if ci == 1.0 else hi_blocks[q1] * ci
                acc = -t if acc is None else acc - t
        y = acc + u_blocks[a1] * d_ref[0, :, :1]
        y_ref[0, 0, a1 * r:(a1 + 1) * r, :] = y.astype(y_ref.dtype)


def _conv_kernel_outer(u_ref, k_ref, d_ref, *refs,
                       n1: int, r: int, m: int):
    """Whole-conv program for one (channel, batch) row, per-q1 unrolled.

    MXU note (round 4, measured): a restructured variant batched every
    lane-contracting pass (forward pass-B, inverse pass-A — identical
    across q1 blocks) into ONE (n1*r, m) matmul set via scratch staging,
    lifting those matmuls from M=r to M=n1*r rows. On v5e at 2^20 it
    measured 30.8 ms fwd vs this form's 29.5 AND took a pathological
    22-minute Mosaic compile (the old balanced-3 kernel failed the same
    way) — the VMEM staging round trips cost more than the extra matmul
    pipeline efficiency buys. Kept per-q1."""
    nc = len(_CONST_KEYS)
    C = dict(zip(_CONST_KEYS, refs[:nc]))
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    st = _STORE_DTYPE
    h1 = n1 // 2
    hq = h1 + 1  # Hermitian-halved block count (see _stage1_coefs)
    fwd_c, inv_c = _stage1_coefs(n1)
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kb = _read_blocks(k_ref[0], h1, r)
        kb = [x.astype(jnp.float32) for x in kb]
        for q1 in range(hq):
            zr, zi = _fwd_block(kb, fwd_c, q1, r, C)
            ksr_ref[q1 * r:(q1 + 1) * r, :] = zr
            ksi_ref[q1 * r:(q1 + 1) * r, :] = zi

    ub = _read_blocks(u_ref[0, 0], h1, r)
    ub_f32 = [x.astype(jnp.float32) for x in ub]
    # running per-a1 accumulators instead of (produce all blocks -> emit):
    # the stage-1-inverse VPU combos interleave with the NEXT q1 block's
    # matmuls, so the VPU tail no longer serializes after the MXU work
    acc = [None] * h1
    for q1 in range(hq):
        zr, zi = _fwd_block(ub_f32, fwd_c, q1, r, C)
        kr = ksr_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        ki = ksi_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        hr, hi = _inv_block(zr * kr - zi * ki, zr * ki + zi * kr, q1, r, C)
        hr = hr.astype(jnp.float32)
        hi = hi.astype(jnp.float32)
        for a1 in range(h1):
            cr, ci = inv_c[a1][q1]
            t = None
            if abs(cr) > 1e-12:
                t = hr if cr == 1.0 else hr * cr
            if abs(ci) > 1e-12:
                ti = hi if ci == 1.0 else hi * ci
                t = -ti if t is None else t - ti
            if t is not None:
                acc[a1] = t if acc[a1] is None else acc[a1] + t
    for a1 in range(h1):
        y = acc[a1] + ub_f32[a1] * d_ref[0, :, :1]
        y_ref[0, 0, a1 * r:(a1 + 1) * r, :] = y.astype(y_ref.dtype)


def fftconv_outer_fwd(u, k, D, n1: int, r: int, m: int,
                      interpret: bool = False):
    """Forward: u (B, C, Lp) -> y (B, C, Lp), Lp = (n1//2)*r*m."""
    bsz, c, lp = u.shape
    h1 = n1 // 2
    assert lp == h1 * r * m and k.shape == (c, lp)
    y4 = fftconv_outer_fwd4(u.reshape(bsz, c, h1 * r, m),
                            k.reshape(c, h1 * r, m), D, n1, r, m,
                            interpret=interpret)
    return y4.reshape(bsz, c, lp)


def fftconv_outer_fwd4(u, k, D, n1: int, r: int, m: int,
                       interpret: bool = False):
    """Forward on PRE-SHAPED operands: u (B, C, h1*r, m) -> y same shape.

    Why a 4-D entry point: on TPU the flat (C, Lp) array and the kernel's
    (C, h1*r, m) view have DIFFERENT physical tilings (T(8,128) applies to
    the trailing two dims), so reshaping between them is a full-array
    relayout copy — measured 48 x ~0.8 ms per 450k train step (the 'copy'
    family in artifacts/profile_families.json). Producers that can emit
    the 4-D layout directly (the fused Hyena front end, the filter bank
    builder) call this entry point and skip the retile entirely."""
    bsz, c, rows, mm = u.shape
    h1 = n1 // 2
    assert rows == h1 * r and mm == m and k.shape == (c, rows, m)
    consts = _consts_outer(n1, r, m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv_kernel_outer, n1=n1, r=r, m=m)
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(c, bsz),
        in_specs=[
            io_spec,
            pl.BlockSpec((1, h1 * r, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, h1 * r, m), u.dtype),
        scratch_shapes=[
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(u, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1, 1), (1, 1, 128)),
      *vals)
    return y


def _fwd_block_dyn(x_ref, c1r, c1i, q1, h1, r, C, sub=(0, 0)):
    """Forward transform block for a DYNAMIC q1 (fori_loop body): stage-1
    coefficients come from SMEM; the outer twiddle rides inside the
    q1-sliced frq matrices + combined twf table (see _consts_outer)."""
    st = _STORE_DTYPE
    gr = None
    gi = None
    for a1 in range(h1):
        xb = x_ref[sub + (pl.ds(a1 * r, r), slice(None))].astype(jnp.float32)
        tr = xb * c1r[q1, a1]
        ti = xb * c1i[q1, a1]
        gr = tr if gr is None else gr + tr
        gi = ti if gi is None else gi + ti
    sl = pl.ds(q1 * r, r)
    ar, ai = _kara_l(C["frq_r"][sl, :], C["frq_i"][sl, :], C["frq_s"][sl, :],
                     gr.astype(st), gi.astype(st))
    twr = C["twf_r"][sl, :].astype(st)
    twi = C["twf_i"][sl, :].astype(st)
    ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
    return _kara_r(ar, ai, C["fmr"], C["fmi"], C["fms"])


def _inv_block_dyn(wr, wi, q1, r, C):
    """Inverse block for a DYNAMIC q1: conj outer twiddle folded into
    conj(twf) + the qrq matrices."""
    st = _STORE_DTYPE
    ar, ai = _kara_r(wr, wi, C["qmr"], C["qmi"], C["qms"])
    sl = pl.ds(q1 * r, r)
    twr = C["twf_r"][sl, :].astype(st)
    twi = C["twf_i"][sl, :].astype(st)
    ar, ai = ar * twr + ai * twi, ai * twr - ar * twi
    return _kara_l(C["qrq_r"][sl, :], C["qrq_i"][sl, :], C["qrq_s"][sl, :],
                   ar, ai)


def _bwd_kernel_outer(c1r, c1i, i1r, i1i, u_ref, dy_ref, k_ref, d_ref, *refs,
                      n1: int, r: int, m: int):
    """One-program recompute backward for one channel: transforms u and dy,
    emits du per batch, accumulates the dk spectrum in f32 scratch and runs
    its inverse + Parseval dD on the last batch program.

    Round 5: per-q1 work is UNROLLED with baked Python-float stage-1
    coefficients (zero terms elided, +-1 multiplies folded), mirroring
    the forward kernel. The round-4 fori_loop/SMEM form existed because
    'an unrolled 3-transform program exceeds the compile pipeline's
    program-size limits' — that limit was the remote-compile payload
    chokepoint (closed-over constants), and Hermitian halving cut the
    block count 16 -> 9 besides: the unrolled form compiles in ~30 s and
    runs ~25-30% faster (no dynamic-slice addressing, real-coefficient
    q1 = 0, n1/2 blocks drop a third of their matmuls). The SMEM c1r/c1i
    inputs are retained in the signature (unused) so the launch shape is
    unchanged."""
    nc = len(_CONST_KEYS)
    C = dict(zip(_CONST_KEYS, refs[:nc]))
    du_ref, dk_ref, dd_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    ksr_ref, ksi_ref, pr_ref, pi_ref, hr_ref, hi_ref = refs[nc + 3:nc + 9]
    st = _STORE_DTYPE
    h1 = n1 // 2
    hq = h1 + 1  # Hermitian-halved block count (see _stage1_coefs)
    fwd_c, inv_c = _stage1_coefs(n1)
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kb = [x.astype(jnp.float32) for x in _read_blocks(k_ref[0], h1, r)]
        for q1 in range(hq):
            zr, zi = _fwd_block(kb, fwd_c, q1, r, C)
            ksr_ref[q1 * r:(q1 + 1) * r, :] = zr
            ksi_ref[q1 * r:(q1 + 1) * r, :] = -zi  # conj: correlation

    ub = [x.astype(jnp.float32) for x in _read_blocks(u_ref[0, 0], h1, r)]
    dyb = [x.astype(jnp.float32) for x in _read_blocks(dy_ref[0, 0], h1, r)]
    # running per-a1 du accumulators (see forward kernel: interleaves the
    # stage-1-inverse VPU combos with the next q1 block's matmuls)
    acc = [None] * h1
    for q1 in range(hq):
        ur, ui = _fwd_block(ub, fwd_c, q1, r, C)
        dr, di = _fwd_block(dyb, fwd_c, q1, r, C)
        sl = slice(q1 * r, (q1 + 1) * r)
        kr = ksr_ref[sl, :].astype(st)
        ki = ksi_ref[sl, :].astype(st)
        hr, hi = _inv_block(dr * kr - di * ki, dr * ki + di * kr, q1, r, C)
        hr = hr.astype(jnp.float32)
        hi = hi.astype(jnp.float32)
        for a1 in range(h1):
            cr, ci = inv_c[a1][q1]
            t = None
            if abs(cr) > 1e-12:
                t = hr if cr == 1.0 else hr * cr
            if abs(ci) > 1e-12:
                ti = hi if ci == 1.0 else hi * ci
                t = -ti if t is None else t - ti
            if t is not None:
                acc[a1] = t if acc[a1] is None else acc[a1] + t
        pr = (dr * ur + di * ui).astype(jnp.float32)
        pi = (di * ur - dr * ui).astype(jnp.float32)

        @pl.when(bi == 0)
        def _():
            pr_ref[sl, :] = pr
            pi_ref[sl, :] = pi

        @pl.when(bi != 0)
        def _():
            pr_ref[sl, :] = pr_ref[sl, :] + pr
            pi_ref[sl, :] = pi_ref[sl, :] + pi

    # du = accumulated stage-1 inverse + dy * D (inv_c carries the
    # Hermitian doubling for interior q1)
    for a1 in range(h1):
        du = acc[a1] + dyb[a1] * d_ref[0, :, :1]
        du_ref[0, 0, a1 * r:(a1 + 1) * r, :] = du.astype(du_ref.dtype)

    @pl.when(bi == nb - 1)
    def _():
        # inverse of the accumulated dk spectrum. Parseval dD sums the P
        # spectrum: pair blocks contribute their conjugates, so interior
        # blocks are doubled and the global imaginary parts cancel — only
        # the real sums are accumulated.
        dd = jnp.zeros((), jnp.float32)
        kacc = [None] * h1
        for q1 in range(hq):
            sl = slice(q1 * r, (q1 + 1) * r)
            spr = pr_ref[sl, :]
            spi = pi_ref[sl, :]
            gr, gi = _inv_block(spr.astype(st), spi.astype(st), q1, r, C)
            gr = gr.astype(jnp.float32)
            gi = gi.astype(jnp.float32)
            for a1 in range(h1):
                cr, ci = inv_c[a1][q1]
                t = None
                if abs(cr) > 1e-12:
                    t = gr if cr == 1.0 else gr * cr
                if abs(ci) > 1e-12:
                    ti = gi if ci == 1.0 else gi * ci
                    t = -ti if t is None else t - ti
                if t is not None:
                    kacc[a1] = t if kacc[a1] is None else kacc[a1] + t
            w = 2.0 if 0 < q1 < h1 else 1.0
            dd = dd + w * jnp.sum(spr)
        for a1 in range(h1):
            dk_ref[0, a1 * r:(a1 + 1) * r, :] = kacc[a1].astype(dk_ref.dtype)
        dd_ref[:] = jnp.full((1, 1, 128), dd / (n1 * r * m), jnp.float32)


def fftconv_outer_bwd(u, dy, k, D, n1: int, r: int, m: int,
                      interpret: bool = False):
    """(du, dk_time, dD) for fft 2^20/2^21, recomputing both transforms."""
    bsz, c, lp = u.shape
    h1 = n1 // 2
    assert lp == h1 * r * m and k.shape == (c, lp)
    du4, dk4, dd = fftconv_outer_bwd4(
        u.reshape(bsz, c, h1 * r, m), dy.reshape(bsz, c, h1 * r, m),
        k.reshape(c, h1 * r, m), D, n1, r, m, interpret=interpret)
    return du4.reshape(bsz, c, lp), dk4.reshape(c, lp), dd


def fftconv_outer_bwd4(u, dy, k, D, n1: int, r: int, m: int,
                       interpret: bool = False):
    """Backward on PRE-SHAPED (B, C, h1*r, m) operands (see
    fftconv_outer_fwd4): returns (du4, dk4, dD) in the same 4-D layout,
    skipping the flat<->4-D relayout copies."""
    bsz, c, rows, mm = u.shape
    h1 = n1 // 2
    assert rows == h1 * r and mm == m and k.shape == (c, rows, m)
    consts = _consts_outer(n1, r, m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    fwd_c, inv_c = _stage1_coefs(n1)
    import numpy as np
    c1r = jnp.asarray(np.array([[x[0] for x in row] for row in fwd_c],
                               np.float32))
    c1i = jnp.asarray(np.array([[x[1] for x in row] for row in fwd_c],
                               np.float32))
    i1r = jnp.asarray(np.array([[x[0] for x in row] for row in inv_c],
                               np.float32))
    i1i = jnp.asarray(np.array([[x[1] for x in row] for row in inv_c],
                               np.float32))
    smem_specs = [
        pl.BlockSpec(a.shape, lambda ci, bi: (0, 0),
                     memory_space=pltpu.SMEM)
        for a in (c1r, c1i, i1r, i1i)
    ]
    kernel = functools.partial(_bwd_kernel_outer, n1=n1, r=r, m=m)
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)
    du, dk, dd = pl.pallas_call(
        kernel,
        grid=(c, bsz),
        in_specs=[
            *smem_specs,
            io_spec,
            io_spec,
            pl.BlockSpec((1, h1 * r, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            io_spec,
            pl.BlockSpec((1, h1 * r, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h1 * r, m), dy.dtype),
            # dk in k's dtype: the f32 accumulation lives in scratch; a
            # f32 dk output would cost an extra 0.5 GB write + a separate
            # convert pass per conv at 2^20 (k is bf16 in-model >= 32k)
            jax.ShapeDtypeStruct((c, h1 * r, m), k.dtype),
            jax.ShapeDtypeStruct((c, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
            pltpu.VMEM(((h1 + 1) * r, m), jnp.float32),
            pltpu.VMEM(((h1 + 1) * r, m), jnp.float32),
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
            pltpu.VMEM(((h1 + 1) * r, m), _STORE_DTYPE),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(c1r, c1i, i1r, i1i,
      u, dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1, 1), (1, 1, 128)),
      *vals)
    return du, dk, dd[:, 0, 0]
