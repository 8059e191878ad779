"""Pallas TPU kernel: fully-fused FFT convolution (FlashFFTConv for the MXU).

The XLA matmul-FFT conv (`ops/fftconv.py`, chain formulation) runs each DFT
pass as a separate HLO, so every pass round-trips the (rows, N) spectrum
through HBM — ~4.5 GB per conv at the 32k bench shape, ~36% of HBM peak,
with the MXU idle between passes. This kernel runs the ENTIRE conv

    pad -> DFT_r -> twiddle -> DFT_m -> bin-multiply with the filter
    spectrum -> conj DFT_m -> conj twiddle -> conj DFT_r (real part) -> +u*D

inside one program per (channel-block, batch) grid cell, holding the
spectrum in VMEM: HBM sees only u in and y out (plus the per-channel filter
spectrum, reused across the batch grid dim). This is the adaptation of
FlashFFTConv (arXiv 2311.05908) to the TPU memory hierarchy, replacing the
reference's fftconv CUDA extension (`/root/reference/csrc/fftconv/`,
`/root/reference/src/ops/fftconv.py:15-55`).

Structure exploited:
  * causal zero-padding means the time grid's rows a >= r/2 are zero, so the
    first DFT contracts K=r/2 (half the matrix) and the final inverse pass
    emits only the first r/2 output rows;
  * the filter spectrum is precomputed once per call (C rows, cheap in XLA)
    and laid out (r, C, m) so the kernel multiplies it in place;
  * interior math is f32 in VMEM (better accuracy than the XLA path's bf16
    interior) with bf16 MXU dot inputs;
  * every dot is a plain 2D matmul — the (r, CB, m) <-> (r*CB, m) views are
    contiguous minor-dim merges, free in VMEM.

Forward and input-gradient share one kernel (du = inv(dy_f * conj(k_f)) +
dy*D is the same computation with a conjugated filter spectrum); the filter
gradient accumulates sum_b dy_f * conj(u_f) across the sequential batch
grid dim into the output block, with the cheap C-row inverse done in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params(n: int):
    """Per-kernel VMEM validation cap. Mosaic checks the kernel's computed
    stack usage against this limit (it does not change codegen): at
    n=2^17 the spectrum-saving backward measures 64.73 MB, a hair over the
    process-global 64 MB scoped budget (utils/tpu_flags.py). Raise the cap
    only for n >= 2^17 so the tuned n=2^16 (32k-bench) kernels keep a
    byte-identical compile."""
    if n >= (1 << 17):
        return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    return None


def _dft_consts(r: int, m: int, n: int):
    """All matrices the kernel needs, f32: forward half-DFT_r, DFT_m,
    twiddle, and their conjugated/normalized inverses."""
    import numpy as np

    a = np.arange(r)
    ang_r = -2.0 * np.pi / r * (a[:, None] * a[None, :])
    fr_re, fr_im = np.cos(ang_r), np.sin(ang_r)
    b = np.arange(m)
    ang_m = -2.0 * np.pi / m * (b[:, None] * b[None, :])
    fm_re, fm_im = np.cos(ang_m), np.sin(ang_m)
    ang_t = -2.0 * np.pi / n * (a[:, None] * b[None, :])
    tw_re, tw_im = np.cos(ang_t), np.sin(ang_t)
    r2 = r // 2
    consts = dict(
        fr_re=fr_re[:, :r2],  # (r, r2): time rows a >= r/2 are zero
        fr_im=fr_im[:, :r2],
        fm_re=fm_re,  # (q, b) == (b, q): F is symmetric
        fm_im=fm_im,
        tw_re=tw_re,  # (r, m)
        tw_im=tw_im,
        cm_re=fm_re / m,  # conj(F_m)/m
        cm_im=-fm_im / m,
        cr_re=fr_re[:r2, :] / r,  # (r2, r): only the first r/2 time rows
        cr_im=-fr_im[:r2, :] / r,
        # Karatsuba sums: one (A+B)(Fr+Fi) matmul replaces two of the four
        # in each complex product (25% fewer MXU FLOPs in those passes)
        fm_s=fm_re + fm_im,
        cm_s=(fm_re - fm_im) / m,
        # Karatsuba sums for the batch-packed kernels' complex-input first
        # pass and complex-output last pass
        fr_s=(fr_re + fr_im)[:, :r2],
        cr_s=(fr_re[:r2, :] - fr_im[:r2, :]) / r,
    )
    return {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}


_CONST_KEYS = ("fr_re", "fr_im", "fm_re", "fm_im", "tw_re", "tw_im",
               "cm_re", "cm_im", "cr_re", "cr_im", "fm_s", "cm_s")
# packed kernels additionally take the first/last-pass Karatsuba sums
_CONST_KEYS_PK = _CONST_KEYS + ("fr_s", "cr_s")


# MXU dot input dtype and VMEM interior storage dtype; tests may set f32 to
# separate structure from rounding. bf16 interiors keep the per-program
# working set inside VMEM at cb=8 (the (8,128) block rule forces cb>=8).
_DOT_DTYPE = jnp.bfloat16
_STORE_DTYPE = jnp.bfloat16


def _mm(a, b):
    """(M, K) @ (K, N) -> f32-accumulated product stored as _STORE_DTYPE."""
    return jax.lax.dot_general(
        a.astype(_DOT_DTYPE),
        b.astype(_DOT_DTYPE),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_STORE_DTYPE)


def _mid_transform(gr, gi, cb, r, m, twr, twi, fmr, fmi, fms):
    """Shared tail of the forward transform: twiddle the (r, CB*m) pass-1
    output pair, then contract the minor digit with F_m."""
    st = _STORE_DTYPE
    # twiddle W_n^{pb}: broadcast over CB via the (r, CB, m) view
    tr = twr[:].astype(st)[:, None, :]
    ti = twi[:].astype(st)[:, None, :]
    g3r = gr.reshape(r, cb, m)
    g3i = gi.reshape(r, cb, m)
    g3r, g3i = g3r * tr - g3i * ti, g3r * ti + g3i * tr
    gr = g3r.reshape(r * cb, m)
    gi = g3i.reshape(r * cb, m)
    # pass 2: contract b with F_m (symmetric) -> (r*CB, m[q]);
    # 3-matmul Karatsuba when the summed matrix is provided
    if fms is not None:
        t1 = _mm(gr, fmr[:])
        t2 = _mm(gi, fmi[:])
        t3 = _mm(gr + gi, fms[:])
        zr = t1 - t2
        zi = t3 - t1 - t2
    else:
        zr = _mm(gr, fmr[:]) - _mm(gi, fmi[:])
        zi = _mm(gr, fmi[:]) + _mm(gi, fmr[:])
    return zr.reshape(r, cb, m), zi.reshape(r, cb, m)


def _fwd_transform(x, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms=None):
    """(CB, Lp) real -> digit-permuted spectrum pair, each (r, CB, m),
    stored in _STORE_DTYPE throughout."""
    st = _STORE_DTYPE
    r2 = r // 2
    x = x.astype(st)
    xt = jnp.transpose(x.reshape(cb, r2, m), (1, 0, 2)).reshape(r2, cb * m)
    # pass 1: contract the (half) major digit -> (r, CB*m)
    gr = _mm(frr[:], xt)
    gi = _mm(fri[:], xt)
    return _mid_transform(gr, gi, cb, r, m, twr, twi, fmr, fmi, fms)


def _fwd_transform_c(x0, x1, cb, r, m, frr, fri, frs, fmr, fmi, twr, twi,
                     fms):
    """Batch-packed transform: spectrum of the COMPLEX signal x0 + i*x1
    (both (CB, Lp) real rows). One complex chain covers two real rows —
    the conv is linear and the filter is shared, so
    ifft(fft(x0 + i x1) * K) = conv(x0, k) + i conv(x1, k) with no
    conjugate-symmetry unpacking anywhere."""
    st = _STORE_DTYPE
    r2 = r // 2
    xt0 = jnp.transpose(x0.astype(st).reshape(cb, r2, m),
                        (1, 0, 2)).reshape(r2, cb * m)
    xt1 = jnp.transpose(x1.astype(st).reshape(cb, r2, m),
                        (1, 0, 2)).reshape(r2, cb * m)
    # complex pass 1, Karatsuba: (F_r^re + i F_r^im)(x0 + i x1) in 3 matmuls
    t1 = _mm(frr[:], xt0)
    t2 = _mm(fri[:], xt1)
    t3 = _mm(frs[:], xt0 + xt1)
    gr = t1 - t2
    gi = t3 - t1 - t2
    return _mid_transform(gr, gi, cb, r, m, twr, twi, fmr, fmi, fms)


def _inv_common(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms):
    """Inverse pass 1 (Karatsuba contract q with conj(F_m)/m) + conjugate
    twiddle: (r*CB, m) product pair -> (r, CB*m) pair for the final pass."""
    st = _STORE_DTYPE
    t1 = _mm(wr, cmr[:])
    t2 = _mm(wi, cmi[:])
    t3 = _mm(wr + wi, cms[:])
    hr = t1 - t2
    hi = t3 - t1 - t2
    tr = twr[:].astype(st)[:, None, :]
    ti = twi[:].astype(st)[:, None, :]
    h3r = hr.reshape(r, cb, m)
    h3i = hi.reshape(r, cb, m)
    h3r, h3i = h3r * tr + h3i * ti, h3i * tr - h3r * ti
    return h3r.reshape(r, cb * m), h3i.reshape(r, cb * m)


def _inverse_real(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms, crr, cri):
    """Full inverse, REAL part only -> (CB, Lp) natural-order rows."""
    r2 = r // 2
    a, b = _inv_common(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms)
    yr = _mm(crr[:], a) - _mm(cri[:], b)
    return jnp.transpose(yr.reshape(r2, cb, m), (1, 0, 2)).reshape(cb, r2 * m)


def _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms, crr, cri, crs):
    """Full inverse with COMPLEX output (batch-packed): returns the real and
    imaginary time-domain rows, each (CB, Lp) natural order."""
    r2 = r // 2
    a, b = _inv_common(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms)
    # complex last pass, Karatsuba: (C_r^re + i C_r^im)(a + i b)
    t1 = _mm(crr[:], a)
    t2 = _mm(cri[:], b)
    t3 = _mm(crs[:], a + b)
    yre = t1 - t2
    yim = t3 - t1 - t2
    y0 = jnp.transpose(yre.reshape(r2, cb, m), (1, 0, 2)).reshape(cb, r2 * m)
    y1 = jnp.transpose(yim.reshape(r2, cb, m), (1, 0, 2)).reshape(cb, r2 * m)
    return y0, y1


def _conv_kernel(u_ref, k_ref, d_ref,
                 frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri, fms, cms,
                 y_ref, *out_refs, r: int, m: int, conj: bool,
                 save_spectrum: bool = False):
    if save_spectrum:
        zr_ref, zi_ref, ksr_ref, ksi_ref = out_refs
    else:
        ksr_ref, ksi_ref = out_refs
    """One (channel-block, batch) program: full causal conv for CB rows.

    The filter spectrum is computed IN-KERNEL at batch index 0 (grid's
    innermost dim) and cached in VMEM scratch for the remaining batch
    programs of the channel block — the filter FFT never touches HBM
    (vs the old XLA-side precompute: ~2.4 ms + a 134 MB f32 spectrum
    round trip per conv at the 32k bench shape)."""
    st = _STORE_DTYPE
    r2 = r // 2
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = (-ki0) if conj else ki0

    u = u_ref[0]  # (CB, Lp), Lp = r2*m
    zr, zi = _fwd_transform(u, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms)
    if save_spectrum:
        zr_ref[0] = zr.astype(zr_ref.dtype)
        zi_ref[0] = zi.astype(zi_ref.dtype)

    # bin-wise multiply with the filter spectrum (r, CB, m)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (zr * kr - zi * ki).reshape(r * cb, m)
    wi = (zr * ki + zi * kr).reshape(r * cb, m)

    y = _inverse_real(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms, crr, cri)
    y = y.astype(jnp.float32) + u.astype(jnp.float32) * d_ref[:, 0][:, None]
    y_ref[0] = y.astype(y_ref.dtype)


def fftconv_fused_fwd(u, k, D, r: int, m: int, cb: int,
                      conj_filter: bool = False, interpret: bool = False,
                      save_spectrum: bool = False):
    """Causal conv of u with the (C, Lp) time-domain filter k, plus u*D.
    The filter spectrum is computed in-kernel (scratch-cached per channel
    block); conj_filter=True convolves with the conjugated spectrum
    (correlation — the input-gradient computation).

    u: (B, C, Lp) with Lp = (r//2)*m; returns (B, C, Lp) in u.dtype —
    or (y, ur, ui) with u's (B, r, C, m) permuted spectrum when
    save_spectrum (the VJP saves it so the backward skips u's transform).
    """
    bsz, c, lp = u.shape
    assert lp == (r // 2) * m, (lp, r, m)
    assert k.shape == (c, lp), (k.shape, c, lp)
    assert c % cb == 0
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv_kernel, r=r, m=m, conj=conj_filter,
                               save_spectrum=save_spectrum)
    out_specs = [pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bsz, c, lp), u.dtype)]
    if save_spectrum:
        # u's digit-permuted spectrum, for the backward to reuse
        out_specs += [pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((bsz, r, c, m), _STORE_DTYPE)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),  # batch innermost: filter/const blocks stay put
        in_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            # D rides as a (C, 128) tile: Mosaic needs the minor block dim
            # to be 128-divisible (or the full array dim)
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=out_specs if save_spectrum else out_specs[0],
        out_shape=out_shape if save_spectrum else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
        # k keeps its native dtype: the kernel's dots round to bf16 anyway
    )(u, k, jnp.tile(D.reshape(c, 1), (1, 128)), *vals)
    return outs


def _bwd_kernel(u_ref, dy_ref, k_ref, d_ref,
                frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri, fms, cms,
                du_ref, pr_ref, pi_ref, dd_ref, ksr_ref, ksi_ref,
                *, r: int, m: int):
    """Fused backward program: one transform of u and dy each, then
      du = inv(dy_f * conj(k_f)) + dy*D          (written per batch)
      dk_spec += dy_f * conj(u_f)                (f32 accum over batch)
      dD += sum_l dy*u                           (f32 accum over batch)
    vs the previous two-kernel backward this reads dy once instead of
    twice and transforms it once instead of twice."""
    st = _STORE_DTYPE
    r2 = r // 2
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    u = u_ref[0]
    dy = dy_ref[0]
    ur, ui = _fwd_transform(u, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms)
    dr, di = _fwd_transform(dy, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms)

    # input grad: multiply with the conjugated filter spectrum, invert
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (dr * kr - di * ki).reshape(r * cb, m)
    wi = (dr * ki + di * kr).reshape(r * cb, m)
    du = _inverse_real(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms, crr, cri)
    du = du.astype(jnp.float32) + dy.astype(jnp.float32) * d_ref[:, 0][:, None]
    du_ref[0] = du.astype(du_ref.dtype)

    # filter-grad spectrum + D-grad accumulators
    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)
    dd = jnp.sum(u.astype(jnp.float32) * dy.astype(jnp.float32),
                 axis=1, keepdims=True)  # (cb, 1)
    dd = jnp.broadcast_to(dd, (cb, 128))

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi
        dd_ref[:] = dd

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi
        dd_ref[:] = dd_ref[:] + dd


def fftconv_fused_bwd(u, dy, k, D, r: int, m: int, cb: int,
                      interpret: bool = False):
    """(du, dk_spec_r, dk_spec_i, dD) for the no-gelu fused conv.

    u, dy: (B, C, Lp) f32; k: (C, Lp) f32. dk_spec is the (r, C, m) f32
    permuted-spectrum pair of sum_b dy_f * conj(u_f) (caller runs the cheap
    C-row inverse); dD comes back (C,) f32.
    """
    bsz, c, lp = u.shape
    assert lp == (r // 2) * m and k.shape == (c, lp)
    assert c % cb == 0
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_kernel, r=r, m=m)
    du, pr, pi, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), u.dtype),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, pr, pi, dd[:, 0]


def _bwd_spec_kernel(ur_ref, ui_ref, dy_ref, k_ref, d_ref,
                     frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                     fms, cms,
                     du_ref, dk_ref, dd_ref, pr_ref, pi_ref,
                     ksr_ref, ksi_ref, *, r: int, m: int):
    """Backward program consuming u's spectrum SAVED by the forward: one dy
    transform per program; dk's batch-summed spectrum accumulates in VMEM
    scratch and its inverse runs IN-KERNEL on the last batch program, so the
    (r, C, m) f32 spectrum never touches HBM; dD falls out of the same
    accumulator via Parseval."""
    st = _STORE_DTYPE
    r2 = r // 2
    cb = dy_ref.shape[1]
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    dy = dy_ref[0]
    ur = ur_ref[0].astype(st)
    ui = ui_ref[0].astype(st)
    dr, di = _fwd_transform(dy, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms)

    def _inverse(wr, wi):
        return _inverse_real(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                             crr, cri)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    du = _inverse((dr * kr - di * ki).reshape(r * cb, m),
                  (dr * ki + di * kr).reshape(r * cb, m))
    du = du.astype(jnp.float32) + dy.astype(jnp.float32) * d_ref[:, 0][:, None]
    du_ref[0] = du.astype(du_ref.dtype)

    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk_ref[:] = _inverse(spr.reshape(r * cb, m),
                             spi.reshape(r * cb, m)).astype(dk_ref.dtype)
        # Parseval: sum_l u*dy per channel = sum_bins Re(dk_spec) / N
        dd = jnp.sum(spr, axis=(0, 2), keepdims=False) / (r * m)
        dd_ref[:] = jnp.broadcast_to(dd[:, None], (cb, 128)).astype(jnp.float32)


def fftconv_fused_bwd_spec(ur, ui, dy, k, D, r: int, m: int, cb: int,
                           interpret: bool = False):
    """(du, dk_time, dD) given u's saved (B, r, C, m) spectrum. The whole
    filter gradient (spectrum accumulate + inverse) stays in VMEM."""
    bsz, c, lp = dy.shape
    assert lp == (r // 2) * m and k.shape == (c, lp)
    assert ur.shape == (bsz, r, c, m), ur.shape
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_spec_kernel, r=r, m=m)
    spec_in = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                           memory_space=pltpu.VMEM)
    du, dk, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[
            spec_in,
            spec_in,
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((c, lp), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(ur, ui, dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dk, dd[:, 0]


def _spec_accum_kernel(u_ref, dy_ref,
                       frr, fri, fmr, fmi, twr, twi,
                       or_ref, oi_ref, *, r: int, m: int):
    """Accumulate sum_b dy_f * conj(u_f) over the (sequential, innermost)
    batch grid dim into the (r, CB, m) output block."""
    bi = pl.program_id(1)
    cb = u_ref.shape[1]
    ur, ui = _fwd_transform(u_ref[0].astype(jnp.float32), cb, r, m,
                            frr, fri, fmr, fmi, twr, twi)
    dr, di = _fwd_transform(dy_ref[0].astype(jnp.float32), cb, r, m,
                            frr, fri, fmr, fmi, twr, twi)
    # dy_f * conj(u_f), accumulated in f32
    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        or_ref[:] = pr
        oi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        or_ref[:] = or_ref[:] + pr
        oi_ref[:] = oi_ref[:] + pi


def fftconv_fused_dk_spec(u, dy, r: int, m: int, cb: int,
                          interpret: bool = False):
    """(r, C, m) f32 pair: sum_b dy_f * conj(u_f) in the kernel's permuted
    spectrum layout. The caller runs the cheap C-row inverse in XLA."""
    bsz, c, lp = u.shape
    consts = _dft_consts(r, m, r * m)
    keys = ("fr_re", "fr_im", "fm_re", "fm_im", "tw_re", "tw_im")
    vals = [consts[k] for k in keys]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_spec_accum_kernel, r=r, m=m)
    return pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, dy, *vals)


# ---------------------------------------------------------------------------
# Split backward (fft 2^18): the one-kernel spectrum-saving backward needs
# 106.7 MB of scoped VMEM at cb=8 — over what fits alongside the block
# buffers in the 128 MB core. Splitting it at the natural seam (du needs
# dy_f and k_f; dk needs dy_f and u_f) gives two kernels that each fit:
#   A: transform dy once -> du = inv(dy_f*conj(k_f)) + dy*D, and WRITE the
#      dy spectrum pair to HBM (bf16) for B;
#   B: read the saved u and dy spectra, accumulate sum_b dy_f*conj(u_f) in
#      f32 scratch over the batch grid, inverse + Parseval dD in-kernel.
# Extra HBM vs the fused backward: one (B, r, C, m) bf16 spectrum pair
# round trip (~0.5 GB r+w at B=1, C=256, 2^18 — ~0.7 ms at v5e bandwidth),
# far below the XLA chain's per-pass round trips at this size.
# ---------------------------------------------------------------------------


def _bwd_du_kernel(dy_ref, k_ref, d_ref,
                   frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                   fms, cms,
                   du_ref, dr_ref, di_ref, ksr_ref, ksi_ref,
                   *, r: int, m: int):
    """du program: one dy transform (spectrum pair also written out for the
    dk kernel), multiply with conj(k_f), inverse, + dy*D."""
    st = _STORE_DTYPE
    cb = dy_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    dy = dy_ref[0]
    dr, di = _fwd_transform(dy, cb, r, m, frr, fri, fmr, fmi, twr, twi, fms)
    dr_ref[0] = dr.astype(dr_ref.dtype)
    di_ref[0] = di.astype(di_ref.dtype)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    du = _inverse_real((dr * kr - di * ki).reshape(r * cb, m),
                       (dr * ki + di * kr).reshape(r * cb, m),
                       cb, r, m, twr, twi, cmr, cmi, cms, crr, cri)
    du = du.astype(jnp.float32) + dy.astype(jnp.float32) * d_ref[:, 0][:, None]
    du_ref[0] = du.astype(du_ref.dtype)


def fftconv_fused_bwd_du(dy, k, D, r: int, m: int, cb: int,
                         interpret: bool = False):
    """(du, dy_spec_r, dy_spec_i): input gradient plus dy's permuted
    spectrum pair (bf16, (B, r, C, m)) for `fftconv_fused_dk_from_specs`."""
    bsz, c, lp = dy.shape
    assert lp == (r // 2) * m and k.shape == (c, lp)
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_du_kernel, r=r, m=m)
    spec_out = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                            memory_space=pltpu.VMEM)
    du, dr, di = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            spec_out,
            spec_out,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((bsz, r, c, m), _STORE_DTYPE),
            jax.ShapeDtypeStruct((bsz, r, c, m), _STORE_DTYPE),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dr, di


def _dk_from_specs_kernel(ur_ref, ui_ref, dr_ref, di_ref,
                          twr, twi, cmr, cmi, crr, cri, cms,
                          dk_ref, dd_ref, pr_ref, pi_ref, *, r: int, m: int):
    """dk program: no transforms — accumulate sum_b dy_f * conj(u_f) from
    the saved spectra, inverse + Parseval dD on the last batch program."""
    st = _STORE_DTYPE
    cb = ur_ref.shape[2]
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    ur = ur_ref[0].astype(st)
    ui = ui_ref[0].astype(st)
    dr = dr_ref[0].astype(st)
    di = di_ref[0].astype(st)
    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk_ref[:] = _inverse_real(
            spr.reshape(r * cb, m), spi.reshape(r * cb, m),
            cb, r, m, twr, twi, cmr, cmi, cms, crr, cri).astype(dk_ref.dtype)
        dd = jnp.sum(spr, axis=(0, 2), keepdims=False) / (r * m)
        dd_ref[:] = jnp.broadcast_to(dd[:, None], (cb, 128)).astype(jnp.float32)


def fftconv_fused_dk_from_specs(ur, ui, dr, di, r: int, m: int, cb: int,
                                interpret: bool = False):
    """(dk_time, dD) from saved u and dy spectrum pairs (B, r, C, m)."""
    bsz, _, c, _ = ur.shape
    lp = (r // 2) * m
    consts = _dft_consts(r, m, r * m)
    keys = ("tw_re", "tw_im", "cm_re", "cm_im", "cr_re", "cr_im", "cm_s")
    vals = [consts[key] for key in keys]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_dk_from_specs_kernel, r=r, m=m)
    spec_in = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                           memory_space=pltpu.VMEM)
    dk, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[spec_in, spec_in, spec_in, spec_in, *const_specs],
        out_specs=[
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, lp), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), jnp.float32),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(ur, ui, dr, di, *vals)
    return dk, dd[:, 0]


# ---------------------------------------------------------------------------
# Single-channel ("narrow", cb=1) kernels for fft >= 2^19 — the 450k/1M
# regime. VMEM temps scale with n*cb, so these sizes need cb < 8, but the
# (1, cb, Lp) block layout pins cb to the sublane dim (>= 8), and a 4-D
# (1, cb, r2, m) block needs (cb, r2, m) <-> (cb, Lp) merges whose sublane
# dim CHANGES — full VMEM relayouts that Mosaic stacks as extra buffers
# (measured: 108.9 MB scoped at n*cb = 2^20 vs the 96 MB cap).
#
# cb = 1 dissolves the problem: each program convolves ONE channel as a
# pure 2-D (r2, m) <-> (r, m) pipeline — every operand is naturally
# (sublane, lane)-tiled, there is NO relayout anywhere, and the matmuls
# stay MXU-sized ((r, r2)@(r2, m), (r, m)@(m, m)). The backward recomputes
# u's transform in-kernel (one program: du, dk-accumulate, inverse,
# Parseval dD) instead of saving spectra — a spectrum pair at these sizes
# is 0.5-2 GB of HBM per conv. D rides as (C, 1, 128) so its (1, 1, 128)
# block keeps a legal last-two-dims shape.
# ---------------------------------------------------------------------------


def _fwd_transform_2d(x, r, m, frr, fri, fmr, fmi, twr, twi, fms):
    """(r2, m) real row -> digit-permuted spectrum pair, each (r, m)."""
    st = _STORE_DTYPE
    x = x.astype(st)
    gr = _mm(frr[:], x)  # pass 1: contract the (half) major digit
    gi = _mm(fri[:], x)
    tr = twr[:].astype(st)
    ti = twi[:].astype(st)
    gr, gi = gr * tr - gi * ti, gr * ti + gi * tr
    # pass 2: contract the minor digit with F_m (Karatsuba, 3 matmuls)
    t1 = _mm(gr, fmr[:])
    t2 = _mm(gi, fmi[:])
    t3 = _mm(gr + gi, fms[:])
    return t1 - t2, t3 - t1 - t2


def _inverse_real_2d(wr, wi, r, m, twr, twi, cmr, cmi, cms, crr, cri):
    """(r, m) product pair -> (r2, m) natural-order real output row."""
    st = _STORE_DTYPE
    t1 = _mm(wr, cmr[:])
    t2 = _mm(wi, cmi[:])
    t3 = _mm(wr + wi, cms[:])
    hr = t1 - t2
    hi = t3 - t1 - t2
    tr = twr[:].astype(st)
    ti = twi[:].astype(st)
    hr, hi = hr * tr + hi * ti, hi * tr - hr * ti
    return _mm(crr[:], hr) - _mm(cri[:], hi)


def _conv_kernel_1(u_ref, k_ref, d_ref,
                   frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                   fms, cms,
                   y_ref, ksr_ref, ksi_ref, *, r: int, m: int):
    """Forward program: one channel's full causal conv, all 2-D."""
    st = _STORE_DTYPE
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform_2d(k_ref[0], r, m,
                                     frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    u = u_ref[0, 0]  # (r2, m)
    zr, zi = _fwd_transform_2d(u, r, m, frr, fri, fmr, fmi, twr, twi, fms)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    y = _inverse_real_2d(zr * kr - zi * ki, zr * ki + zi * kr,
                         r, m, twr, twi, cmr, cmi, cms, crr, cri)
    y = y.astype(jnp.float32) + u.astype(jnp.float32) * d_ref[0, :, :1]
    y_ref[0, 0] = y.astype(y_ref.dtype)


def fftconv_fused_fwd_narrow(u, k, D, r: int, m: int, cb: int = 1,
                             interpret: bool = False):
    """Forward for fft >= 2^19: u (B, C, Lp) -> y (B, C, Lp)."""
    del cb
    bsz, c, lp = u.shape
    r2 = r // 2
    assert lp == r2 * m and k.shape == (c, lp)
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv_kernel_1, r=r, m=m)
    io_spec = pl.BlockSpec((1, 1, r2, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(c, bsz),
        in_specs=[
            io_spec,
            pl.BlockSpec((1, r2, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, r2, m), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, m), _STORE_DTYPE),
            pltpu.VMEM((r, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u.reshape(bsz, c, r2, m), k.reshape(c, r2, m),
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1, 1), (1, 1, 128)),
      *vals)
    return y.reshape(bsz, c, lp)


def _bwd_full_kernel_1(u_ref, dy_ref, k_ref, d_ref,
                       frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                       fms, cms,
                       du_ref, dk_ref, dd_ref, ksr_ref, ksi_ref,
                       pr_ref, pi_ref, *, r: int, m: int):
    """One-program recompute backward for one channel: transforms u and dy,
    emits du per batch, accumulates the dk spectrum in f32 scratch and runs
    its inverse + Parseval dD on the last batch program."""
    st = _STORE_DTYPE
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform_2d(k_ref[0], r, m,
                                     frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    u = u_ref[0, 0]
    dy = dy_ref[0, 0]
    ur, ui = _fwd_transform_2d(u, r, m, frr, fri, fmr, fmi, twr, twi, fms)
    dr, di = _fwd_transform_2d(dy, r, m, frr, fri, fmr, fmi, twr, twi, fms)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    du = _inverse_real_2d(dr * kr - di * ki, dr * ki + di * kr,
                          r, m, twr, twi, cmr, cmi, cms, crr, cri)
    du = du.astype(jnp.float32) + dy.astype(jnp.float32) * d_ref[0, :, :1]
    du_ref[0, 0] = du.astype(du_ref.dtype)

    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk = _inverse_real_2d(spr, spi, r, m, twr, twi, cmr, cmi, cms,
                              crr, cri)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dd = jnp.sum(spr) / (r * m)
        dd_ref[:] = jnp.full((1, 1, 128), dd, jnp.float32)


def fftconv_fused_bwd_narrow(u, dy, k, D, r: int, m: int, cb: int = 1,
                             interpret: bool = False):
    """(du, dk_time, dD) for fft >= 2^19, recomputing u's transform."""
    del cb
    bsz, c, lp = u.shape
    r2 = r // 2
    assert lp == r2 * m and k.shape == (c, lp)
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_full_kernel_1, r=r, m=m)
    io_spec = pl.BlockSpec((1, 1, r2, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)
    du, dk, dd = pl.pallas_call(
        kernel,
        grid=(c, bsz),
        in_specs=[
            io_spec,
            io_spec,
            pl.BlockSpec((1, r2, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            io_spec,
            pl.BlockSpec((1, r2, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, r2, m), dy.dtype),
            jax.ShapeDtypeStruct((c, r2, m), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, m), _STORE_DTYPE),
            pltpu.VMEM((r, m), _STORE_DTYPE),
            pltpu.VMEM((r, m), jnp.float32),
            pltpu.VMEM((r, m), jnp.float32),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u.reshape(bsz, c, r2, m), dy.reshape(bsz, c, r2, m),
      k.reshape(c, r2, m),
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1, 1), (1, 1, 128)),
      *vals)
    return du.reshape(bsz, c, lp), dk.reshape(c, lp), dd[:, 0, 0]


# ---------------------------------------------------------------------------
# Batch-packed kernels: two real batch rows ride ONE complex transform.
#
# The conv is linear in u and the per-channel filter is shared across batch,
# so ifft(fft(u0 + i*u1) * K) = conv(u0, k) + i*conv(u1, k): forward and
# input-gradient need NO conjugate-symmetry unpacking (real part -> row 0,
# imaginary part -> row 1). The filter gradient needs sum_b Dy_b*conj(U_b)
# of the UNPACKED spectra, but with packed Zd = Dy0 + i*Dy1, Zu = U0 + i*U1:
#
#   P := Zd * conj(Zu) = [Dy0 conj(U0) + Dy1 conj(U1)] + i[cross terms]
#   and (by Hermitian symmetry of real-signal spectra)
#   Dy0 conj(U0) + Dy1 conj(U1) = (P + conj(P^R)) / 2   (R = bin reversal),
#   ifft(conj(P^R)) = conj(ifft(P))  =>  dk = Re(ifft(P)).
#
# The kernel's real-part-only inverse (_inverse_real) IS Re(ifft(.)), so the
# dk/dD tail is identical to the unpacked kernel — the cross terms land in
# the discarded imaginary part. Net at the 32k bench shape: matmul FLOPs
# drop ~1.8x (pass1 3 half-matmuls vs 4, interior 3 vs 6 per 2 rows, last
# pass 3 half vs 4) and twiddle/bin-multiply VPU work halves.
# ---------------------------------------------------------------------------


def _conv_kernel_packed(u_ref, k_ref, d_ref,
                        frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                        fms, cms, frs, crs,
                        y_ref, *out_refs, r: int, m: int, conj: bool,
                        save_spectrum: bool = False):
    """One (channel-block, batch-pair) program: fused causal conv for CB
    channel rows of TWO batch elements via one packed complex transform."""
    if save_spectrum:
        zr_ref, zi_ref, ksr_ref, ksi_ref = out_refs
    else:
        ksr_ref, ksi_ref = out_refs
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = (-ki0) if conj else ki0

    u0 = u_ref[0]
    u1 = u_ref[1]
    zr, zi = _fwd_transform_c(u0, u1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    if save_spectrum:
        zr_ref[0] = zr.astype(zr_ref.dtype)
        zi_ref[0] = zi.astype(zi_ref.dtype)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (zr * kr - zi * ki).reshape(r * cb, m)
    wi = (zr * ki + zi * kr).reshape(r * cb, m)
    y0, y1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                        crr, cri, crs)
    d = d_ref[:, 0][:, None]
    y_ref[0] = (y0.astype(jnp.float32)
                + u0.astype(jnp.float32) * d).astype(y_ref.dtype)
    y_ref[1] = (y1.astype(jnp.float32)
                + u1.astype(jnp.float32) * d).astype(y_ref.dtype)


def fftconv_fused_fwd_packed(u, k, D, r: int, m: int, cb: int,
                             conj_filter: bool = False,
                             interpret: bool = False,
                             save_spectrum: bool = False):
    """Batch-packed fused conv forward. u: (B, C, Lp) with B EVEN; returns
    (B, C, Lp) — or (y, zr, zi) with the PACKED (B//2, r, C, m) spectrum
    when save_spectrum."""
    bsz, c, lp = u.shape
    assert bsz % 2 == 0, bsz
    assert lp == (r // 2) * m and k.shape == (c, lp)
    assert c % cb == 0
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv_kernel_packed, r=r, m=m,
                               conj=conj_filter, save_spectrum=save_spectrum)
    out_specs = [pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bsz, c, lp), u.dtype)]
    if save_spectrum:
        out_specs += [pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((bsz // 2, r, c, m),
                                           _STORE_DTYPE)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=out_specs if save_spectrum else out_specs[0],
        out_shape=out_shape if save_spectrum else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, k, jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)),
      *vals)
    return outs


def _bwd_kernel_packed(u_ref, dy_ref, k_ref, d_ref,
                       frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                       fms, cms, frs, crs,
                       du_ref, pr_ref, pi_ref, dd_ref, ksr_ref, ksi_ref,
                       *, r: int, m: int):
    """Batch-packed fused backward: one packed transform of (u0, u1) and
    (dy0, dy1) each; du via the conjugated filter spectrum (complex-output
    inverse); dk spectrum accumulates P = Zd*conj(Zu) whose real-part
    inverse is the filter gradient (see module comment)."""
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    u0 = u_ref[0]
    u1 = u_ref[1]
    dy0 = dy_ref[0]
    dy1 = dy_ref[1]
    ur, ui = _fwd_transform_c(u0, u1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    dr, di = _fwd_transform_c(dy0, dy1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (dr * kr - di * ki).reshape(r * cb, m)
    wi = (dr * ki + di * kr).reshape(r * cb, m)
    du0, du1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                          crr, cri, crs)
    d = d_ref[:, 0][:, None]
    du_ref[0] = (du0.astype(jnp.float32)
                 + dy0.astype(jnp.float32) * d).astype(du_ref.dtype)
    du_ref[1] = (du1.astype(jnp.float32)
                 + dy1.astype(jnp.float32) * d).astype(du_ref.dtype)

    # P = Zd * conj(Zu), f32 accumulated over the batch-pair grid dim
    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)
    dd = jnp.sum(u0.astype(jnp.float32) * dy0.astype(jnp.float32)
                 + u1.astype(jnp.float32) * dy1.astype(jnp.float32),
                 axis=1, keepdims=True)
    dd = jnp.broadcast_to(dd, (cb, 128))

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi
        dd_ref[:] = dd

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi
        dd_ref[:] = dd_ref[:] + dd


def fftconv_fused_bwd_packed(u, dy, k, D, r: int, m: int, cb: int,
                             interpret: bool = False):
    """(du, dk_spec_r, dk_spec_i, dD) via batch-packed transforms; the
    returned dk spectrum is sum_pairs Zd*conj(Zu) — its REAL-part inverse
    (which the caller's ifft_chain_real already takes) is the filter grad."""
    bsz, c, lp = u.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert c % cb == 0
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_kernel_packed, r=r, m=m)
    du, pr, pi, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), u.dtype),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, pr, pi, dd[:, 0]


def _bwd_spec_kernel_packed(ur_ref, ui_ref, dy_ref, k_ref, d_ref,
                            frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri,
                            fms, cms, frs, crs,
                            du_ref, dk_ref, dd_ref, pr_ref, pi_ref,
                            ksr_ref, ksi_ref, *, r: int, m: int):
    """Batch-packed backward consuming the PACKED u-spectrum saved by the
    forward: one packed dy transform per program; dk = Re(ifft(sum P)) and
    dD = Re(sum_bins P)/N run in-kernel on the last batch program."""
    st = _STORE_DTYPE
    cb = dy_ref.shape[1]
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0

    dy0 = dy_ref[0]
    dy1 = dy_ref[1]
    ur = ur_ref[0].astype(st)
    ui = ui_ref[0].astype(st)
    dr, di = _fwd_transform_c(dy0, dy1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (dr * kr - di * ki).reshape(r * cb, m)
    wi = (dr * ki + di * kr).reshape(r * cb, m)
    du0, du1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                          crr, cri, crs)
    d = d_ref[:, 0][:, None]
    du_ref[0] = (du0.astype(jnp.float32)
                 + dy0.astype(jnp.float32) * d).astype(du_ref.dtype)
    du_ref[1] = (du1.astype(jnp.float32)
                 + dy1.astype(jnp.float32) * d).astype(du_ref.dtype)

    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk_ref[:] = _inverse_real(spr.reshape(r * cb, m),
                                  spi.reshape(r * cb, m), cb, r, m,
                                  twr, twi, cmr, cmi, cms,
                                  crr, cri).astype(dk_ref.dtype)
        dd = jnp.sum(spr, axis=(0, 2), keepdims=False) / (r * m)
        dd_ref[:] = jnp.broadcast_to(dd[:, None], (cb, 128)).astype(jnp.float32)


def fftconv_fused_bwd_spec_packed(ur, ui, dy, k, D, r: int, m: int, cb: int,
                                  interpret: bool = False):
    """(du, dk_time, dD) given the PACKED (B//2, r, C, m) u-spectrum saved
    by fftconv_fused_fwd_packed."""
    bsz, c, lp = dy.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert ur.shape == (bsz // 2, r, c, m), ur.shape
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_spec_kernel_packed, r=r, m=m)
    spec_in = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                           memory_space=pltpu.VMEM)
    du, dk, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            spec_in,
            spec_in,
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((c, lp), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(ur, ui, dy, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dk, dd[:, 0]


# Channel-block size by fft size. cb = 8 everywhere: the Pallas block rule
# needs the second-to-last block dim divisible by 8, so the round-1 cb=4/2
# fallbacks at 2^17/2^18 could never compile on hardware. Measured on v5e
# (2026-08-18, B=2 C=256 value_and_grad): 2^17 at cb=8 needs a 96 MB
# per-kernel VMEM cap (_compiler_params) and runs 11.75 ms vs 26.0 ms on
# the XLA chain — a 2.2x conv win for 64k-context training. 2^18's
# spectrum-saving backward needs 106.7 MB of scoped VMEM at cb=8 — beyond
# what fits alongside block buffers in the 128 MB core — so 2^18 runs the
# SPLIT backward (fftconv_fused_bwd_du + fftconv_fused_dk_from_specs) and
# requires the forward to save u's spectrum.
_CB_BY_N = {1 << 16: 8, 1 << 17: 8, 1 << 18: 8}
_SPLIT_BWD_MIN = 1 << 18


def needs_split_bwd(n: int) -> bool:
    """fft sizes whose backward runs as two kernels (du, then dk from the
    saved u/dy spectra). These sizes are only planned when the forward can
    save u's spectrum (the split has no u-transform path)."""
    return n >= _SPLIT_BWD_MIN and n in _CB_BY_N


# Single-channel plans (one channel per program, pure 2-D math, no
# relayouts — see the narrow section below). Measured on v5e (B=1, C=256,
# value_and_grad via scripts/bench_conv_narrow.py):
#   2^19: fused 45.1 ms vs chain 100.4 ms (2.2x; fwd 19.8 vs 39.7) -> ON
#   2^20: fused 122.4 ms vs chain 126.0 ms train but fwd 49.6 vs 44.0 —
#         the chain's 3-factor FLOP scaling (n*(f1+f2+f3)) catches the
#         2-factor kernel's n*(r+m) there, and remat re-runs the fwd twice
#         per step -> OFF, chain is within 10% of our best fused kernel.
# 2^21 (1M) follows the same FLOP argument one octave further -> OFF.
_CB_BY_N_NARROW = {1 << 19: 1}


# ---------------------------------------------------------------------------
# gated fused conv: y = (conv(u, k) + u*D) * x0 in one kernel
# ---------------------------------------------------------------------------
# The Hyena mixer's post-gate (`hyena.py:441` in the reference: y = v * x[0],
# fused in-kernel by `csrc/fftconv/fftconv_cuda.cu:336-519`) is an extra
# elementwise pass over the step's largest tensors when left to XLA. These
# variants take x0 as one more input stream and write the GATED output.
# MEASURED AND REJECTED on v5e — all three backward strategies lose to the
# composite (see the PALLAS_GATED_FFTCONV note in ops/fftconv.py): on TPU,
# XLA's gate passes already run at HBM bandwidth and fuse with neighbors,
# so the CUDA-style in-kernel gating does not transfer. Kept gated
# (HYENA_GATED_CONV=1) with full parity tests.
#
# One trick unifies the D-term and kills the extra inverse transform's setup:
# the cached filter spectrum stores ks = K + D (a delta at lag 0 has a flat
# spectrum, so adding D to every bin == adding u*D in the time domain):
#   v  = inv(U * ks)                     (forward / gate-gradient recompute)
#   du = inv(dV * conj(ks))              (correlation with k + D*delta
#                                         == corr(dv, k) + dv*D)
# with dv = dy * x0 computed in the prologue and dx0 = dy * v in the epilogue.


def _ks_store(kr0, ki0, d_ref, ksr_ref, ksi_ref):
    """Cache ks = K + D (unconjugated) in the filter-spectrum scratch."""
    ksr_ref[:] = (kr0.astype(jnp.float32)
                  + d_ref[:, 0][None, :, None]).astype(ksr_ref.dtype)
    ksi_ref[:] = ki0


def _conv_kernel_packed_gated(u_ref, x0_ref, k_ref, d_ref,
                              frr, fri, fmr, fmi, twr, twi, cmr, cmi,
                              crr, cri, fms, cms, frs, crs,
                              y_ref, *out_refs, r: int, m: int,
                              save_spectrum: bool = False,
                              save_v: bool = False):
    """Packed forward with the gate fused: y = (conv(u,k) + u*D) * x0.
    u is in VMEM here, so the D term adds exactly in the time domain
    (plain K cached); only the v-recompute backward uses the ks = K + D
    trick. save_v additionally writes the UNGATED conv output v, which the
    measured-default backward consumes for dx0 = dy * v with zero extra
    transforms (the v-recompute backward's in-kernel inverse costs more
    MXU time than the saved HBM pass: 8.21 vs 6.45 ms/conv-train at the
    32k bench slice)."""
    refs = list(out_refs)
    v_ref = refs.pop(0) if save_v else None
    if save_spectrum:
        zr_ref, zi_ref, ksr_ref, ksi_ref = refs
    else:
        ksr_ref, ksi_ref = refs
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    u0 = u_ref[0]
    u1 = u_ref[1]
    zr, zi = _fwd_transform_c(u0, u1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    if save_spectrum:
        zr_ref[0] = zr.astype(zr_ref.dtype)
        zi_ref[0] = zi.astype(zi_ref.dtype)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (zr * kr - zi * ki).reshape(r * cb, m)
    wi = (zr * ki + zi * kr).reshape(r * cb, m)
    y0, y1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                        crr, cri, crs)
    d = d_ref[:, 0][:, None]
    v0 = y0.astype(jnp.float32) + u0.astype(jnp.float32) * d
    v1 = y1.astype(jnp.float32) + u1.astype(jnp.float32) * d
    if save_v:
        v_ref[0] = v0.astype(v_ref.dtype)
        v_ref[1] = v1.astype(v_ref.dtype)
    y_ref[0] = (v0 * x0_ref[0].astype(jnp.float32)).astype(y_ref.dtype)
    y_ref[1] = (v1 * x0_ref[1].astype(jnp.float32)).astype(y_ref.dtype)


def fftconv_fused_fwd_packed_gated(u, x0, k, D, r: int, m: int, cb: int,
                                   interpret: bool = False,
                                   save_spectrum: bool = False,
                                   save_v: bool = False):
    """Gated packed fused conv forward: (B, C, Lp) x0-gated output, plus
    the ungated conv output v when save_v, plus u's packed spectrum when
    save_spectrum. Output order: y[, v][, ur, ui]."""
    bsz, c, lp = u.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert x0.shape == u.shape
    assert c % cb == 0
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv_kernel_packed_gated, r=r, m=m,
                               save_spectrum=save_spectrum, save_v=save_v)
    row_spec = pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, c, lp), u.dtype)]
    if save_v:
        out_specs += [row_spec]
        out_shape += [jax.ShapeDtypeStruct((bsz, c, lp), u.dtype)]
    if save_spectrum:
        out_specs += [pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((bsz // 2, r, c, m),
                                           _STORE_DTYPE)] * 2
    single = not (save_v or save_spectrum)
    outs = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=out_specs[0] if single else out_specs,
        out_shape=out_shape[0] if single else out_shape,
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, x0, k, jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)),
      *vals)
    return outs


def _bwd_spec_kernel_packed_gated(ur_ref, ui_ref, dy_ref, x0_ref, k_ref,
                                  d_ref,
                                  frr, fri, fmr, fmi, twr, twi, cmr, cmi,
                                  crr, cri, fms, cms, frs, crs,
                                  du_ref, dx0_ref, dk_ref, dd_ref,
                                  pr_ref, pi_ref, ksr_ref, ksi_ref,
                                  *, r: int, m: int):
    """Gated packed backward from the saved u-spectrum:
      dv  = dy * x0                      (prologue, VPU)
      du  = inv(dV * conj(ks))           (one packed transform + inverse)
      v   = inv(U * ks);  dx0 = dy * v   (one more inverse, zero extra HBM)
      dk  = Re(ifft(sum dV*conj(U)));  dD = Re(sum bins)/N  (last program)
    """
    st = _STORE_DTYPE
    cb = dy_ref.shape[1]
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        _ks_store(kr0, ki0, d_ref, ksr_ref, ksi_ref)

    dy0 = dy_ref[0]
    dy1 = dy_ref[1]
    x00 = x0_ref[0]
    x01 = x0_ref[1]
    ur = ur_ref[0].astype(st)
    ui = ui_ref[0].astype(st)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)

    # gate gradient: v = inv(U * ks) (conv + u*D in one inverse)
    vr = (ur * kr - ui * ki).reshape(r * cb, m)
    vi = (ur * ki + ui * kr).reshape(r * cb, m)
    v0, v1 = _inverse_c(vr, vi, cb, r, m, twr, twi, cmr, cmi, cms,
                        crr, cri, crs)
    dx0_ref[0] = (v0.astype(jnp.float32)
                  * dy0.astype(jnp.float32)).astype(dx0_ref.dtype)
    dx0_ref[1] = (v1.astype(jnp.float32)
                  * dy1.astype(jnp.float32)).astype(dx0_ref.dtype)

    # conv gradient stream: dv = dy * x0
    dv0 = (dy0.astype(jnp.float32) * x00.astype(jnp.float32)).astype(st)
    dv1 = (dy1.astype(jnp.float32) * x01.astype(jnp.float32)).astype(st)
    dr, di = _fwd_transform_c(dv0, dv1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)

    # du = inv(dV * conj(ks)) — corr(dv, k) + dv*D via the ks trick
    wr = (dr * kr + di * ki).reshape(r * cb, m)
    wi = (di * kr - dr * ki).reshape(r * cb, m)
    du0, du1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                          crr, cri, crs)
    du_ref[0] = du0.astype(du_ref.dtype)
    du_ref[1] = du1.astype(du_ref.dtype)

    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk_ref[:] = _inverse_real(spr.reshape(r * cb, m),
                                  spi.reshape(r * cb, m), cb, r, m,
                                  twr, twi, cmr, cmi, cms,
                                  crr, cri).astype(dk_ref.dtype)
        dd = jnp.sum(spr, axis=(0, 2), keepdims=False) / (r * m)
        dd_ref[:] = jnp.broadcast_to(dd[:, None], (cb, 128)).astype(jnp.float32)


def fftconv_fused_bwd_spec_packed_gated(ur, ui, dy, x0, k, D,
                                        r: int, m: int, cb: int,
                                        interpret: bool = False):
    """(du, dx0, dk_time, dD) given the PACKED u-spectrum saved by
    fftconv_fused_fwd_packed_gated."""
    bsz, c, lp = dy.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert ur.shape == (bsz // 2, r, c, m), ur.shape
    assert x0.shape == dy.shape
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_spec_kernel_packed_gated, r=r, m=m)
    spec_in = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                            memory_space=pltpu.VMEM)
    du, dx0, dk, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            spec_in,
            spec_in,
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((c, lp), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(ur, ui, dy, x0, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dx0, dk, dd[:, 0]


def _bwd_specv_kernel_packed_gated(ur_ref, ui_ref, v_ref, dy_ref, x0_ref,
                                   k_ref, d_ref,
                                   frr, fri, fmr, fmi, twr, twi, cmr, cmi,
                                   crr, cri, fms, cms, frs, crs,
                                   du_ref, dx0_ref, dk_ref, dd_ref,
                                   pr_ref, pi_ref, ksr_ref, ksi_ref,
                                   *, r: int, m: int):
    """Gated packed backward from the saved u-spectrum AND saved v: same
    transform count as the ungated spectrum backward (one dv transform,
    one du inverse) — dx0 = dy * v is a VPU multiply on the saved v, and
    both D terms add exactly in the time domain (plain K cached)."""
    st = _STORE_DTYPE
    cb = dy_ref.shape[1]
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    dy0 = dy_ref[0]
    dy1 = dy_ref[1]
    dx0_ref[0] = (v_ref[0].astype(jnp.float32)
                  * dy0.astype(jnp.float32)).astype(dx0_ref.dtype)
    dx0_ref[1] = (v_ref[1].astype(jnp.float32)
                  * dy1.astype(jnp.float32)).astype(dx0_ref.dtype)

    dv0f = dy0.astype(jnp.float32) * x0_ref[0].astype(jnp.float32)
    dv1f = dy1.astype(jnp.float32) * x0_ref[1].astype(jnp.float32)
    dr, di = _fwd_transform_c(dv0f.astype(st), dv1f.astype(st), cb, r, m,
                              frr, fri, frs, fmr, fmi, twr, twi, fms)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (dr * kr + di * ki).reshape(r * cb, m)
    wi = (di * kr - dr * ki).reshape(r * cb, m)
    du0, du1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                          crr, cri, crs)
    d = d_ref[:, 0][:, None]
    du_ref[0] = (du0.astype(jnp.float32) + dv0f * d).astype(du_ref.dtype)
    du_ref[1] = (du1.astype(jnp.float32) + dv1f * d).astype(du_ref.dtype)

    ur = ur_ref[0].astype(st)
    ui = ui_ref[0].astype(st)
    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi

    @pl.when(bi == nb - 1)
    def _():
        spr = pr_ref[:]
        spi = pi_ref[:]
        dk_ref[:] = _inverse_real(spr.reshape(r * cb, m),
                                  spi.reshape(r * cb, m), cb, r, m,
                                  twr, twi, cmr, cmi, cms,
                                  crr, cri).astype(dk_ref.dtype)
        dd = jnp.sum(spr, axis=(0, 2), keepdims=False) / (r * m)
        dd_ref[:] = jnp.broadcast_to(dd[:, None], (cb, 128)).astype(jnp.float32)


def fftconv_fused_bwd_specv_packed_gated(ur, ui, v, dy, x0, k, D,
                                         r: int, m: int, cb: int,
                                         interpret: bool = False):
    """(du, dx0, dk_time, dD) given the saved packed u-spectrum and the
    saved ungated conv output v."""
    bsz, c, lp = dy.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert ur.shape == (bsz // 2, r, c, m), ur.shape
    assert v.shape == dy.shape and x0.shape == dy.shape
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v_.shape, lambda ci, bi, nd=v_.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v_ in vals
    ]
    kernel = functools.partial(_bwd_specv_kernel_packed_gated, r=r, m=m)
    spec_in = pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                            memory_space=pltpu.VMEM)
    du, dx0, dk, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            spec_in,
            spec_in,
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((bsz, c, lp), dy.dtype),
            jax.ShapeDtypeStruct((c, lp), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), jnp.float32),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(ur, ui, v, dy, x0, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dx0, dk, dd[:, 0]


def _bwd_kernel_packed_gated(u_ref, dy_ref, x0_ref, k_ref, d_ref,
                             frr, fri, fmr, fmi, twr, twi, cmr, cmi,
                             crr, cri, fms, cms, frs, crs,
                             du_ref, dx0_ref, pr_ref, pi_ref, dd_ref,
                             ksr_ref, ksi_ref, *, r: int, m: int):
    """Gated packed backward WITHOUT a saved spectrum: re-transforms u
    in-kernel (two packed transforms per program instead of one), so the
    forward never writes the 2T-byte spectrum pair to HBM. u and dv are in
    VMEM here, so both D terms (v's u*D, du's dv*D) add exactly in the
    time domain (plain K cached); dD accumulates directly as sum dv*u."""
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    u0 = u_ref[0]
    u1 = u_ref[1]
    dy0 = dy_ref[0]
    dy1 = dy_ref[1]
    x00 = x0_ref[0]
    x01 = x0_ref[1]
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    d = d_ref[:, 0][:, None]

    ur, ui = _fwd_transform_c(u0, u1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    vr = (ur * kr - ui * ki).reshape(r * cb, m)
    vi = (ur * ki + ui * kr).reshape(r * cb, m)
    v0, v1 = _inverse_c(vr, vi, cb, r, m, twr, twi, cmr, cmi, cms,
                        crr, cri, crs)
    dx0_ref[0] = ((v0.astype(jnp.float32) + u0.astype(jnp.float32) * d)
                  * dy0.astype(jnp.float32)).astype(dx0_ref.dtype)
    dx0_ref[1] = ((v1.astype(jnp.float32) + u1.astype(jnp.float32) * d)
                  * dy1.astype(jnp.float32)).astype(dx0_ref.dtype)

    dv0f = dy0.astype(jnp.float32) * x00.astype(jnp.float32)
    dv1f = dy1.astype(jnp.float32) * x01.astype(jnp.float32)
    dv0 = dv0f.astype(st)
    dv1 = dv1f.astype(st)
    dr, di = _fwd_transform_c(dv0, dv1, cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)

    wr = (dr * kr + di * ki).reshape(r * cb, m)
    wi = (di * kr - dr * ki).reshape(r * cb, m)
    du0, du1 = _inverse_c(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms,
                          crr, cri, crs)
    du_ref[0] = (du0.astype(jnp.float32) + dv0f * d).astype(du_ref.dtype)
    du_ref[1] = (du1.astype(jnp.float32) + dv1f * d).astype(du_ref.dtype)

    pr = (dr * ur + di * ui).astype(jnp.float32)
    pi = (di * ur - dr * ui).astype(jnp.float32)
    dd = jnp.sum(dv0.astype(jnp.float32) * u0.astype(jnp.float32)
                 + dv1.astype(jnp.float32) * u1.astype(jnp.float32),
                 axis=1, keepdims=True)
    dd = jnp.broadcast_to(dd, (cb, 128))

    @pl.when(bi == 0)
    def _():
        pr_ref[:] = pr
        pi_ref[:] = pi
        dd_ref[:] = dd

    @pl.when(bi != 0)
    def _():
        pr_ref[:] = pr_ref[:] + pr
        pi_ref[:] = pi_ref[:] + pi
        dd_ref[:] = dd_ref[:] + dd


def fftconv_fused_bwd_packed_gated(u, dy, x0, k, D, r: int, m: int, cb: int,
                                   interpret: bool = False):
    """(du, dx0, dk_spec_r, dk_spec_i, dD) with u re-transformed in-kernel;
    the caller inverts the dk spectrum (ifft_chain_real) as in the ungated
    full backward."""
    bsz, c, lp = u.shape
    assert bsz % 2 == 0 and lp == (r // 2) * m and k.shape == (c, lp)
    assert x0.shape == u.shape and dy.shape == u.shape
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd_kernel_packed_gated, r=r, m=m)
    row_spec = pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                            memory_space=pltpu.VMEM)
    du, dx0, pr, pi, dd = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz // 2),
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cb, m), lambda ci, bi: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, lp), u.dtype),
            jax.ShapeDtypeStruct((bsz, c, lp), u.dtype),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((r, c, m), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            pltpu.VMEM((r, cb, m), _STORE_DTYPE),
        ],
        compiler_params=_compiler_params(r * m),
        interpret=interpret,
    )(u, dy, x0, k,
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1), (1, 128)), *vals)
    return du, dx0, pr, pi, dd[:, 0]


def plan(n: int, c: int, seqlen: int, chain):
    """(r, m, cb) if the fused kernel supports this conv, else None.
    cb < 8 marks a narrow plan (4-D-block kernels, balanced 2-factor)."""
    cb = _CB_BY_N.get(n)
    if cb is not None:
        if len(chain) != 2:
            return None
        r, m = chain
        if r * m != n or r % 2:
            return None
        if c % cb or seqlen > (r // 2) * m:
            # cb < 8 violates the Pallas (8, 128) block rule on the
            # (1, cb, Lp) blocks; channel counts not divisible by 8 fall back
            return None
        return r, m, cb
    cb = _CB_BY_N_NARROW.get(n)
    if cb is None or c % cb:
        return None
    lg = n.bit_length() - 1
    r = 1 << ((lg + 1) // 2)  # balanced 2-factor; r even
    m = n // r
    if seqlen > (r // 2) * m:
        return None
    return r, m, cb
