"""Pallas TPU kernel: fused 3-pass FFT convolution for long contexts.

STATUS: MEASURED-AND-REJECTED, permanently gated off (PALLAS3_FFTCONV =
False in ops/fftconv.py). On v5e at its target n=2^19 (C=16, B=1) it ran
3.09 ms/conv-fwd vs the XLA chain's 2.81 — Mosaic's middle-pass
(f1,f2,f3)<->(f2,f1,f3) relayouts cost more than the saved HBM round
trips, and compiles took 24 min at 2^19 / OOM-killed at 2^20 (details:
ROADMAP.md round-3 notes). The outer-radix kernel
(ops/pallas_fftconv_n3.py) supersedes it at every size by removing the
relayout from the algorithm instead of lowering it better. Kept as the
parity-tested record of the rejected design.

The 2-pass fused kernel (`ops/pallas_fftconv.py`) covers fft sizes up to
2^18; beyond that a balanced 2-factor chain needs factor matrices past
1024 and the per-point matmul work grows as r/2 + m (~1280 MACs/point at
n=2^19). A 3-factor chain (f1, f2, f3) costs f1/2 + f2 + f3 MACs/point
(192 at 2^19, 320 at 2^20) — measured 25% faster even in XLA at n=2^20
where every pass round-trips the spectrum through HBM
(`scripts/chain_fft_bench.py`). This kernel keeps all three passes in
VMEM, so the long-context conv — the dominant cost of 450k/1M-token
training (65% of the 450k step device time) — pays ONE HBM round trip
per operand instead of ~6 per transform.

OUTCOME (measured on v5e, 2026-08-18): the bandwidth saving does NOT
materialize as a win — at n=2^19 (C=16, B=1) this kernel runs 3.09
ms/conv-fwd vs 2.81 ms for the XLA chain path; Mosaic's lowering of the
middle-pass (f2, f1*cb*f3) relayouts costs more than the saved HBM round
trips, the per-kernel VMEM floor is ~76 MB (needs the 110 MB
CompilerParams override below), compile time is ~24 min, and at
n=2^20/2^21 the Mosaic compile exhausts host memory. Gated off by
default (`ops/fftconv.py PALLAS3_FFTCONV=False`); kept with
interpret-mode parity tests as the record of the experiment.

Math (mirrors `ops/fftconv.py` `_fft_chain_ri` with chain (f1, f2, f3),
n = f1*f2*f3, m = f2*f3, causal zero-padding => time rows a >= f1/2 are
zero):

  forward, input X (CB, Lp) real, Lp = (f1/2)*m:
    view (f1/2, CB*m)                      [digit a major]
    P1: F_f1[:, :f1/2] @ X                 (2 real matmuls)
    TW1: * W_n^{p*t}, t in [m)             (table (f1, m))
    view (f1, CB, f2, f3) -> (f2, f1*CB*f3)
    P2: F_f2 @ .                           (3-matmul Karatsuba)
    TW2: * W_m^{q*c}, c in [f3)            (table (f2, f3))
    P3: view (f2*f1*CB, f3) @ F_f3         (3-matmul Karatsuba)
    spectrum layout: (f2, f1, CB, f3), digit order (q, p, s)

  inverse mirrors it with conjugated/normalized matrices; the real-output
  last pass is 2 matmuls. The layout is internal: the filter spectrum,
  bin multiply, dk accumulation and both inverses all use it, and nothing
  permuted ever leaves the kernel (dk is inverted in-kernel).

Backward (one kernel): du = inv(dy_f * conj(k_f)) + dy*D per batch
program; P = sum_b dy_f * conj(u_f) accumulates in f32 VMEM scratch; the
last batch program computes dk = inv_real(P) in-kernel. dD is a cheap
XLA einsum over u*dy done by the caller (`fftconv3_bwd`).

Replaces the reference's long-context path, which has NO fused kernel at
these sizes (its CUDA fftconv caps at fft_size 16384,
`/root/reference/csrc/fftconv/fftconv.cpp:114`; beyond that it falls back
to eager torch.fft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT_DTYPE = jnp.bfloat16
_STORE_DTYPE = jnp.bfloat16
# the O(n) first-level twiddle table: bf16 halves its VMEM/VPU footprint and
# matches the XLA chain path's MXU_SPECTRUM_DTYPE numerics (tests set f32)
_TW1_DTYPE = jnp.bfloat16
# debug/bench: skip the middle-pass transposes (WRONG math, same op mix) to
# isolate their cost on hardware
_SKIP_TR = False

# Per-kernel VMEM budget override: at n=2^19 the measured scoped working
# set is ~76 MB (Mosaic keeps several full-pencil ri pairs live across the
# three passes) — above the process-global 64 MB scoped budget
# (tpu_flags.py) but comfortably inside the v5e's 128 MB VMEM. Scoping the
# raise to this kernel leaves the tuned 32k-path compilation heuristics
# untouched.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _mm(a, b):
    """(M, K) @ (K, N) -> f32-accumulated product stored as _STORE_DTYPE."""
    return jax.lax.dot_general(
        a.astype(_DOT_DTYPE),
        b.astype(_DOT_DTYPE),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_STORE_DTYPE)


def _kara_l(br, bi, bs, ar, ai):
    """Karatsuba LEFT product (Br + iBi) @ (ar + i ai), B constant with
    precomputed sum Bs = Br + Bi: 3 matmuls."""
    t1 = _mm(br, ar)
    t2 = _mm(bi, ai)
    t3 = _mm(bs, ar + ai)
    return t1 - t2, t3 - t1 - t2


def _kara_r(ar, ai, br, bi, bs):
    """Karatsuba RIGHT product (ar + i ai) @ (Br + iBi)."""
    t1 = _mm(ar, br)
    t2 = _mm(ai, bi)
    t3 = _mm(ar + ai, bs)
    return t1 - t2, t3 - t1 - t2


def _consts3(f1: int, f2: int, f3: int):
    """All constant matrices for the 3-pass transform pair, keyed by name.

    tw1 is the only O(n) table; it is stored bf16 (the MXU rounds dot
    inputs to bf16 and the XLA chain path already uses bf16 twiddles via
    MXU_SPECTRUM_DTYPE, so this matches current numerics)."""
    import numpy as np

    n = f1 * f2 * f3
    m = f2 * f3

    def dft(k):
        a = np.arange(k)
        ang = -2.0 * np.pi / k * (a[:, None] * a[None, :])
        return np.cos(ang), np.sin(ang)

    f1r, f1i = dft(f1)
    f2r, f2i = dft(f2)
    f3r, f3i = dft(f3)
    h = f1 // 2
    t1 = -2.0 * np.pi / n * (np.arange(f1)[:, None] * np.arange(m)[None, :])
    t2 = -2.0 * np.pi / m * (np.arange(f2)[:, None] * np.arange(f3)[None, :])
    c = dict(
        fr_re=f1r[:, :h],            # (f1, f1/2): time rows a >= f1/2 zero
        fr_im=f1i[:, :h],
        cr_re=f1r[:h, :] / f1,       # (f1/2, f1): real-output inverse rows
        cr_im=-f1i[:h, :] / f1,
        f2_re=f2r, f2_im=f2i, f2_s=f2r + f2i,
        c2_re=f2r / f2, c2_im=-f2i / f2, c2_s=(f2r - f2i) / f2,
        f3_re=f3r, f3_im=f3i, f3_s=f3r + f3i,
        c3_re=f3r / f3, c3_im=-f3i / f3, c3_s=(f3r - f3i) / f3,
        tw2_re=np.cos(t2), tw2_im=np.sin(t2),
    )
    out = {k: jnp.asarray(v, jnp.float32) for k, v in c.items()}
    out["tw1_re"] = jnp.asarray(np.cos(t1), _TW1_DTYPE)
    out["tw1_im"] = jnp.asarray(np.sin(t1), _TW1_DTYPE)
    return out


_CONST_KEYS3 = (
    "fr_re", "fr_im", "cr_re", "cr_im",
    "f2_re", "f2_im", "f2_s", "c2_re", "c2_im", "c2_s",
    "f3_re", "f3_im", "f3_s", "c3_re", "c3_im", "c3_s",
    "tw1_re", "tw1_im", "tw2_re", "tw2_im",
)


def _fwd3(x, cb, f1, f2, f3, C):
    """(CB, h, m) real block -> spectrum pair, each (f2, f1*CB*f3)
    [(q, p, cb, s)]; h = f1//2, m = f2*f3."""
    st = _STORE_DTYPE
    h = f1 // 2
    m = f2 * f3
    xt = jnp.transpose(x.astype(st), (1, 0, 2)).reshape(h, cb * m)
    gr = _mm(C["fr_re"][:], xt)  # (f1, cb*m)
    gi = _mm(C["fr_im"][:], xt)
    # TW1: broadcast over cb
    t1r = C["tw1_re"][:].astype(st)[:, None, :]
    t1i = C["tw1_im"][:].astype(st)[:, None, :]
    g3r = gr.reshape(f1, cb, m)
    g3i = gi.reshape(f1, cb, m)
    g3r, g3i = g3r * t1r - g3i * t1i, g3r * t1i + g3i * t1r
    # P2: transpose the f2 digit to the contraction position
    # ((f1*cb, f2, f3) -> (f2, f1*cb, f3): a 3D axis swap, f1/cb stay merged)
    if _SKIP_TR:
        g4r = g3r.reshape(f2, f1 * cb, f3)
        g4i = g3i.reshape(f2, f1 * cb, f3)
    else:
        g4r = jnp.transpose(g3r.reshape(f1 * cb, f2, f3), (1, 0, 2))
        g4i = jnp.transpose(g3i.reshape(f1 * cb, f2, f3), (1, 0, 2))
    hr, hi = _kara_l(C["f2_re"][:], C["f2_im"][:], C["f2_s"][:],
                     g4r.reshape(f2, f1 * cb * f3),
                     g4i.reshape(f2, f1 * cb * f3))
    # TW2: broadcast over (f1*cb)
    t2r = C["tw2_re"][:].astype(st)[:, None, :]
    t2i = C["tw2_im"][:].astype(st)[:, None, :]
    h3r = hr.reshape(f2, f1 * cb, f3)
    h3i = hi.reshape(f2, f1 * cb, f3)
    h3r, h3i = h3r * t2r - h3i * t2i, h3r * t2i + h3i * t2r
    # P3: contract the minor digit with F_f3 (right multiply)
    zr, zi = _kara_r(h3r.reshape(f2 * f1 * cb, f3),
                     h3i.reshape(f2 * f1 * cb, f3),
                     C["f3_re"][:], C["f3_im"][:], C["f3_s"][:])
    return zr.reshape(f2, f1 * cb * f3), zi.reshape(f2, f1 * cb * f3)


def _inv3_real(wr, wi, cb, f1, f2, f3, C):
    """Spectrum-layout product pair -> (CB, Lp) real rows (natural time)."""
    st = _STORE_DTYPE
    h = f1 // 2
    m = f2 * f3
    # P3^-1
    ar, ai = _kara_r(wr.reshape(f2 * f1 * cb, f3),
                     wi.reshape(f2 * f1 * cb, f3),
                     C["c3_re"][:], C["c3_im"][:], C["c3_s"][:])
    # TW2 conj
    t2r = C["tw2_re"][:].astype(st)[:, None, :]
    t2i = C["tw2_im"][:].astype(st)[:, None, :]
    a3r = ar.reshape(f2, f1 * cb, f3)
    a3i = ai.reshape(f2, f1 * cb, f3)
    a3r, a3i = a3r * t2r + a3i * t2i, a3i * t2r - a3r * t2i
    # P2^-1
    br, bi = _kara_l(C["c2_re"][:], C["c2_im"][:], C["c2_s"][:],
                     a3r.reshape(f2, f1 * cb * f3),
                     a3i.reshape(f2, f1 * cb * f3))
    # transpose the f2 digit back: (f2, f1*cb, f3) -> (f1*cb, f2, f3)
    if _SKIP_TR:
        b4r = br.reshape(f1 * cb, f2, f3)
        b4i = bi.reshape(f1 * cb, f2, f3)
    else:
        b4r = jnp.transpose(br.reshape(f2, f1 * cb, f3), (1, 0, 2))
        b4i = jnp.transpose(bi.reshape(f2, f1 * cb, f3), (1, 0, 2))
    # TW1 conj
    t1r = C["tw1_re"][:].astype(st)[:, None, :]
    t1i = C["tw1_im"][:].astype(st)[:, None, :]
    g3r = b4r.reshape(f1, cb, m)
    g3i = b4i.reshape(f1, cb, m)
    g3r, g3i = g3r * t1r + g3i * t1i, g3i * t1r - g3r * t1i
    # P1^-1, real part only
    yr = (_mm(C["cr_re"][:], g3r.reshape(f1, cb * m))
          - _mm(C["cr_im"][:], g3i.reshape(f1, cb * m)))
    return jnp.transpose(yr.reshape(h, cb, m), (1, 0, 2))  # (cb, h, m)


def _conv3_kernel(u_ref, k_ref, d_ref, *refs, f1: int, f2: int, f3: int,
                  conj: bool):
    """One (channel-block, batch) program: full causal conv for CB rows.
    Filter spectrum computed in-kernel at batch 0, scratch-cached.
    Blocks arrive as (.., cb, h, m) 4D views (h = f1/2, m = f2*f3) so the
    minor two dims satisfy the (8, 128) tiling rule at cb < 8; D rides in
    SMEM as per-channel scalars."""
    consts = dict(zip(_CONST_KEYS3, refs[:len(_CONST_KEYS3)]))
    y_ref, ksr_ref, ksi_ref = refs[len(_CONST_KEYS3):]
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    ci = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd3(k_ref[:], cb, f1, f2, f3, consts)
        ksr_ref[:] = kr0
        ksi_ref[:] = (-ki0) if conj else ki0

    u = u_ref[0]  # (CB, h, m)
    zr, zi = _fwd3(u, cb, f1, f2, f3, consts)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = zr * kr - zi * ki
    wi = zr * ki + zi * kr
    y = _inv3_real(wr, wi, cb, f1, f2, f3, consts)  # (cb, h, m)
    for j in range(cb):  # static unroll; cb is 1-2 at these sizes
        dj = d_ref[ci * cb + j]
        y_ref[0, j] = (y[j].astype(jnp.float32)
                       + u[j].astype(jnp.float32) * dj).astype(y_ref.dtype)


def fftconv3_fwd(u, k, D, f1: int, f2: int, f3: int, cb: int,
                 conj_filter: bool = False, interpret: bool = False):
    """Causal conv of u (B, C, Lp) with the (C, Lp) filter k, plus u*D;
    Lp = (f1//2)*f2*f3. Returns (B, C, Lp) in u.dtype."""
    bsz, c, lp = u.shape
    assert lp == (f1 // 2) * f2 * f3, (lp, f1, f2, f3)
    assert k.shape == (c, lp) and c % cb == 0
    consts = _consts3(f1, f2, f3)
    vals = [consts[key] for key in _CONST_KEYS3]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_conv3_kernel, f1=f1, f2=f2, f3=f3,
                               conj=conj_filter)
    h = f1 // 2
    m = f2 * f3
    y4 = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),  # batch innermost: filter/const blocks stay put
        in_specs=[
            pl.BlockSpec((1, cb, h, m), lambda ci, bi: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, h, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((1, cb, h, m), lambda ci, bi: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, m), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((f2, f1 * cb * f3), _STORE_DTYPE),
            pltpu.VMEM((f2, f1 * cb * f3), _STORE_DTYPE),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(u.reshape(bsz, c, h, m), k.reshape(c, h, m),
      jnp.asarray(D, jnp.float32).reshape(c), *vals)
    return y4.reshape(bsz, c, lp)


def _bwd3_kernel(u_ref, dy_ref, k_ref, d_ref, *refs,
                 f1: int, f2: int, f3: int):
    """Fused backward program:
      du = inv(dy_f * conj(k_f)) + dy*D     (per batch program)
      P += dy_f * conj(u_f)                 (f32 scratch accum over batch)
      dk = inv_real(P)                      (last batch program, in-kernel)
    (dD is a cheap XLA reduction over u*dy, done by the caller.)"""
    consts = dict(zip(_CONST_KEYS3, refs[:len(_CONST_KEYS3)]))
    du_ref, dk_ref, pr_ref, pi_ref, ksr_ref, ksi_ref = \
        refs[len(_CONST_KEYS3):]
    st = _STORE_DTYPE
    cb = u_ref.shape[1]
    ci = pl.program_id(0)
    bi = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd3(k_ref[:], cb, f1, f2, f3, consts)
        ksr_ref[:] = kr0
        ksi_ref[:] = -ki0  # conjugated: correlation for the input grad

    u = u_ref[0]
    dy = dy_ref[0]
    ur, ui = _fwd3(u, cb, f1, f2, f3, consts)
    dr, di = _fwd3(dy, cb, f1, f2, f3, consts)

    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    du = _inv3_real(dr * kr - di * ki, dr * ki + di * kr,
                    cb, f1, f2, f3, consts)  # (cb, h, m)
    for j in range(cb):  # static unroll; cb is 1-2 at these sizes
        dj = d_ref[ci * cb + j]
        du_ref[0, j] = (du[j].astype(jnp.float32)
                        + dy[j].astype(jnp.float32) * dj).astype(du_ref.dtype)

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
        dk_ref[:] = _inv3_real(pr_ref[:], pi_ref[:], cb, f1, f2, f3,
                               consts).astype(dk_ref.dtype)


def fftconv3_bwd(u, dy, k, D, f1: int, f2: int, f3: int, cb: int,
                 interpret: bool = False):
    """(du, dk_time, dD) for the no-gelu fused 3-pass conv. The filter
    gradient (spectrum accumulate + inverse) stays in VMEM; dD is a cheap
    XLA contraction (sum_l u*dy per channel)."""
    bsz, c, lp = u.shape
    assert lp == (f1 // 2) * f2 * f3 and k.shape == (c, lp) and c % cb == 0
    consts = _consts3(f1, f2, f3)
    vals = [consts[key] for key in _CONST_KEYS3]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    kernel = functools.partial(_bwd3_kernel, f1=f1, f2=f2, f3=f3)
    h = f1 // 2
    m = f2 * f3
    du4, dk4 = pl.pallas_call(
        kernel,
        grid=(c // cb, bsz),
        in_specs=[
            pl.BlockSpec((1, cb, h, m), lambda ci, bi: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, h, m), lambda ci, bi: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, h, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, cb, h, m), lambda ci, bi: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, h, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h, m), u.dtype),
            jax.ShapeDtypeStruct((c, h, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f2, f1 * cb * f3), jnp.float32),
            pltpu.VMEM((f2, f1 * cb * f3), jnp.float32),
            pltpu.VMEM((f2, f1 * cb * f3), _STORE_DTYPE),
            pltpu.VMEM((f2, f1 * cb * f3), _STORE_DTYPE),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(u.reshape(bsz, c, h, m), dy.reshape(bsz, c, h, m), k.reshape(c, h, m),
      jnp.asarray(D, jnp.float32).reshape(c), *vals)
    dd = jnp.einsum("bcl,bcl->c", u.astype(jnp.float32),
                    dy.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return du4.reshape(bsz, c, lp), dk4.reshape(c, lp), dd


# Factor chains and channel-block sizes by fft size. f3 = 128 is REQUIRED:
# the kernel's views split/merge the minor (lane) axis at f3 boundaries,
# which Mosaic only supports at the native 128-lane width ("unsupported
# shape cast" otherwise). Per-point matmul work is f1/2 + f2 + f3 MACs;
# cb bounds the per-program VMEM working set under the 64 MB scoped
# budget (tpu_flags.py).
_PLAN3_BY_N = {
    1 << 19: ((64, 64, 128), 2),
    1 << 20: ((128, 64, 128), 1),
    1 << 21: ((128, 128, 128), 1),
}


def plan3(n: int, c: int, seqlen: int):
    """((f1, f2, f3), cb) if the 3-pass fused kernel covers this conv."""
    ent = _PLAN3_BY_N.get(n)
    if ent is None:
        return None
    (f1, f2, f3), cb = ent
    while cb > 1 and c % cb:
        cb //= 2
    if c % cb or seqlen > (f1 // 2) * f2 * f3:
        return None
    return (f1, f2, f3), cb
