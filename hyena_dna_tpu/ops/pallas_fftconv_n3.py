"""Pallas TPU kernel: single-channel 3-factor fused FFT conv (fft 2^20/2^21).

The single-channel 2-factor kernel (`pallas_fftconv.py`, narrow section)
wins 2.2x over the XLA chain at fft 2^19 but only ties it at 2^20: the XLA
chain switches to a 3-factor decomposition there (f1/2+f2+f3 = ~320
MACs/point vs the balanced 2-factor's r/2+m = 1536), so the kernel's VMEM
locality is cancelled by a ~5x MXU FLOP handicap. The cb-blocked 3-pass
kernel (`pallas_fftconv3.py`) showed the fused 3-factor math is correct but
lost to Mosaic's lowering of its (f2, f1*cb*f3) relayouts and its compile
blew up at 2^20+.

This kernel re-does the 3-factor experiment in the single-channel (cb=1)
form that made 2^19 fast: every operand is a plain 2-D (sublane, lane)
array, every view is a free minor-dim split/merge, and the ONE unavoidable
middle transpose (f1, f2, f3) <-> (f2, f1, f3) is isolated and strategy-
switchable (_TRANSPOSE = "jnp" | "loop") so its lowering cost can be
measured directly.

Math (chain (f1, f2, f3), n = f1*f2*f3, m = f2*f3, h = f1/2; causal
zero-padding => time rows a >= h are zero; mirrors
`ops/fftconv.py::_fft_chain_ri`):

  forward, input x (h, m) real:
    P1: F_f1[:, :h] @ x                   -> (f1, m)   [2 real matmuls]
    TW1: * W_n^{p1 s}                     (tables (f1, m) = n elements)
    T:  (f1, f2, f3) -> (f2, f1, f3)      [the relayout]
    P2: F_f2 @ (f2, f1*f3)                [3-matmul Karatsuba]
    TW2: * W_m^{p2 c}  via (f2, f1, f3) * (f2, 1, f3)-bcast... see code
    P3: (f2*f1, f3) @ F_f3                [3-matmul Karatsuba]
    spectrum layout (p2, p1, q3) — internal only: filter spectrum,
    bin-multiply and the inverse all share it.

  inverse mirrors with conjugated/normalized matrices; the real-output
  last pass is 2 matmuls and emits only the first h time rows.

Replaces the reference's long-context conv path, which has no fused kernel
at these sizes (its CUDA fftconv caps at fft_size 16384,
`/root/reference/csrc/fftconv/fftconv.cpp:114-115`; beyond that it runs
eager torch.fft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT_DTYPE = jnp.bfloat16
_STORE_DTYPE = jnp.bfloat16

# middle-transpose lowering strategy: "jnp" = jnp.transpose (Mosaic native
# relayout), "loop" = fori_loop of strided row-slice copies via scratch.
_TRANSPOSE = "jnp"

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=110 * 1024 * 1024)


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(_DOT_DTYPE), b.astype(_DOT_DTYPE),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_STORE_DTYPE)


def _kara_l(br, bi, bs, ar, ai):
    """(B @ A) for complex A (ar, ai), constant complex B; 3 matmuls."""
    t1 = _mm(br[:], ar)
    t2 = _mm(bi[:], ai)
    t3 = _mm(bs[:], ar + ai)
    return t1 - t2, t3 - t1 - t2


def _kara_r(ar, ai, br, bi, bs):
    """(A @ B) for complex A, constant complex B; 3 matmuls."""
    t1 = _mm(ar, br[:])
    t2 = _mm(ai, bi[:])
    t3 = _mm(ar + ai, bs[:])
    return t1 - t2, t3 - t1 - t2


def _consts3(f1: int, f2: int, f3: int):
    import numpy as np

    n = f1 * f2 * f3
    m = f2 * f3
    h = f1 // 2

    def dft(k):
        a = np.arange(k)
        ang = -2.0 * np.pi / k * (a[:, None] * a[None, :])
        return np.cos(ang), np.sin(ang)

    f1r, f1i = dft(f1)
    f2r, f2i = dft(f2)
    f3r, f3i = dft(f3)
    a1 = np.arange(f1)
    s1 = np.arange(m)
    ang1 = -2.0 * np.pi / n * (a1[:, None] * s1[None, :])
    a2 = np.arange(f2)
    s2 = np.arange(f3)
    ang2 = -2.0 * np.pi / m * (a2[:, None] * s2[None, :])
    consts = dict(
        # forward pass matrices
        p1r=f1r[:, :h], p1i=f1i[:, :h],                     # (f1, h)
        p2r=f2r, p2i=f2i, p2s=f2r + f2i,                     # (f2, f2)
        p3r=f3r, p3i=f3i, p3s=f3r + f3i,                     # (f3, f3)
        # twiddles (forward; inverse uses sign flips in-kernel)
        t1r=np.cos(ang1), t1i=np.sin(ang1),                  # (f1, m)
        t2r=np.cos(ang2), t2i=np.sin(ang2),                  # (f2, f3)
        # inverse pass matrices (conjugated, normalized)
        q3r=f3r / f3, q3i=-f3i / f3, q3s=(f3r - f3i) / f3,
        q2r=f2r / f2, q2i=-f2i / f2, q2s=(f2r - f2i) / f2,
        q1r=f1r[:h, :] / f1, q1i=-f1i[:h, :] / f1,           # (h, f1)
    )
    return {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}


_CONST_KEYS3 = ("p1r", "p1i", "p2r", "p2i", "p2s", "p3r", "p3i", "p3s",
                "t1r", "t1i", "t2r", "t2i",
                "q3r", "q3i", "q3s", "q2r", "q2i", "q2s", "q1r", "q1i")


def _swap01(x, d0, d1, d2, ta, tb):
    """(d0, d1, d2) -> (d1, d0, d2) axis swap; ta/tb are (d0*d1, d2) scratch
    refs used by the "loop" strategy (ignored by "jnp")."""
    if _TRANSPOSE == "skip":  # cost probe: WRONG math, same op mix
        return x.reshape(d1 * d0, d2)
    if _TRANSPOSE == "jnp":
        return jnp.transpose(x.reshape(d0, d1, d2), (1, 0, 2)).reshape(
            d1 * d0, d2)
    ta[:] = x.reshape(d0 * d1, d2)
    src = ta  # viewed (d0, d1, d2) via index arithmetic

    def body(j, _):
        # rows (a, j) for a in [d0)  ->  dst rows [j*d0, (j+1)*d0)
        blk = src[:].reshape(d0, d1, d2)[:, j, :]
        tb[pl.ds(j * d0, d0), :] = blk
        return 0

    jax.lax.fori_loop(0, d1, body, 0)
    return tb[:]


def _fwd3(x, f1, f2, f3, C, ta, tb):
    """(h, m) real -> spectrum pair, each (f2*f1, f3), layout (p2, p1, q3)."""
    st = _STORE_DTYPE
    m = f2 * f3
    x = x.astype(st)
    gr = _mm(C["p1r"][:], x)  # (f1, m)
    gi = _mm(C["p1i"][:], x)
    t1r = C["t1r"][:].astype(st)
    t1i = C["t1i"][:].astype(st)
    gr, gi = gr * t1r - gi * t1i, gr * t1i + gi * t1r
    # the middle transpose: (f1, f2, f3) -> (f2, f1, f3)
    gr = _swap01(gr, f1, f2, f3, ta, tb)
    gi = _swap01(gi, f1, f2, f3, ta, tb)
    # P2 over rows (f2, f1*f3)
    hr, hi = _kara_l(C["p2r"], C["p2i"], C["p2s"],
                     gr.reshape(f2, f1 * f3), gi.reshape(f2, f1 * f3))
    # TW2: depends on (p2, c) = (row, minor col digit)
    t2r = C["t2r"][:].astype(st)[:, None, :]  # (f2, 1, f3)
    t2i = C["t2i"][:].astype(st)[:, None, :]
    h3r = hr.reshape(f2, f1, f3)
    h3i = hi.reshape(f2, f1, f3)
    h3r, h3i = h3r * t2r - h3i * t2i, h3r * t2i + h3i * t2r
    # P3 over cols (f2*f1, f3)
    zr, zi = _kara_r(h3r.reshape(f2 * f1, f3), h3i.reshape(f2 * f1, f3),
                     C["p3r"], C["p3i"], C["p3s"])
    return zr, zi


def _inv3_real(wr, wi, f1, f2, f3, C, ta, tb):
    """(f2*f1, f3) product pair -> (h, m) natural-order real output."""
    st = _STORE_DTYPE
    h = f1 // 2
    m = f2 * f3
    ar, ai = _kara_r(wr, wi, C["q3r"], C["q3i"], C["q3s"])
    t2r = C["t2r"][:].astype(st)[:, None, :]
    t2i = C["t2i"][:].astype(st)[:, None, :]
    a3r = ar.reshape(f2, f1, f3)
    a3i = ai.reshape(f2, f1, f3)
    a3r, a3i = a3r * t2r + a3i * t2i, a3i * t2r - a3r * t2i  # conj tw2
    br, bi = _kara_l(C["q2r"], C["q2i"], C["q2s"],
                     a3r.reshape(f2, f1 * f3), a3i.reshape(f2, f1 * f3))
    # transpose back: (f2, f1, f3) -> (f1, f2, f3)
    br = _swap01(br, f2, f1, f3, ta, tb)
    bi = _swap01(bi, f2, f1, f3, ta, tb)
    t1r = C["t1r"][:].astype(st)
    t1i = C["t1i"][:].astype(st)
    br = br.reshape(f1, m)
    bi = bi.reshape(f1, m)
    br, bi = br * t1r + bi * t1i, bi * t1r - br * t1i  # conj tw1
    return _mm(C["q1r"][:], br) - _mm(C["q1i"][:], bi)  # (h, m) real


def _conv3_kernel(u_ref, k_ref, d_ref, *refs,
                  f1: int, f2: int, f3: int, use_scratch_tr: bool):
    nc = len(_CONST_KEYS3)
    consts = dict(zip(_CONST_KEYS3, refs[:nc]))
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    ta = refs[nc + 3] if use_scratch_tr else None
    tb = refs[nc + 4] if use_scratch_tr else None
    st = _STORE_DTYPE
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd3(k_ref[0], f1, f2, f3, consts, ta, tb)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    u = u_ref[0, 0]  # (h, m)
    zr, zi = _fwd3(u, f1, f2, f3, consts, ta, tb)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    y = _inv3_real(zr * kr - zi * ki, zr * ki + zi * kr,
                   f1, f2, f3, consts, ta, tb)
    y = y.astype(jnp.float32) + u.astype(jnp.float32) * d_ref[0, :, :1]
    y_ref[0, 0] = y.astype(y_ref.dtype)


def fftconv3n_fwd(u, k, D, f1: int, f2: int, f3: int,
                  interpret: bool = False):
    """Forward: u (B, C, Lp) -> y (B, C, Lp), Lp = (f1//2)*f2*f3."""
    bsz, c, lp = u.shape
    h = f1 // 2
    m = f2 * f3
    assert lp == h * m and k.shape == (c, lp)
    consts = _consts3(f1, f2, f3)
    vals = [consts[key] for key in _CONST_KEYS3]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    use_tr = _TRANSPOSE == "loop"
    kernel = functools.partial(_conv3_kernel, f1=f1, f2=f2, f3=f3,
                               use_scratch_tr=use_tr)
    io_spec = pl.BlockSpec((1, 1, h, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((f2 * f1, f3), _STORE_DTYPE),
        pltpu.VMEM((f2 * f1, f3), _STORE_DTYPE),
    ]
    if use_tr:
        scratch += [
            pltpu.VMEM((f1 * f2, f3), _STORE_DTYPE),
            pltpu.VMEM((f1 * f2, f3), _STORE_DTYPE),
        ]
    y = pl.pallas_call(
        kernel,
        grid=(c, bsz),
        in_specs=[
            io_spec,
            pl.BlockSpec((1, h, m), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, m), u.dtype),
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(u.reshape(bsz, c, h, m), k.reshape(c, h, m),
      jnp.tile(jnp.asarray(D, jnp.float32).reshape(c, 1, 1), (1, 1, 128)),
      *vals)
    return y.reshape(bsz, c, lp)
