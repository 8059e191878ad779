"""Ablation probe: where does the fused packed conv's time go at fft 2^16?

Builds stripped-down variants of the packed kernel (same grid / IO specs)
and times them on-chip so the 32k conv slice can be attributed to stages:

  copy      : stream u -> y only (HBM + grid overhead floor)
  xform     : one packed forward transform, spectrum written (adds pass-1/2
              matmuls + twiddle + the input transpose)
  binmult   : xform + in-kernel filter FFT + bin multiply
  full      : the real kernel (adds inverse transform + output transposes)
  full_save : the real kernel with the spectrum-saving outputs
  notrans   : full with all four (cb, r2, m) <-> (r2, cb, m) transposes
              replaced by flat reshapes — WRONG MATH, measures relayout cost

Usage: python scripts/conv_ablate_2e16.py [dtype] (default bf16; f32 to
match scripts/decompose_32k.py's conv slice input dtype).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hyena_dna_tpu.ops import pallas_fftconv as pf
from hyena_dna_tpu.ops.pallas_fftconv import (
    _CONST_KEYS_PK, _dft_consts, _fwd_transform, _fwd_transform_c,
    _inverse_c, _compiler_params, _STORE_DTYPE)

B, C, L = 4, 256, 32768
r, m, cb = 256, 256, 8
lp = (r // 2) * m
dt = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") else jnp.bfloat16
print(f"B={B} C={C} L={L} r={r} m={m} cb={cb} dtype={dt.__name__}")

rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, lp)).astype(np.float32), dt)
k = jnp.asarray(rng.normal(size=(C, lp)).astype(np.float32), dt)
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = 20


def timeit(name, f, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = f(*c[: len(args)])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)) for x in leaves)
            eps = s * 1e-30
            return (c[0] + eps.astype(c[0].dtype),) + c[1:], s

        _, acc = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(acc)

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"{name:12s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms", flush=True)


def _launch(kernel_fn, spectrum_out: bool):
    """pallas_call with the packed kernel's grid/specs; y or spectrum outs."""
    consts = _dft_consts(r, m, r * m)
    vals = [consts[key] for key in _CONST_KEYS_PK]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    row_spec = pl.BlockSpec((2, cb, lp), lambda ci, bi: (bi, ci, 0),
                            memory_space=pltpu.VMEM)
    if spectrum_out:
        out_specs = [pl.BlockSpec((1, r, cb, m), lambda ci, bi: (bi, 0, ci, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((B // 2, r, C, m), _STORE_DTYPE)] * 2
    else:
        out_specs = row_spec
        out_shape = jax.ShapeDtypeStruct((B, C, lp), dt)

    def run(u, k, D):
        return pl.pallas_call(
            kernel_fn,
            grid=(C // cb, B // 2),
            in_specs=[
                row_spec,
                pl.BlockSpec((cb, lp), lambda ci, bi: (ci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, 128), lambda ci, bi: (ci, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((r, cb, m), _STORE_DTYPE),
                pltpu.VMEM((r, cb, m), _STORE_DTYPE),
            ],
            compiler_params=_compiler_params(r * m),
        )(u, k, jnp.tile(jnp.asarray(D, jnp.float32).reshape(C, 1), (1, 128)),
          *vals)

    return run


def copy_kernel(u_ref, k_ref, d_ref, *refs):
    y_ref = refs[len(_CONST_KEYS_PK)]
    y_ref[0] = u_ref[0]
    y_ref[1] = u_ref[1]


def xform_kernel(u_ref, k_ref, d_ref, *refs):
    nc = len(_CONST_KEYS_PK)
    (frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri, fms, cms, frs,
     crs) = refs[:nc]
    zr_ref, zi_ref = refs[nc], refs[nc + 1]
    zr, zi = _fwd_transform_c(u_ref[0], u_ref[1], cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    zr_ref[0] = zr.astype(zr_ref.dtype)
    zi_ref[0] = zi.astype(zi_ref.dtype)


def binmult_kernel(u_ref, k_ref, d_ref, *refs, ks_scratch=True):
    nc = len(_CONST_KEYS_PK)
    (frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri, fms, cms, frs,
     crs) = refs[:nc]
    zr_ref, zi_ref, ksr_ref, ksi_ref = refs[nc:nc + 4]
    st = _STORE_DTYPE
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    zr, zi = _fwd_transform_c(u_ref[0], u_ref[1], cb, r, m, frr, fri, frs,
                              fmr, fmi, twr, twi, fms)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    zr_ref[0] = (zr * kr - zi * ki).astype(zr_ref.dtype)
    zi_ref[0] = (zr * ki + zi * kr).astype(zi_ref.dtype)


def _fwd_transform_c_notrans(x0, x1, frr, fri, frs, fmr, fmi, twr, twi, fms):
    """WRONG-MATH twin of _fwd_transform_c: flat reshape instead of the
    (cb, r2, m) -> (r2, cb, m) transpose. Same matmul/twiddle cost."""
    st = _STORE_DTYPE
    r2 = r // 2
    xt0 = x0.astype(st).reshape(r2, cb * m)
    xt1 = x1.astype(st).reshape(r2, cb * m)
    t1 = pf._mm(frr[:], xt0)
    t2 = pf._mm(fri[:], xt1)
    t3 = pf._mm(frs[:], xt0 + xt1)
    gr = t1 - t2
    gi = t3 - t1 - t2
    return pf._mid_transform(gr, gi, cb, r, m, twr, twi, fmr, fmi, fms)


def _inverse_c_notrans(wr, wi, twr, twi, cmr, cmi, cms, crr, cri, crs):
    r2 = r // 2
    a, b = pf._inv_common(wr, wi, cb, r, m, twr, twi, cmr, cmi, cms)
    t1 = pf._mm(crr[:], a)
    t2 = pf._mm(cri[:], b)
    t3 = pf._mm(crs[:], a + b)
    y0 = (t1 - t2).reshape(cb, r2 * m)
    y1 = (t3 - t1 - t2).reshape(cb, r2 * m)
    return y0, y1


def notrans_kernel(u_ref, k_ref, d_ref, *refs):
    nc = len(_CONST_KEYS_PK)
    (frr, fri, fmr, fmi, twr, twi, cmr, cmi, crr, cri, fms, cms, frs,
     crs) = refs[:nc]
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    st = _STORE_DTYPE
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kr0, ki0 = _fwd_transform(k_ref[:], cb, r, m,
                                  frr, fri, fmr, fmi, twr, twi, fms)
        ksr_ref[:] = kr0
        ksi_ref[:] = ki0

    u0 = u_ref[0]
    u1 = u_ref[1]
    zr, zi = _fwd_transform_c_notrans(u0, u1, frr, fri, frs,
                                      fmr, fmi, twr, twi, fms)
    kr = ksr_ref[:].astype(st)
    ki = ksi_ref[:].astype(st)
    wr = (zr * kr - zi * ki).reshape(r * cb, m)
    wi = (zr * ki + zi * kr).reshape(r * cb, m)
    y0, y1 = _inverse_c_notrans(wr, wi, twr, twi, cmr, cmi, cms,
                                crr, cri, crs)
    d = d_ref[:, 0][:, None]
    y_ref[0] = (y0.astype(jnp.float32)
                + u0.astype(jnp.float32) * d).astype(y_ref.dtype)
    y_ref[1] = (y1.astype(jnp.float32)
                + u1.astype(jnp.float32) * d).astype(y_ref.dtype)


timeit("copy", _launch(copy_kernel, False), u, k, D)
timeit("xform", _launch(xform_kernel, True), u, k, D)
timeit("binmult", _launch(binmult_kernel, True), u, k, D)
timeit("notrans", _launch(notrans_kernel, False), u, k, D)
timeit("full", lambda u, k, D: pf.fftconv_fused_fwd_packed(
    u, k, D, r, m, cb), u, k, D)
timeit("full_save", lambda u, k, D: pf.fftconv_fused_fwd_packed(
    u, k, D, r, m, cb, save_spectrum=True), u, k, D)
timeit("bwd_spec", lambda u, k, D: pf.fftconv_fused_bwd_spec_packed(
    jnp.zeros((B // 2, r, C, m), _STORE_DTYPE),
    jnp.zeros((B // 2, r, C, m), _STORE_DTYPE),
    u, k, D, r, m, cb), u, k, D)
