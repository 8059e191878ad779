"""Ablation probe for the outer-radix conv kernel at fft 2^20/2^21.

Where does the forward's ~29.5 ms (2^20, B=1 C=256) go? Variants (same
grid/IO, wrong math where noted):

  copy      : stream u -> y (HBM + grid floor)
  stage1    : stage-1 combos + stage-1 inverse emit only (VPU scaled adds;
              no matmuls, no twiddles) — WRONG MATH
  notwiddle : full pipeline with every twiddle multiply skipped — WRONG
              MATH; full - notwiddle = twiddle VPU cost
  full      : the real kernel

Usage: python scripts/outer_ablate.py [2e20|2e21]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

size = sys.argv[1] if len(sys.argv) > 1 else "2e20"
N = {"2e19": 1 << 19, "2e20": 1 << 20, "2e21": 1 << 21}[size]
ensure_tpu_flags(max_seq_len=N // 2)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import hyena_dna_tpu.ops.pallas_fftconv_n3 as n3
from hyena_dna_tpu.ops.pallas_fftconv_n3 import (
    _CONST_KEYS, _consts_outer, _stage1_coefs, _stage1_block, _read_blocks,
    _stage1_inverse_emit, _kara_l, _kara_r, _mm, _COMPILER_PARAMS,
    _STORE_DTYPE)

n1, r, m = n3._OUTER_BY_N[N]
h1 = n1 // 2
B, C = 1, 256
lp = h1 * r * m
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, lp)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, lp)) *
                 np.exp(-np.arange(lp) / 8192)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = 5
print(f"N=2^{N.bit_length()-1} plan=({n1},{r},{m}) B={B} C={C}")


def timeit(name, f, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = f(*c[: len(args)])
            s = jnp.sum(jnp.ravel(out)[:1].astype(jnp.float32))
            eps = s * 1e-30
            return (c[0] + eps.astype(c[0].dtype),) + c[1:], s

        _, acc = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(acc)

    t0 = time.perf_counter()
    float(loop(*args))
    print(f"{name:12s} compile+warm {time.perf_counter()-t0:6.1f} s", flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"{name:12s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms", flush=True)


def launch(kernel_fn):
    consts = _consts_outer(n1, r, m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def run(u, k, D):
        return pl.pallas_call(
            kernel_fn,
            grid=(C, B),
            in_specs=[
                io_spec,
                pl.BlockSpec((1, h1 * r, m), lambda ci, bi: (ci, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 128), lambda ci, bi: (ci, 0, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), u.dtype),
            scratch_shapes=[
                pltpu.VMEM((n1 * r, m), _STORE_DTYPE),
                pltpu.VMEM((n1 * r, m), _STORE_DTYPE),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=False,
        )(u.reshape(B, C, h1 * r, m), k.reshape(C, h1 * r, m),
          jnp.tile(jnp.asarray(D, jnp.float32).reshape(C, 1, 1), (1, 1, 128)),
          *vals)

    return lambda u, k, D: run(u, k, D).reshape(B, C, lp)


def copy_kernel(u_ref, k_ref, d_ref, *refs, **_):
    y_ref = refs[len(_CONST_KEYS)]
    y_ref[...] = u_ref[...]


def stage1_kernel(u_ref, k_ref, d_ref, *refs):
    """Stage-1 combos + emit only (WRONG MATH: skips sub-FFTs/twiddles)."""
    nc = len(_CONST_KEYS)
    y_ref = refs[nc]
    fwd_c, inv_c = _stage1_coefs(n1)
    ub = _read_blocks(u_ref[0, 0], h1, r)
    ub_f32 = [x.astype(jnp.float32) for x in ub]
    hr_blocks = []
    hi_blocks = []
    for q1 in range(n1):
        gr, gi = _stage1_block(ub_f32, fwd_c, q1)
        hr_blocks.append(gr)
        hi_blocks.append(gi if gi is not None else gr)
    _stage1_inverse_emit(hr_blocks, hi_blocks, inv_c, ub_f32, d_ref,
                         y_ref, h1, r, n1)


def _fwd_block_notw(x_blocks, coefs, q1, C):
    """_fwd_block with both twiddle multiplies skipped (WRONG MATH)."""
    st = _STORE_DTYPE
    gr, gi = _stage1_block(x_blocks, coefs, q1)
    if q1 == 0:
        gr = gr.astype(st)
        ar = _mm(C["frq_r"][:r], gr)
        ai = _mm(C["fri"][:], gr)
    else:
        gr = gr.astype(st)
        gi = (jnp.zeros_like(gr) if gi is None else gi.astype(st))
        ar, ai = _kara_l(C["frq_r"][:r], C["frq_i"][:r], C["frq_s"][:r], gr, gi)
    return _kara_r(ar, ai, C["fmr"], C["fmi"], C["fms"])


def _inv_block_notw(wr, wi, C):
    ar, ai = _kara_r(wr, wi, C["qmr"], C["qmi"], C["qms"])
    return _kara_l(C["qrq_r"][:r], C["qrq_i"][:r], C["qrq_s"][:r], ar, ai)


def notwiddle_kernel(u_ref, k_ref, d_ref, *refs):
    nc = len(_CONST_KEYS)
    Cd = dict(zip(_CONST_KEYS, refs[:nc]))
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    st = _STORE_DTYPE
    fwd_c, inv_c = _stage1_coefs(n1)
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        kb = [x.astype(jnp.float32) for x in _read_blocks(k_ref[0], h1, r)]
        for q1 in range(n1):
            zr, zi = _fwd_block_notw(kb, fwd_c, q1, Cd)
            ksr_ref[q1 * r:(q1 + 1) * r, :] = zr
            ksi_ref[q1 * r:(q1 + 1) * r, :] = zi

    ub = _read_blocks(u_ref[0, 0], h1, r)
    ub_f32 = [x.astype(jnp.float32) for x in ub]
    hr_blocks = []
    hi_blocks = []
    for q1 in range(n1):
        zr, zi = _fwd_block_notw(ub_f32, fwd_c, q1, Cd)
        kr = ksr_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        ki = ksi_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        hr, hi = _inv_block_notw(zr * kr - zi * ki, zr * ki + zi * kr, Cd)
        hr_blocks.append(hr.astype(jnp.float32))
        hi_blocks.append(hi.astype(jnp.float32))
    _stage1_inverse_emit(hr_blocks, hi_blocks, inv_c, ub_f32, d_ref,
                         y_ref, h1, r, n1)


timeit("copy", launch(copy_kernel), u, k, D)
timeit("stage1", launch(stage1_kernel), u, k, D)
timeit("notwiddle", launch(notwiddle_kernel), u, k, D)
timeit("full", lambda u, k, D: n3.fftconv_outer_fwd(u, k, D, n1, r, m),
       u, k, D)
