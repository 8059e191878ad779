"""Round-5 clean ablation of the outer-radix conv kernel (fft 2^20/2^21).

Uses the corrected timing method (see scripts/calibrate.py: chained
dependency, empty-body floor subtracted, REPS high enough to drown the
axon per-execution floor). Variants chain on the PRE-reshaped 4-D array
so no in-loop relayout pollutes the numbers:

  copy      : same launch (consts + k + D + scratch), body streams u->y
  nostage1  : all matmuls + twiddles, stage-1 combos replaced by
              broadcasting block 0 (WRONG MATH)
  notwiddle : full minus the combined-twiddle multiplies (WRONG MATH)
  full      : the real forward kernel
  full3d    : the real public entry (includes the (B,C,lp)<->4-D
              reshape the model pays when layouts differ)

Usage: python scripts/outer_ablate2.py [2e19|2e20|2e21] [reps]
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
    _CONST_KEYS, _consts_outer, _stage1_coefs, _read_blocks,
    _stage1_inverse_emit, _kara_l, _kara_r, _mm, _COMPILER_PARAMS,
    _STORE_DTYPE, _conv_kernel_outer, _fwd_block, _inv_block)

n1, r, m = n3._OUTER_BY_N[N]
h1 = n1 // 2
B, C = 1, 256
lp = h1 * r * m
rng = np.random.default_rng(0)
u4 = jnp.asarray(rng.normal(size=(B, C, h1 * r, m)).astype(np.float32),
                 jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, lp)) *
                 np.exp(-np.arange(lp) / 8192)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
print(f"N=2^{N.bit_length()-1} plan=({n1},{r},{m}) B={B} C={C} reps={REPS}")


def exec_floor():
    x = jnp.ones((8,), jnp.float32)

    @jax.jit
    def loop(a):
        def body(c, _):
            return c + 1e-9, ()
        cf, _ = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(cf[:1])

    float(loop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = exec_floor()
print(f"[exec-floor {FLOOR*1e3:.1f} ms]", flush=True)


def timeit(name, f):
    """f(x4, k2, d) chained on x4. k/D ride as ARGUMENTS — a closed-over
    512 MB array becomes an HLO constant serialized into the remote-
    compile payload, which the axon tunnel uploads at ~kB/s (this is what
    the round-4 'pathological 22-minute compiles' were)."""
    k2 = k.reshape(C, h1 * r, m)
    d3 = jnp.tile(jnp.asarray(D, jnp.float32).reshape(C, 1, 1), (1, 1, 128))

    @jax.jit
    def loop(x0, k2, d3):
        def body(c, _):
            return f(c, k2, d3).astype(c.dtype).reshape(c.shape), ()
        xf, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(jnp.ravel(xf)[:1].astype(jnp.float32))

    t0 = time.perf_counter()
    float(loop(u4, k2, d3))
    dtc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(u4, k2, d3))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - FLOOR) / REPS
    print(f"{name:12s} {dt*1e3:8.2f} ms (compile {dtc:.0f}s)", flush=True)
    return dt


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

    def run(x4, k2, d3):
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
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), x4.dtype),
            scratch_shapes=[
                pltpu.VMEM((n1 * r, m), _STORE_DTYPE),
                pltpu.VMEM((n1 * r, m), _STORE_DTYPE),
            ],
            compiler_params=_COMPILER_PARAMS,
        )(x4, k2, d3, *vals)

    return run


def copy_kernel(u_ref, k_ref, d_ref, *refs, **_):
    y_ref = refs[len(_CONST_KEYS)]
    y_ref[...] = u_ref[...]


def nostage1_kernel(u_ref, k_ref, d_ref, *refs):
    """All matmuls + twiddles; stage-1 combos replaced by block 0."""
    nc = len(_CONST_KEYS)
    Cd = dict(zip(_CONST_KEYS, refs[:nc]))
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    st = _STORE_DTYPE
    bi = pl.program_id(1)

    def fake_fwd(b0, q1):
        sl = slice(q1 * r, (q1 + 1) * r)
        ar, ai = _kara_l(Cd["frq_r"][sl, :], Cd["frq_i"][sl, :],
                         Cd["frq_s"][sl, :], b0, b0)
        twr = Cd["twf_r"][sl, :].astype(st)
        twi = Cd["twf_i"][sl, :].astype(st)
        ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
        return _kara_r(ar, ai, Cd["fmr"], Cd["fmi"], Cd["fms"])

    @pl.when(bi == 0)
    def _():
        kb0 = k_ref[0, 0:r, :].astype(st)
        for q1 in range(h1 + 1):
            zr, zi = fake_fwd(kb0, q1)
            ksr_ref[q1 * r:(q1 + 1) * r, :] = zr
            ksi_ref[q1 * r:(q1 + 1) * r, :] = zi

    ub0 = u_ref[0, 0, 0:r, :].astype(st)
    acc = None
    for q1 in range(h1 + 1):
        zr, zi = fake_fwd(ub0, q1)
        kr = ksr_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        ki = ksi_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        hr, hi = _inv_block(zr * kr - zi * ki, zr * ki + zi * kr, q1, r, Cd)
        t = hr.astype(jnp.float32)
        acc = t if acc is None else acc + t
    for a1 in range(h1):
        y_ref[0, 0, a1 * r:(a1 + 1) * r, :] = acc.astype(y_ref.dtype)


def notwiddle_kernel(u_ref, k_ref, d_ref, *refs):
    """Full structure minus the combined-twiddle elementwise multiplies."""
    nc = len(_CONST_KEYS)
    Cd = dict(zip(_CONST_KEYS, refs[:nc]))
    y_ref, ksr_ref, ksi_ref = refs[nc], refs[nc + 1], refs[nc + 2]
    st = _STORE_DTYPE
    fwd_c, inv_c = _stage1_coefs(n1)
    bi = pl.program_id(1)

    from hyena_dna_tpu.ops.pallas_fftconv_n3 import _stage1_block

    def fwd_notw(x_blocks, q1):
        gr, gi = _stage1_block(x_blocks, fwd_c, q1)
        sl = slice(q1 * r, (q1 + 1) * r)
        gr = gr.astype(st)
        if gi is None:
            ar = _mm(Cd["frq_r"][sl, :], gr)
            ai = _mm(Cd["frq_i"][sl, :], gr)
        else:
            ar, ai = _kara_l(Cd["frq_r"][sl, :], Cd["frq_i"][sl, :],
                             Cd["frq_s"][sl, :], gr, gi.astype(st))
        return _kara_r(ar, ai, Cd["fmr"], Cd["fmi"], Cd["fms"])

    def inv_notw(wr, wi, q1):
        ar, ai = _kara_r(wr, wi, Cd["qmr"], Cd["qmi"], Cd["qms"])
        sl = slice(q1 * r, (q1 + 1) * r)
        return _kara_l(Cd["qrq_r"][sl, :], Cd["qrq_i"][sl, :],
                       Cd["qrq_s"][sl, :], ar, ai)

    @pl.when(bi == 0)
    def _():
        kb = [x.astype(jnp.float32)
              for x in _read_blocks(k_ref[0], h1, r)]
        for q1 in range(h1 + 1):
            zr, zi = fwd_notw(kb, q1)
            ksr_ref[q1 * r:(q1 + 1) * r, :] = zr
            ksi_ref[q1 * r:(q1 + 1) * r, :] = zi

    ub = _read_blocks(u_ref[0, 0], h1, r)
    ub_f32 = [x.astype(jnp.float32) for x in ub]
    hr_blocks = []
    hi_blocks = []
    for q1 in range(h1 + 1):
        zr, zi = fwd_notw(ub_f32, q1)
        kr = ksr_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        ki = ksi_ref[q1 * r:(q1 + 1) * r, :].astype(st)
        hr, hi = inv_notw(zr * kr - zi * ki, zr * ki + zi * kr, q1)
        hr_blocks.append(hr.astype(jnp.float32))
        hi_blocks.append(hi.astype(jnp.float32))
    _stage1_inverse_emit(hr_blocks, hi_blocks, inv_c, ub_f32, d_ref,
                         y_ref, h1, r, h1 + 1)


WANT = sys.argv[3:] if len(sys.argv) > 3 else [
    "copy", "nostage1", "notwiddle", "full", "full3d"]
res = {}
for w in WANT:
    if w == "copy":
        res[w] = timeit("copy", launch(copy_kernel))
    elif w == "nostage1":
        res[w] = timeit("nostage1", launch(nostage1_kernel))
    elif w == "notwiddle":
        res[w] = timeit("notwiddle", launch(notwiddle_kernel))
    elif w == "full":
        kern = functools.partial(_conv_kernel_outer, n1=n1, r=r, m=m)
        res[w] = timeit("full", launch(kern))
    elif w == "full3d":
        def f3(x4, k2, d3):
            y = n3.fftconv_outer_fwd(x4.reshape(B, C, lp),
                                     k2.reshape(C, lp), D, n1, r, m)
            return y.reshape(B, C, h1 * r, m)
        res[w] = timeit("full3d", f3)
    elif w == "e2epad":
        # the real in-model shape: unpadded L in, pad -> kernel -> slice.
        # Measures whether XLA fuses the 4-D relayout into the pad pass.
        Lu = int(lp * 0.858)  # ~450048/2^19 ratio

        def f4(x4, k2, d3):
            u3 = x4.reshape(B, C, lp)[..., :Lu]
            up = jnp.pad(u3, ((0, 0), (0, 0), (0, lp - Lu)))
            y = n3.fftconv_outer_fwd(up, k2.reshape(C, lp), D,
                                     n1, r, m)[..., :Lu]
            return jnp.pad(y, ((0, 0), (0, 0), (0, lp - Lu))).reshape(
                B, C, h1 * r, m)
        res[w] = timeit("e2epad", f4)
if "full" in res and "notwiddle" in res:
    print(f"twiddle cost ~ {(res['full']-res['notwiddle'])*1e3:6.2f} ms")
if "full" in res and "nostage1" in res:
    print(f"stage1 cost  ~ {(res['full']-res['nostage1'])*1e3:6.2f} ms "
          f"(plus small fake-fwd underccount)")
