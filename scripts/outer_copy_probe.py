"""Why does the outer-conv launch stream at ~84 GB/s? Copy-kernel variants
at the 2^20 shape (B=1, C=256, lp=2^19): consts on/off, block shapes,
channels per program.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

N = 1 << 20
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
    _CONST_KEYS, _consts_outer, _COMPILER_PARAMS, _STORE_DTYPE)

n1, r, m = n3._OUTER_BY_N[N]
h1 = n1 // 2
B, C = 1, 256
lp = h1 * r * m
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, lp)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(C, lp)).astype(np.float32), jnp.bfloat16)
REPS = 5


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
    dtc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / REPS
    gb = 2 * u.size * 2 / dt / 1e9
    print(f"{name:20s} {dt*1e3:8.2f} ms ({gb:5.0f} GB/s u+y; compile {dtc:.0f}s)",
          flush=True)


def copy_4d_consts():
    consts = _consts_outer(n1, r, m)
    vals = [consts[key] for key in _CONST_KEYS]
    const_specs = [
        pl.BlockSpec(v.shape, lambda ci, bi, nd=v.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for v in vals
    ]
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(u_ref, k_ref, *refs):
        y_ref = refs[len(_CONST_KEYS)]
        y_ref[...] = u_ref[...]

    def run(u, k):
        return pl.pallas_call(
            kern, grid=(C, B),
            in_specs=[io_spec,
                      pl.BlockSpec((1, h1 * r, m), lambda ci, bi: (ci, 0, 0),
                                   memory_space=pltpu.VMEM),
                      *const_specs],
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), u.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(u.reshape(B, C, h1 * r, m), k.reshape(C, h1 * r, m), *vals)

    return lambda u, k: run(u, k).reshape(B, C, lp)


def copy_4d_noconsts(nok=False):
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(u_ref, *refs):
        refs[-1][...] = u_ref[...]

    in_specs = [io_spec]
    args = [u.reshape(B, C, h1 * r, m)]
    if not nok:
        in_specs.append(pl.BlockSpec((1, h1 * r, m),
                                     lambda ci, bi: (ci, 0, 0),
                                     memory_space=pltpu.VMEM))

    def run(u, k):
        a = [u.reshape(B, C, h1 * r, m)]
        if not nok:
            a.append(k.reshape(C, h1 * r, m))
        return pl.pallas_call(
            kern, grid=(C, B), in_specs=in_specs,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), u.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(*a)

    return lambda u, k: run(u, k).reshape(B, C, lp)


def copy_2d(cb=1):
    spec = pl.BlockSpec((cb, lp), lambda ci: (ci, 0),
                        memory_space=pltpu.VMEM)

    def kern(u_ref, k_ref, y_ref):
        y_ref[...] = u_ref[...]

    def run(u, k):
        return pl.pallas_call(
            kern, grid=(C // cb,), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((C, lp), u.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(u.reshape(C, lp), k.reshape(C, lp))

    return lambda u, k: run(u, k).reshape(B, C, lp)


WANT = sys.argv[1:] or ["all"]
if "all" in WANT or "base" in WANT:
    timeit("copy4d+consts+k", copy_4d_consts(), u, k)
    timeit("copy4d+k", copy_4d_noconsts(), u, k)
    timeit("copy4d", copy_4d_noconsts(nok=True), u, k)
    timeit("copy2d cb8 +k", copy_2d(8), u, k)


def copy_4d_cb(cb):
    io_spec = pl.BlockSpec((1, cb, h1 * r, m),
                           lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    def run(u, k):
        return pl.pallas_call(
            kern, grid=(C // cb, B), in_specs=[io_spec],
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), u.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(u.reshape(B, C, h1 * r, m))

    return lambda u, k: run(u, k).reshape(B, C, lp)


if "all" in WANT or "cb" in WANT:
    timeit("copy4d cb4", copy_4d_cb(4), u, k)
    timeit("copy4d cb16", copy_4d_cb(16), u, k)
