"""Why does a copy-only Pallas kernel stream at ~250 GB/s at the 32k shape?

Times copy variants against XLA's own elementwise pass over the same
arrays, sweeping inputs included, channel-block size, and grid order.
"""
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

B, C, L = 4, 256, 32768
dt = jnp.bfloat16
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32), dt)
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
    dtms = (time.perf_counter() - t0) / REPS * 1e3
    gbps = 2 * u.size * u.dtype.itemsize / (dtms * 1e-3) / 1e9
    print(f"{name:24s} {dtms:8.2f} ms  ({gbps:6.0f} GB/s r+w)", flush=True)


def pallas_copy(cb, swap_grid=False, vmem_mb=None):
    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    if swap_grid:
        grid = (B // 2, C // cb)
        idx = lambda bi, ci: (bi, ci, 0)
    else:
        grid = (C // cb, B // 2)
        idx = lambda ci, bi: (bi, ci, 0)
    spec = pl.BlockSpec((2, cb, L), idx, memory_space=pltpu.VMEM)
    params = {}
    if vmem_mb:
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))

    def run(u):
        return pl.pallas_call(
            kern, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, C, L), dt), **params)(u)

    return run


timeit("xla_eltwise", lambda u: u + jnp.bfloat16(1.0), u)
timeit("copy_cb8", pallas_copy(8), u)
timeit("copy_cb16", pallas_copy(16), u)
timeit("copy_cb32", pallas_copy(32), u)
timeit("copy_cb64", pallas_copy(64), u)
timeit("copy_cb8_swap", pallas_copy(8, swap_grid=True), u)
timeit("copy_cb8_vmem110", pallas_copy(8, vmem_mb=110), u)
timeit("copy_cb16_vmem110", pallas_copy(16, vmem_mb=110), u)


def pallas_copy_allb(cb):
    """Whole-batch program: grid over channel blocks only, linear walk."""
    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    spec = pl.BlockSpec((B, cb, L), lambda ci: (0, ci, 0),
                        memory_space=pltpu.VMEM)

    def run(u):
        return pl.pallas_call(
            kern, grid=(C // cb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, C, L), dt))(u)

    return run


timeit("copy_allb_cb8", pallas_copy_allb(8), u)
timeit("copy_allb_cb16", pallas_copy_allb(16), u)
