"""Round-5 probe: fix the Pallas large-array DMA floor (ROADMAP round-5
pointer, angle a/c).

Round-4 finding: at the 2^20 outer-conv shape (B=1, C=256, lp=2^19 bf16;
268 MB per array) a pure Pallas copy kernel streams the 536 MB round trip
in ~9.6 ms (~56 GB/s) while XLA's fused elementwise does it at ~260 GB/s.
At 32k-sized arrays the same Pallas copy matches XLA. Variants here hunt
the mechanism:

  xla        : jnp elementwise copy baseline (u + 0)
  copy4d     : round-4 grid copy, (1,1,2048,256) blocks  [known ~9.6 ms]
  rows <cr>  : 2-D grid copy over (cr, 1024)-row chunks of the flattened
               array — block bytes = cr*2048; sweeps block size
  sem <p>    : copy4d with explicit dimension_semantics
  vmem <MB>  : copy4d with a different vmem limit
  hbm2hbm <K>: single-program kernel, depth-K chained HBM->HBM DMAs
  manual <K> <MB>: single-program kernel, u/y in HBM, depth-K in-flight
               HBM->VMEM and VMEM->HBM DMAs of <MB>-sized chunks
  sizes      : copy4d at C = 16..256 (67 MB .. 536 MB round trip)

Usage: python scripts/dma_probe.py [variant ...]
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

n1, r, m = 16, 256, 256
h1 = n1 // 2
B, C = 1, 256
lp = h1 * r * m
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, lp)).astype(np.float32), jnp.bfloat16)
REPS = 100

# The axon tunnel adds a fluctuating 15-40 ms PER PROGRAM EXECUTION
# (measured: scan of a trivial body costs the same total at length 1 and
# 1000). Round-4 probes at REPS=5 carried an O/5 = 3-8 ms bias per
# reported number. Here every timing differences out the floor: we time
# an empty-body scan of the same length in the same session and subtract
# its min total, and use REPS=100 so residual floor drift is <0.2 ms.
_EMPTY_MIN = None


def _empty_floor():
    global _EMPTY_MIN
    if _EMPTY_MIN is None:
        x = jnp.ones((8,), jnp.float32)

        @jax.jit
        def loop(a):
            def body(c, _):
                out = c + 1e-9
                return out, jnp.sum(out[:1])
            _, acc = jax.lax.scan(body, a, None, length=REPS)
            return jnp.sum(acc)

        float(loop(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(x))
            ts.append(time.perf_counter() - t0)
        _EMPTY_MIN = min(ts)
        print(f"[exec-floor {_EMPTY_MIN*1e3:.1f} ms/execution]", flush=True)
    return _EMPTY_MIN


def timeit(name, f, *args, nbytes=None):
    """Time f by CHAINING: each iteration's output (same shape as the
    first arg) becomes the next iteration's first arg. No extra carry
    pass, no CSE across iterations, no slice-DCE of the measured op
    (round 4's `c[0] + eps` harness paid a full extra elementwise pass
    per iteration AND let XLA slice-fuse pure-XLA variants down to one
    element — its 'XLA 260 GB/s' was really the carry update)."""
    nbytes = nbytes if nbytes is not None else 2 * args[0].size * 2
    floor = _empty_floor()

    @jax.jit
    def loop(*a):
        def body(x, _):
            out = f(x, *a[1:])
            return out.astype(x.dtype).reshape(x.shape), ()

        xf, _ = jax.lax.scan(body, a[0], None, length=REPS)
        return jnp.sum(jnp.ravel(xf)[:1].astype(jnp.float32))

    t0 = time.perf_counter()
    float(loop(*args))
    dtc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - floor) / REPS
    print(f"{name:24s} {dt*1e3:8.2f} ms ({nbytes/dt/1e9:6.1f} GB/s;"
          f" compile {dtc:.0f}s)", flush=True)


def copy_4d(c=C, vmem_mb=110, sem=None):
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    kw = dict(vmem_limit_bytes=vmem_mb * 1024 * 1024)
    if sem is not None:
        kw["dimension_semantics"] = (sem, sem)

    def run(x):
        return pl.pallas_call(
            kern, grid=(c, B), in_specs=[io_spec], out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, c, h1 * r, m), x.dtype),
            compiler_params=pltpu.CompilerParams(**kw),
        )(x.reshape(B, c, h1 * r, m))

    return run


def copy_rows(cr):
    nr = B * C * lp // 1024
    spec = pl.BlockSpec((cr, 1024), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    def run(x):
        return pl.pallas_call(
            kern, grid=(nr // cr,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nr, 1024), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x.reshape(nr, 1024))

    return run


def hbm2hbm(depth):
    nr = B * C * lp // 1024
    nchunks = depth
    cr = nr // nchunks

    def kern(u_ref, y_ref):
        def body(sems):
            for i in range(nchunks):
                pltpu.make_async_copy(
                    u_ref.at[pl.ds(i * cr, cr), :],
                    y_ref.at[pl.ds(i * cr, cr), :],
                    sems.at[i],
                ).start()
            for i in range(nchunks):
                pltpu.make_async_copy(
                    u_ref.at[pl.ds(i * cr, cr), :],
                    y_ref.at[pl.ds(i * cr, cr), :],
                    sems.at[i],
                ).wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((nchunks,)))

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((nr, 1024), x.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x.reshape(nr, 1024))

    return run


def manual(depth, chunk_mb):
    nr = B * C * lp // 1024
    cr = chunk_mb * 1024 * 1024 // 2048  # rows per chunk (bf16, 1024 lanes)
    nchunks = nr // cr
    assert nr % cr == 0

    def kern(u_ref, y_ref):
        def body(buf, in_sems, out_sems):
            def in_dma(i, slot):
                return pltpu.make_async_copy(
                    u_ref.at[pl.ds(i * cr, cr), :], buf.at[slot],
                    in_sems.at[slot])

            def out_dma(i, slot):
                return pltpu.make_async_copy(
                    buf.at[slot], y_ref.at[pl.ds(i * cr, cr), :],
                    out_sems.at[slot])

            for i in range(min(depth, nchunks)):
                in_dma(i, i % depth).start()

            def step(i, _):
                slot = i % depth
                in_dma(i, slot).wait()
                # previous user of this slot's out DMA must be done before
                # we overwrite; with out started right after in, by the
                # time the i-th in lands the (i-depth)-th out is awaited
                # below before reuse.
                out_dma(i, slot).start()

                @pl.when(i + depth < nchunks)
                def _():
                    # slot reuse: wait for the out DMA that reads buf[slot]
                    out_dma(i, slot).wait()
                    in_dma(i + depth, slot).start()

                @pl.when(i + depth >= nchunks)
                def _():
                    out_dma(i, slot).wait()

                return 0

            jax.lax.fori_loop(0, nchunks, step, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((depth, cr, 1024), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        )

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((nr, 1024), x.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x.reshape(nr, 1024))

    return run


def copy_4d_noresh():
    """copy4d but chained on the PRE-reshaped 4-D array: no in-loop
    relayout. Isolates the pallas grid-copy rate at this block shape."""
    io_spec = pl.BlockSpec((1, 1, h1 * r, m), lambda ci, bi: (bi, ci, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    def run(x4):
        return pl.pallas_call(
            kern, grid=(C, B), in_specs=[io_spec], out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, h1 * r, m), x4.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x4)

    return run


def copy_2d_native(br, bl):
    """Grid copy on the NATIVE (C, lp) layout ((1,C,lp) squeezed, same
    tiling): blocks (br, bl), no reshape anywhere."""
    spec = pl.BlockSpec((br, bl), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[...] = u_ref[...]

    def run(x2):
        return pl.pallas_call(
            kern, grid=(C // br, lp // bl), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((C, lp), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x2)

    return run


def read_only():
    """Grid kernel that READS u blocks but writes only an (8,128) token
    per block: measures the input-DMA stream rate alone."""
    nb_r, nb_l = 16, 16
    br, bl = 256 // nb_r, lp // nb_l
    in_spec = pl.BlockSpec((br, bl), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def kern(u_ref, y_ref):
        y_ref[0, 0] = u_ref[:8, :128]

    def run(x2):
        return pl.pallas_call(
            kern, grid=(nb_r, nb_l), in_specs=[in_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((nb_r, nb_l, 8, 128), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x2)

    # chain: embed the small output's first tile back into a full-size arr
    def f(x2):
        t = run(x2)
        return x2 + t[0, 0, 0, 0]

    return f


def write_only():
    """Grid kernel with an (8,128) input token that writes full blocks:
    measures the output-DMA stream rate alone. (Chained via adding the
    written array's corner back to a small carry is awkward; chain on the
    full output instead with a tiny input derived from the carry.)"""
    nb_r, nb_l = 16, 16
    br, bl = 256 // nb_r, lp // nb_l
    # one real block, constant index_map: fetched once, so input traffic
    # is negligible next to the 268 MB written
    in_spec = pl.BlockSpec((br, bl), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, bl), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    def kern(t_ref, y_ref):
        y_ref[...] = t_ref[...] * jnp.bfloat16(1.001)

    def run(x2):
        return pl.pallas_call(
            kern, grid=(nb_r, nb_l), in_specs=[in_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((256, lp), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x2)

    return run


def manual2(depth, rows):
    """Manual double-buffered copy on the NATIVE (256, lp) layout,
    row-slab chunks (contiguous in HBM), separate in/out semaphores."""
    nchunks = 256 // rows

    def kern(u_ref, y_ref):
        def body(buf, in_sems, out_sems):
            def in_dma(i, slot):
                return pltpu.make_async_copy(
                    u_ref.at[pl.ds(i * rows, rows), :], buf.at[slot],
                    in_sems.at[slot])

            def out_dma(i, slot):
                return pltpu.make_async_copy(
                    buf.at[slot], y_ref.at[pl.ds(i * rows, rows), :],
                    out_sems.at[slot])

            for i in range(min(depth, nchunks)):
                in_dma(i, i % depth).start()

            def step(i, _):
                slot = i % depth
                in_dma(i, slot).wait()
                out_dma(i, slot).start()

                @pl.when(i + depth < nchunks)
                def _():
                    out_dma(i, slot).wait()
                    in_dma(i + depth, slot).start()

                @pl.when(i + depth >= nchunks)
                def _():
                    out_dma(i, slot).wait()

                return 0

            jax.lax.fori_loop(0, nchunks, step, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((depth, rows, lp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        )

    def run(x2):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((256, lp), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x2)

    return run


WANT = sys.argv[1:] or ["xla", "copy4d", "rows", "hbm2hbm", "manual"]
i = 0
while i < len(WANT):
    w = WANT[i]
    if w == "xla":
        # +1e-3: a +0 would be algebraically elided, collapsing the chain
        timeit("xla u+eps", lambda x: x + jnp.bfloat16(1e-3), u)
    elif w == "copy4d":
        timeit("copy4d (1MB blocks)", copy_4d(), u)
    elif w == "rows":
        for cr in (128, 512, 2048, 8192):
            timeit(f"rows cr={cr} ({cr*2048//1024} KB)", copy_rows(cr), u)
    elif w == "sem":
        for s in ("parallel", "arbitrary"):
            timeit(f"copy4d sem={s}", copy_4d(sem=s), u)
    elif w == "vmem":
        for mb in (32, 64, 128):
            timeit(f"copy4d vmem={mb}MB", copy_4d(vmem_mb=mb), u)
    elif w == "hbm2hbm":
        for d in (1, 4, 16, 64):
            timeit(f"hbm2hbm depth={d}", hbm2hbm(d), u)
    elif w == "manual":
        for d, mb in ((2, 1), (4, 1), (4, 4), (8, 2)):
            timeit(f"manual d={d} chunk={mb}MB", manual(d, mb), u)
    elif w == "noresh":
        u4 = u.reshape(B, C, h1 * r, m)
        timeit("copy4d noresh", copy_4d_noresh(), u4)
        u2 = u.reshape(C, lp)
        for br, bl in ((16, 32768), (16, 131072), (64, 32768), (256, 8192)):
            timeit(f"copy2d native ({br},{bl})", copy_2d_native(br, bl), u2)
    elif w == "rw":
        u2 = u.reshape(C, lp)
        timeit("read-only", read_only(), u2, nbytes=u2.size * 2)
        timeit("write-only", write_only(), u2, nbytes=u2.size * 2)
        for d, rows in ((2, 8), (4, 8), (8, 2), (8, 8), (16, 2)):
            timeit(f"manual2 d={d} rows={rows}", manual2(d, rows), u2)
    elif w == "reshonly":
        # cost of the (B,C,lp)<->(B,C,h1*r,m) relayout alone, chained
        def resh(x):
            return (x.reshape(B, C, h1 * r, m) +
                    jnp.bfloat16(1e-3)).reshape(B, C, lp)
        timeit("xla reshape+eps", resh, u)
        def resh2(x):
            y = jax.lax.collapse(x.reshape(B, C, h1 * r, m) +
                                 jnp.bfloat16(1e-3), 2, 4)
            return y
        timeit("xla resh collapse", resh2, u)
    elif w == "sizes":
        for c in (16, 32, 64, 128, 256):
            timeit(f"copy4d C={c}", copy_4d(c=c),
                   u[:, :c], nbytes=2 * 2 * c * lp)
    i += 1
