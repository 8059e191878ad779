"""Measure the narrow-cb fused conv (fft >= 2^19) vs the XLA chain.

Usage: python scripts/bench_conv_narrow.py [2e19|2e20] [fwd|fused|chain ...]

Numbers to beat (round-2, XLA chain, C=16, B=1): 2.81 ms/conv-fwd at 2^19,
4.45 ms at 2^20. Model-relevant shape here: B=1, C=256, L = n/2.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import importlib

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
pf = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")

size = sys.argv[1] if len(sys.argv) > 1 else "2e19"
N = {"2e19": 1 << 19, "2e20": 1 << 20}[size]
B, C, L = 1, 256, N // 2
plan = pf.plan(N, C, L, F._nat_chain(N))
print(f"N=2^{N.bit_length()-1} plan={plan}")
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, L)) *
                 np.exp(-np.arange(L) / 8192)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = int(os.environ.get("REPS", 5))


def timeit(name, f, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = f(*c[: len(args)])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))
                    for x in leaves)
            eps = s * 1e-30
            return (c[0] + eps.astype(c[0].dtype),) + c[1:], s

        _, acc = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(acc)

    t0 = time.perf_counter()
    float(loop(*args))
    print(f"{name:18s} compile+warm {time.perf_counter()-t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:18s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def vag(u, k, D):
    loss, grads = jax.value_and_grad(
        lambda *a: jnp.sum(F.fftconv_chunked(*a, False)
                           .astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(u, k, D)
    return grads


which = sys.argv[2:] or ["fwd", "fused", "chain"]
if "fwd" in which:
    timeit("fused_fwd", lambda u, k, D: F.fftconv_chunked(u, k, D, False),
           u, k, D)
if "fused" in which:
    timeit("fused_train", vag, u, k, D)
if "chain" in which:
    old = pf._CB_BY_N_NARROW.pop(N, None)
    try:
        timeit("chain_train", vag, u, k, D)
        timeit("chain_fwd",
               lambda u, k, D: F.fftconv_chunked(u, k, D, False), u, k, D)
    finally:
        if old is not None:
            pf._CB_BY_N_NARROW[N] = old
