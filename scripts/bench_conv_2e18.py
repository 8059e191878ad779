"""Measure the fused split-backward conv at fft 2^18 (128k context) vs the
XLA chain: value_and_grad of the conv at (B=1, C=256, L=131072).

Numbers to beat (round-2 measurement): XLA chain 31.2 ms/value_and_grad at
this shape; the 2^17 fused conv ran 11.75 ms vs 26.0 ms (B=2).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import importlib

F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
pf = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")

B, C, L = 1, 256, 131072
N = F.next_fast_fft_size(2 * L)
plan = pf.plan(N, C, L, F._nat_chain(N))
print(f"N=2^{N.bit_length()-1} plan={plan} split={pf.needs_split_bwd(N)}")
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, L)) *
                 np.exp(-np.arange(L) / 2048)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = int(os.environ.get("REPS", 10))


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
        lambda *a: jnp.sum(F.fftconv(*a, False).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(u, k, D)
    return grads


which = sys.argv[1:] or ["fused", "chain"]
if "fwd" in which:
    timeit("fused_fwd", lambda u, k, D: F.fftconv(u, k, D, False), u, k, D)
if "fused" in which:
    timeit("fused_train", vag, u, k, D)
if "chain" in which:
    os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = "0"  # split needs spec: off
    old = F.PALLAS_FFTCONV
    F.PALLAS_FFTCONV = False
    timeit("chain_train", vag, u, k, D)
    F.PALLAS_FFTCONV = old
    os.environ.pop("HYENA_PALLAS_SAVE_SPEC_MAX", None)
