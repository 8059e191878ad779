"""Measure the outer-radix fused conv (pallas_fftconv_n3) against the XLA
chain at fft 2^20 / 2^21 — forward and train (fwd + full backward).

Usage: python scripts/bench_conv_outer.py 2e20 [chain] [outer[:n1,r,m]] [train]
       python scripts/bench_conv_outer.py 2e21 chain outer train
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

size = sys.argv[1] if len(sys.argv) > 1 else "2e20"
N = {"2e17": 1 << 17, "2e18": 1 << 18, "2e19": 1 << 19, "2e20": 1 << 20,
     "2e21": 1 << 21}[size]
ensure_tpu_flags(max_seq_len=N // 2)

import importlib

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
n3 = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv_n3")

B, C, L = 1, 256, N // 2
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, L)) *
                 np.exp(-np.arange(L) / 8192)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
dy = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32), jnp.bfloat16)
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
            # perturb EVERY carry operand: a loop-invariant operand lets
            # XLA hoist its whole transform out of the scan (e.g. the
            # chain's dy/k FFTs), which the fused kernels cannot do
            c = tuple(x + eps.astype(x.dtype) for x in c)
            return c, s

        _, acc = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(acc)

    t0 = time.perf_counter()
    val = float(loop(*args))
    print(f"{name:24s} compile+warm {time.perf_counter()-t0:7.1f} s "
          f"(val {val:.3e})", flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def _ref_probe(y):
    """Max-normalized error over two full channels. (Comparing only the
    first few outputs is misleading: early positions are O(1) while the
    channel max is O(sqrt(L)), so bf16 spectrum rounding makes small-
    position absolute error look like O(1) relative error.)"""
    uf = jnp.fft.rfft(u[:, :2].astype(jnp.float32), n=N, axis=-1)
    kf = jnp.fft.rfft(k[:2].astype(jnp.float32), n=N, axis=-1)
    ref = jnp.fft.irfft(uf * kf[None], n=N, axis=-1)[..., :L]
    ref = np.asarray((ref + u[:, :2].astype(jnp.float32) *
                      D[None, :2, None])[0])
    probe = np.asarray(y[0, :2], np.float32)
    return np.abs(probe - ref).max() / (np.abs(ref).max() + 1e-9)


def chain_loss(u, k, D, dy):
    y = F.fftconv(u, k, D, False)
    return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))


for spec in sys.argv[2:] or ["chain", "outer", "train"]:
    if spec == "chain":
        old = n3._OUTER_BY_N.pop(N, None)
        try:
            timeit("chain_fwd",
                   lambda u, k, D: F.fftconv_chunked(u, k, D, False),
                   u, k, D)
        finally:
            if old is not None:
                n3._OUTER_BY_N[N] = old
        continue
    if spec == "chain_train":
        old = n3._OUTER_BY_N.pop(N, None)
        try:
            timeit("chain_train", jax.grad(chain_loss, argnums=(0, 1, 2)),
                   u, k, D, dy)
        finally:
            if old is not None:
                n3._OUTER_BY_N[N] = old
        continue
    if spec == "train":  # routed path: outer kernel via the custom_vjp
        timeit("outer_train", jax.grad(chain_loss, argnums=(0, 1, 2)),
               u, k, D, dy)
        continue
    if spec.startswith("outer"):
        n1, r, m = n3._OUTER_BY_N[N] if ":" not in spec else tuple(
            int(x) for x in spec.split(":")[1].split(","))
        name = f"outer[{n1},{r},{m}]"
        dt = timeit(name + "_fwd",
                    lambda u, k, D: n3.fftconv_outer_fwd(u, k, D, n1, r, m),
                    u, k, D)
        y = n3.fftconv_outer_fwd(u, k, D, n1, r, m)
        print(f"{name:24s} fwd probe rel err {_ref_probe(y):.2e}", flush=True)
        continue
    if spec.startswith("btrain"):
        n1, r, m = n3._OUTER_BY_N[N] if ":" not in spec else tuple(
            int(x) for x in spec.split(":")[1].split(","))
        name = f"outer[{n1},{r},{m}]"
        timeit(name + "_bwd",
               lambda u, k, D, dy: n3.fftconv_outer_bwd(u, dy, k, D,
                                                        n1, r, m),
               u, k, D, dy)
        continue
print("DONE", flush=True)
