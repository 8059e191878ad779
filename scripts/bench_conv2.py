"""Clean-harness bench of the outer-radix conv (fwd and fwd+bwd) at a
given fft size. Chained-dependency timing (see scripts/calibrate.py for
why: the old harness double-counted a fluctuating per-execution tunnel
floor and paid an extra carry pass).

Usage: python scripts/bench_conv2.py [2e17|2e18|2e19|2e20|2e21] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

size = sys.argv[1] if len(sys.argv) > 1 else "2e20"
N = {"2e17": 1 << 17, "2e18": 1 << 18, "2e19": 1 << 19,
     "2e20": 1 << 20, "2e21": 1 << 21}[size]
ensure_tpu_flags(max_seq_len=N // 2)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import hyena_dna_tpu.ops.pallas_fftconv_n3 as n3

n1, r, m = n3._OUTER_BY_N[N]
h1 = n1 // 2
B, C = (1, 256)
lp = h1 * r * m
rng = np.random.default_rng(0)
u4 = jnp.asarray(rng.normal(size=(B, C, h1 * r, m)).astype(np.float32),
                 jnp.bfloat16)
k = jnp.asarray((rng.normal(size=(C, lp)) *
                 np.exp(-np.arange(lp) / 8192)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
print(f"N=2^{N.bit_length()-1} plan=({n1},{r},{m}) B={B} C={C} reps={REPS}",
      flush=True)


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
    """k/D ride as jit ARGUMENTS — closed-over big arrays become HLO
    constants serialized into the remote-compile payload (kB/s upload)."""
    @jax.jit
    def loop(x0, kk, dd):
        def body(c, _):
            return f(c, kk, dd).astype(c.dtype).reshape(c.shape), ()
        xf, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(jnp.ravel(xf)[:1].astype(jnp.float32))

    t0 = time.perf_counter()
    float(loop(u4, k, D))
    dtc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(u4, k, D))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - FLOOR) / REPS
    print(f"{name:12s} {dt*1e3:8.2f} ms (compile {dtc:.0f}s)", flush=True)
    return dt


def fwd(x4, kk, dd):
    y = n3.fftconv_outer_fwd(x4.reshape(B, C, lp), kk, dd, n1, r, m)
    return y.reshape(B, C, h1 * r, m)


def train(x4, kk, dd):
    # fwd + full bwd: chain du back as next input
    u = x4.reshape(B, C, lp)
    y = n3.fftconv_outer_fwd(u, kk, dd, n1, r, m)
    du, dk, dD = n3.fftconv_outer_bwd(u, y, kk, dd, n1, r, m)
    return (du + dk[None, :, :] * 1e-6 + dD[None, :, None] * 1e-6).reshape(
        B, C, h1 * r, m)


WANT = sys.argv[3:] if len(sys.argv) > 3 else ["fwd", "train"]
for w in WANT:
    if w == "fwd":
        timeit("fwd", fwd)
    elif w == "train":
        timeit("fwd+bwd", train)
