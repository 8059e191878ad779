"""Measure the single-channel 3-factor fused conv (pallas_fftconv_n3)
against the XLA chain and the 2-factor narrow kernel at fft 2^20 / 2^21.

Usage: python scripts/bench_conv3_narrow.py 2e20 [f1,f2,f3[,strategy]] ...
       python scripts/bench_conv3_narrow.py 2e20 chain n2

Each factor-triple arg compiles + times the fused-3 FORWARD at B=1, C=256,
L = n/2 (the 450k/1M model shape per channel count). "chain" times the XLA
chain forward, "n2" the 2-factor narrow fused forward (if planned).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

size = sys.argv[1] if len(sys.argv) > 1 else "2e20"
N = {"2e19": 1 << 19, "2e20": 1 << 20, "2e21": 1 << 21}[size]
ensure_tpu_flags(max_seq_len=N // 2)

import importlib

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
pf = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")
n3 = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv_n3")

B, C, L = 1, 256, N // 2
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
    val = float(loop(*args))
    print(f"{name:28s} compile+warm {time.perf_counter()-t0:7.1f} s "
          f"(val {val:.3e})", flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return dt


# reference value on a few outputs for sanity
def _ref_probe():
    uf = jnp.fft.rfft(u[:, :2].astype(jnp.float32), n=N, axis=-1)
    kf = jnp.fft.rfft(k[:2].astype(jnp.float32), n=N, axis=-1)
    y = jnp.fft.irfft(uf * kf[None], n=N, axis=-1)[..., :L]
    y = y + u[:, :2].astype(jnp.float32) * D[None, :2, None]
    return np.asarray(y[0, 0, :4])


for spec in sys.argv[2:] or ["64,128,128"]:
    if spec == "chain":
        old = pf._CB_BY_N_NARROW.pop(N, None)
        try:
            timeit("chain_fwd",
                   lambda u, k, D: F.fftconv_chunked(u, k, D, False), u, k, D)
        finally:
            if old is not None:
                pf._CB_BY_N_NARROW[N] = old
        continue
    if spec == "n2":
        plan = pf.plan(N, C, L, F._nat_chain(N))
        print("n2 plan:", plan)
        if plan is None:
            lg = N.bit_length() - 1
            r = 1 << ((lg + 1) // 2)
            pf._CB_BY_N_NARROW[N] = 1
            plan = pf.plan(N, C, L, F._nat_chain(N))
            print("n2 plan (forced):", plan)
        timeit("n2_fwd",
               lambda u, k, D: F.fftconv_chunked(u, k, D, False), u, k, D)
        continue
    parts = spec.split(",")
    f1, f2, f3 = map(int, parts[:3])
    strat = parts[3] if len(parts) > 3 else "jnp"
    assert f1 * f2 * f3 == N, (f1, f2, f3, N)
    n3._TRANSPOSE = strat
    name = f"fused3[{f1},{f2},{f3};{strat}]"
    try:
        dt = timeit(name, lambda u, k, D: n3.fftconv3n_fwd(
            u, k, D, f1, f2, f3), u, k, D)
        # parity probe vs rfft reference
        y = n3.fftconv3n_fwd(u, k, D, f1, f2, f3)
        probe = np.asarray(y[0, 0, :4], np.float32)
        ref = _ref_probe()
        rel = np.abs(probe - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name:28s} probe rel err {rel:.2e}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:300]}", flush=True)
print("DONE", flush=True)
