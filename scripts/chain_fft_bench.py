"""A/B microbench: MXU conv transform variants on the real chip.

Compares the natural-order tree recursion against the transpose-free
digit-permuted chain (several factor chains) on the two sizes that matter:
n=2^16 (the 32k train step) and n=2^20 (the 450k chunked step).
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import importlib

F = importlib.import_module("hyena_dna_tpu.ops.fftconv")


def bench(name, f, *args, iters=8):
    out = f(*args)
    float(out)  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def conv_fn(fwd, inv, n):
    def f(u, k):
        uf = fwd(u, n)
        kf = fwd(k, n)
        return inv(uf * kf, n).real[..., : u.shape[-1]].astype(jnp.float32).sum()

    return jax.jit(f)


# (rows, L) pairs: 32k bench shape (B*C=1024 rows) and 450k chunk shape
CASES = [
    (1024, 32768, [None, (256, 256), (4, 128, 128), (16, 16, 256), (32, 32, 64)]),
    (96, 524288, [None, (1024, 1024), (4, 64, 64, 64), (64, 128, 128), (32, 32, 32, 32)]),
]

for rows, L, chains in CASES:
    n = F.next_fast_fft_size(2 * L)
    u = jnp.ones((rows, L), jnp.float32)
    k = jnp.ones((rows, L), jnp.float32) * 1e-3
    print(f"--- rows={rows} L={L} n=2^{n.bit_length()-1}", flush=True)
    bench("tree-natural", conv_fn(F.fft_natural_matmul, F.ifft_natural_matmul, n), u, k)
    for ch in chains:
        if ch is None:
            F.CHAIN_OVERRIDE.pop(n, None)
            label = f"chain-dp{F._nat_chain(n)}"
        else:
            F.CHAIN_OVERRIDE[n] = ch
            label = f"chain-{ch}"
        try:
            bench(label, conv_fn(F.fft_chain_matmul, F.ifft_chain_matmul, n), u, k)
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:150]}", flush=True)
        finally:
            F.CHAIN_OVERRIDE.pop(n, None)
print("DONE", flush=True)
