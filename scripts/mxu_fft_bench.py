import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from hyena_dna_tpu.ops.fftconv import fftconv, fftconv_mxu, fftconv_chunked

def bench(name, f, *args, iters=10):
    out = f(*args); float(out)  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(out)  # hard sync
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt

for (B, C, L) in ((4, 256, 32768), (1, 256, 131072)):
    u = jnp.ones((B, C, L), jnp.bfloat16)
    k = jnp.ones((C, L), jnp.float32) * 1e-3
    D = jnp.ones((C,), jnp.float32)
    f_fft = jax.jit(lambda u, k, D: fftconv(u, k, D, False).astype(jnp.float32).sum())
    f_mxu = jax.jit(lambda u, k, D: fftconv_mxu(u, k, D, False).astype(jnp.float32).sum())
    print(f"--- B={B} C={C} L={L}", flush=True)
    bench("xla_fft", f_fft, u, k, D)
    bench("mxu_fft", f_mxu, u, k, D)
print("DONE", flush=True)
