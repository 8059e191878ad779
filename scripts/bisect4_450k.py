import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from hyena_dna_tpu.ops.short_conv import short_conv_1d
from hyena_dna_tpu.ops.fftconv import fftconv_chunked

L, d = 450048, 256
W = jnp.ones((d, 3*d), jnp.bfloat16) * 0.01
Wo = jnp.ones((d, d), jnp.bfloat16) * 0.01
wc = jnp.ones((3*d, 3), jnp.bfloat16); bc = jnp.zeros((3*d,), jnp.bfloat16)
m1 = jnp.ones((5, 64)); m2 = jnp.ones((64, 64)); m3 = jnp.ones((64, d))
deltas = jnp.linspace(-1.0, -5.0, d)[None, None]
D = jnp.ones((d,), jnp.float32)

def combo(u, z):
    proj = jnp.swapaxes(u @ W, -1, -2)          # (1, 3d, L)
    conv = short_conv_1d(proj, wc, bc)
    x0, x1, v = jnp.split(conv, 3, axis=1)
    vx = (v * x1)
    t = jnp.linspace(0.0, 1.0, L)[None, :, None]
    h = jnp.sin(z @ m1); h = jnp.sin(h @ m2); h = h @ m3
    k = (h * jnp.exp(-t * jnp.abs(deltas)))[0].T  # (d, L)
    y = fftconv_chunked(vx, k.astype(jnp.float32), D, False)
    y = (y * x0).astype(jnp.bfloat16)
    out = jnp.swapaxes(y, -1, -2) @ Wo
    return out.astype(jnp.float32).sum()

u = jnp.ones((1, L, d), jnp.bfloat16)
z = jnp.ones((1, L, 5), jnp.float32)
t0 = time.perf_counter()
try:
    out = jax.jit(combo)(u, z)
    jax.block_until_ready(out)
    print(f"combo: OK {float(out):.3f} {time.perf_counter()-t0:.0f}s", flush=True)
except Exception as e:
    print(f"combo: FAIL after {time.perf_counter()-t0:.0f}s {str(e)[:200]}", flush=True)
print("ALLDONE", flush=True)
