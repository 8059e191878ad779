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

def probe(name, f, *args):
    t0 = time.perf_counter()
    try:
        out = f(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK {float(jnp.asarray(out).reshape(-1)[0]):.3f} "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)

# (a) front: matmul + transpose + short conv + gate
u = jnp.ones((1, L, d), jnp.bfloat16)
W = jnp.ones((d, 3*d), jnp.bfloat16) * 0.01
wc = jnp.ones((3*d, 3), jnp.bfloat16); bc = jnp.zeros((3*d,), jnp.bfloat16)
def front(u):
    proj = jnp.swapaxes(u @ W, -1, -2)
    conv = short_conv_1d(proj, wc, bc)
    x0, x1, v = jnp.split(conv, 3, axis=1)
    return ((v * x1).astype(jnp.float32).sum(), x0.astype(jnp.float32).sum())
probe("front", jax.jit(front), u)

# (b) filter MLP chain at L
z0 = jnp.ones((1, L, 5), jnp.float32)
m1 = jnp.ones((5, 64)); m2 = jnp.ones((64, 64)); m3 = jnp.ones((64, d))
deltas = jnp.linspace(-1.0, -5.0, d)[None, None]
def filt(z):
    t = jnp.linspace(0.0, 1.0, L)[None, :, None]
    h = jnp.sin(z @ m1); h = jnp.sin(h @ m2); h = h @ m3
    h = h * (jnp.exp(-t * jnp.abs(deltas)))
    return h.sum()
probe("filter", jax.jit(filt), z0)

# (c) conv with on-device computed k
uc = jnp.ones((1, d, L), jnp.bfloat16)
D = jnp.ones((d,), jnp.float32)
def convk(uc):
    t = jnp.linspace(0.0, 1.0, L)[None, :]
    k = jnp.sin(jnp.arange(d)[:, None] * t)  # (d, L) computed on device
    return fftconv_chunked(uc, k, D, False).astype(jnp.float32).sum()
probe("conv_computed_k", jax.jit(convk), uc)

print("ALLDONE", flush=True)
