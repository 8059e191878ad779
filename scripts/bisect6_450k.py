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
stage = sys.argv[1] if len(sys.argv) > 1 else "combo_args"

params = dict(
    W=jnp.ones((d, 3*d), jnp.bfloat16) * 0.01,
    Wo=jnp.ones((d, d), jnp.bfloat16) * 0.01,
    wc=jnp.ones((3*d, 3), jnp.bfloat16),
    bc=jnp.zeros((3*d,), jnp.bfloat16),
    m1=jnp.ones((5, 64)), m2=jnp.ones((64, 64)), m3=jnp.ones((64, d)),
    deltas=jnp.linspace(-1.0, -5.0, d)[None, None],
    D=jnp.ones((d,), jnp.float32),
    z=jnp.ones((1, L + 2, 5), jnp.float32),  # like pos_emb_z with l_max=L+2
)

def combo(p, u):
    proj = jnp.swapaxes(u @ p["W"], -1, -2)
    conv = short_conv_1d(proj, p["wc"], p["bc"])
    x0, x1, v = jnp.split(conv, 3, axis=1)
    vx = v * x1
    t = jnp.linspace(0.0, 1.0, L + 2)[None, :L, None]
    z = p["z"][:, :L]
    h = jnp.sin(z @ p["m1"]); h = jnp.sin(h @ p["m2"]); h = h @ p["m3"]
    k = (h * jnp.exp(-t * jnp.abs(p["deltas"])))[0].T
    y = fftconv_chunked(vx, k.astype(jnp.float32), p["D"], False)
    y = (y * x0).astype(jnp.bfloat16)
    return (jnp.swapaxes(y, -1, -2) @ p["Wo"]).astype(jnp.float32).sum()

u = jnp.ones((1, L, d), jnp.bfloat16)
t0 = time.perf_counter()
try:
    out = jax.jit(combo)(params, u)
    jax.block_until_ready(out)
    print(f"{stage}: OK {float(out):.3f} {time.perf_counter()-t0:.0f}s", flush=True)
except Exception as e:
    print(f"{stage}: FAIL after {time.perf_counter()-t0:.0f}s {str(e)[:200]}", flush=True)
print("ALLDONE", flush=True)
