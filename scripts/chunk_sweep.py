import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from hyena_dna_tpu.ops.fftconv import fftconv_chunked, fftconv

L, C = 450048, 256
u = jnp.ones((1, C, L), jnp.bfloat16)
k = jnp.ones((C, L), jnp.float32) * 1e-3
D = jnp.ones((C,), jnp.float32)
for blk in (32, 64, 128, 256):
    f = jax.jit(lambda u, k, D, b=blk: fftconv_chunked(u, k, D, False, channel_block=b)
                .astype(jnp.float32).sum())
    t0=time.perf_counter(); out = f(u,k,D); jax.block_until_ready(out)
    c = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(3): out = f(u,k,D)
    jax.block_until_ready(out)
    print(f"blk={blk}: {(time.perf_counter()-t0)/3*1e3:.0f} ms (compile {c:.0f}s)", flush=True)
print("DONE", flush=True)
