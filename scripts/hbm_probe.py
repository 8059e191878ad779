"""Raw achievable HBM bandwidth + MXU rate on this chip.

Self-carry timing: each scan iteration feeds its output back as input, so
traffic per iter is exactly read(size) + write(size); no hidden copies.
"""
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

REPS = 50


def rate(name, f, x, nbytes=None, flops=None):
    @jax.jit
    def loop(x):
        def body(c, _):
            return f(c), jnp.ravel(c)[0].astype(jnp.float32)

        c, acc = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(acc) + jnp.ravel(c)[0].astype(jnp.float32)

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    msg = f"{name:28s} {dt*1e3:8.3f} ms"
    if nbytes:
        msg += f"  {nbytes/dt/1e9:7.0f} GB/s"
    if flops:
        msg += f"  {flops/dt/1e12:7.1f} TFLOP/s"
    print(msg, flush=True)


for nm, shape, d in [
    ("add1 bf16 (4,256,32768)", (4, 256, 32768), jnp.bfloat16),
    ("add1 bf16 flat 64M", (64 * 1024 * 1024,), jnp.bfloat16),
    ("add1 f32 flat 64M", (64 * 1024 * 1024,), jnp.float32),
    ("add1 bf16 (2048,32768)", (2048, 32768), jnp.bfloat16),
    ("add1 bf16 flat 512M", (512 * 1024 * 1024,), jnp.bfloat16),
]:
    x = jnp.ones(shape, d)
    nbytes = 2 * x.size * x.dtype.itemsize
    rate(nm, lambda c: c + jnp.asarray(1, d), x, nbytes=nbytes)

# MXU: (4096, 4096) @ (4096, 4096) bf16 self-carry
a = jnp.ones((4096, 4096), jnp.bfloat16)
rate("matmul 4096^3 bf16", lambda c: (c @ a) * jnp.bfloat16(1e-3), a,
     flops=2 * 4096 ** 3)
a8 = jnp.ones((8192, 8192), jnp.bfloat16)
rate("matmul 8192^3 bf16", lambda c: (c @ a8) * jnp.bfloat16(1e-4), a8,
     flops=2 * 8192 ** 3)
