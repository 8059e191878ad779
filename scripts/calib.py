import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x + 1.0).sum())
x = jnp.ones((8, 8))
float(f(x))
for i in range(5):
    t0 = time.perf_counter()
    v = float(f(x))
    print(f"trivial jit+readback {i}: {time.perf_counter()-t0:.3f}s", flush=True)
t0 = time.perf_counter()
for i in range(20):
    out = f(x)
jax.block_until_ready(out)
print(f"20 calls block_until_ready: {time.perf_counter()-t0:.3f}s", flush=True)
print("DONE", flush=True)
