"""Microbench the fused Pallas conv's pieces at the 32k bench shape."""
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

from hyena_dna_tpu.ops import pallas_fftconv as pf
from hyena_dna_tpu.ops.fftconv import fftconv, next_fast_fft_size, _nat_chain

B, C, L = 4, 256, 32768
N = next_fast_fft_size(2 * L)
r, m, cb = pf.plan(N, C, L, _nat_chain(N))
print(f"plan r={r} m={m} cb={cb}")
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
up = jnp.pad(u, [(0, 0), (0, 0), (0, (r // 2) * m - L)])
k = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32))
D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
REPS = 20


def timeit(name, f, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = f(*c[:len(args)])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)) for x in leaves)
            eps = s * 1e-30
            return (c[0] + eps.astype(c[0].dtype),) + c[1:], s

        _, acc = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(acc)

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"{name:16s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms", flush=True)


kp = jnp.pad(k, [(0, 0), (0, (r // 2) * m - L)])
timeit("fused_kernel", lambda up, kp: pf.fftconv_fused_fwd(
    up, kp, D, r, m, cb), up, kp)
timeit("dk_spec_kernel", lambda up: pf.fftconv_fused_dk_spec(up, up, r, m, cb), up)
timeit("fftconv_full", lambda u, k, D: fftconv(u, k, D, False), u, k, D)
