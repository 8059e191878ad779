import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, d = 450048, 256
stage = sys.argv[1]

from hyena_dna_tpu.models import HyenaOperator
import hyena_dna_tpu.models.filters as filters_mod

if stage == "flatfilter":
    # real operator, but filter() returns a constant bank
    filters_mod.HyenaFilter.filter = lambda self, L_: jnp.ones((1, L_, self.d_model)) * 0.001
elif stage == "lmax_eq":
    pass  # l_max == L exactly (no +2 slicing)

l_max = L if stage == "lmax_eq" else L + 2
op = HyenaOperator(d_model=d, l_max=l_max, filter_order=64,
                   filter_cfg=dict(emb_dim=5, w=10), use_pallas_front=False,
                   dtype=jnp.bfloat16)
u = jnp.ones((1, L, d), jnp.bfloat16)
params = op.init(jax.random.PRNGKey(0), u)["params"]
t0 = time.perf_counter()
try:
    out = jax.jit(lambda p, u: op.apply({"params": p}, u).astype(jnp.float32).sum())(params, u)
    jax.block_until_ready(out)
    print(f"{stage}: OK {float(out):.3f} {time.perf_counter()-t0:.0f}s", flush=True)
except Exception as e:
    print(f"{stage}: FAIL after {time.perf_counter()-t0:.0f}s {str(e)[:200]}", flush=True)
print("ALLDONE", flush=True)
