import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import metrics as M

for L in (56320, 112640, 225280, 450048):
    layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
                 l_max=L+2, modulate=True, w=10, use_pallas_front=False)
    model = ConvLMHeadModel(d_model=256, n_layer=8, d_inner=1024, vocab_size=12,
        pad_vocab_size_multiple=8, residual_in_fp32=True, layer=layer,
        checkpoint_mixer=True, checkpoint_mlp=True, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, L), jnp.int32))["params"]
    x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (1, 1))
    y = jnp.roll(x, -1, axis=1)
    fwd = jax.jit(lambda p, x, y: M.cross_entropy(
        model.apply({"params": p}, x, deterministic=True)[0], y))
    out = fwd(params, x, y); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = fwd(params, x, y)
    jax.block_until_ready(out)
    print(f"L={L}: fwd {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
print("DONE", flush=True)
