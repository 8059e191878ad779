import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import metrics as M

L, d, nl = 450048, 256, 8
layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
             l_max=L+2, modulate=True, w=10, use_pallas_front=False)
model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4*d, vocab_size=12,
    pad_vocab_size_multiple=8, residual_in_fp32=True, layer=layer,
    checkpoint_mixer=True, checkpoint_mlp=True, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, L), jnp.int32))["params"]
x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (1, 1))
y = jnp.roll(x, -1, axis=1)

def loss_fn(p, x, y):
    logits, _ = model.apply({"params": p}, x, deterministic=True)
    return M.cross_entropy(logits, y)

stage = sys.argv[1] if len(sys.argv) > 1 else "fwd"
t0 = time.perf_counter()
if stage == "fwd":
    out = jax.jit(loss_fn)(params, x, y)
    print("FWD OK:", float(out), round(time.perf_counter()-t0,1), "s", flush=True)
elif stage == "grad":
    val, g = jax.jit(jax.value_and_grad(loss_fn))(params, x, y)
    jax.block_until_ready(g)
    print("GRAD OK:", float(val), round(time.perf_counter()-t0,1), "s", flush=True)
print("DONE", flush=True)
