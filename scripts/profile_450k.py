import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import LMTask, metrics as M
from hyena_dna_tpu.train import build_optimizer, create_train_state
from hyena_dna_tpu.train.step import make_train_step

L, d, nl, B = 450048, 256, 8, 1
layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
             l_max=L+2, modulate=True, w=10, use_pallas_front=False,
             inner_remat=False)
model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4*d, vocab_size=12,
    pad_vocab_size_multiple=8, residual_in_fp32=True, layer=layer,
    checkpoint_mixer=True, checkpoint_mlp=True, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.jit(model.init)(rng, jnp.zeros((1, L), jnp.int32))["params"]
x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
y = jnp.roll(x, -1, axis=1)

fwd = jax.jit(lambda p, x, y: M.cross_entropy(
    model.apply({"params": p}, x, deterministic=True)[0], y))
t0=time.perf_counter(); out = fwd(params, x, y); jax.block_until_ready(out)
print(f"fwd compile+1: {time.perf_counter()-t0:.0f}s loss {float(out):.3f}", flush=True)
t0=time.perf_counter()
for _ in range(3): out = fwd(params, x, y)
jax.block_until_ready(out)
print(f"fwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)

vg = jax.jit(lambda p, x, y: jax.value_and_grad(lambda p_: M.cross_entropy(
    model.apply({"params": p_}, x, deterministic=True)[0], y))(p)[0])
t0=time.perf_counter(); out = vg(params, x, y); jax.block_until_ready(out)
print(f"fwd+bwd compile+1: {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter()
for _ in range(3): out = vg(params, x, y)
jax.block_until_ready(out)
print(f"fwd+bwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
print("DONE", flush=True)
