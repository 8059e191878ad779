import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, d = 450048, 256
stage = sys.argv[1]

if stage == "op":
    from hyena_dna_tpu.models import HyenaOperator
    op = HyenaOperator(d_model=d, l_max=L+2, filter_order=64,
                       filter_cfg=dict(emb_dim=5, w=10), use_pallas_front=False,
                       dtype=jnp.bfloat16)
    u = jnp.ones((1, L, d), jnp.bfloat16)
    params = op.init(jax.random.PRNGKey(0), u)["params"]
    t0=time.perf_counter()
    out = jax.jit(lambda p, u: op.apply({"params": p}, u).astype(jnp.float32).sum())(params, u)
    print("OP OK:", float(out), round(time.perf_counter()-t0,1), flush=True)
elif stage == "emb":
    from hyena_dna_tpu.models.embeddings import GPT2Embeddings
    from hyena_dna_tpu.tasks import metrics as M
    emb = GPT2Embeddings(embed_dim=d, vocab_size=16, max_position_embeddings=0,
                         dtype=jnp.bfloat16)
    x = jnp.ones((1, L), jnp.int32)
    params = emb.init(jax.random.PRNGKey(0), x)["params"]
    def f(p, x):
        h = emb.apply({"params": p}, x)
        logits = emb.apply({"params": p}, h.astype(jnp.float32), method=lambda m, hh: m.attend(hh))
        return M.cross_entropy(logits, jnp.roll(x, -1, axis=-1))
    t0=time.perf_counter()
    out = jax.jit(f)(params, x)
    print("EMB OK:", float(out), round(time.perf_counter()-t0,1), flush=True)
elif stage == "block":
    from hyena_dna_tpu.models.blocks import Block
    import flax.linen as fnn
    layer = dict(_name_="hyena", emb_dim=5, filter_order=64, short_filter_order=3,
                 l_max=L+2, modulate=True, w=10, use_pallas_front=False)
    blk = fnn.remat(Block, static_argnums=(3,))(
        d_model=d, layer_cfg=layer, d_inner=4*d, residual_in_fp32=True,
        dtype=jnp.bfloat16)
    u = jnp.ones((1, L, d), jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(0), u, None, True)["params"]
    t0=time.perf_counter()
    out = jax.jit(lambda p, u: blk.apply({"params": p}, u, None, True)[0].astype(jnp.float32).sum())(params, u)
    print("BLOCK OK:", float(out), round(time.perf_counter()-t0,1), flush=True)
print("DONE", flush=True)
