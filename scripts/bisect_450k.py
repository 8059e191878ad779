"""Parameterized 450k-context bisection probe (collapses the round-1
bisect{,2..7}_450k.py one-offs).

Each stage compiles+runs one slice of the 450k train step so OOMs/compile
stalls can be bisected to a component:

  python scripts/bisect_450k.py <stage> [fwd|bwd]

stages:
  model   full ConvLMHeadModel loss (default)
  op      one HyenaOperator
  front   fused proj+conv+gate front end (Pallas)
  conv    raw fftconv_chunked on (1, 256, 450048)
  short   short_conv_1d only
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# env overrides: BISECT_L (sequence length), BISECT_RRO=1 (residual-only remat)
L, d, nl = int(os.environ.get("BISECT_L", 450048)), 256, 8
RRO = os.environ.get("BISECT_RRO", "0") == "1"
GROUP = int(os.environ.get("BISECT_GROUP", "1"))
if os.environ.get("BISECT_CHUNK"):
    import hyena_dna_tpu.ops.fftconv as _F  # noqa: E402
    import sys as _sys
    _sys.modules["hyena_dna_tpu.ops.fftconv"].FFTCONV_CHUNK_BUDGET = int(
        os.environ["BISECT_CHUNK"])
stage = sys.argv[1] if len(sys.argv) > 1 else "model"
mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"


def run(name, f, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    print(f"{name} OK: {float(jnp.sum(leaf)):.4g} "
          f"{round(time.perf_counter() - t0, 1)}s", flush=True)


if stage == "model":
    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.tasks import metrics as M

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L + 2, modulate=True, w=10)
    model = ConvLMHeadModel(
        d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
        pad_vocab_size_multiple=8, residual_in_fp32=True, layer=layer,
        checkpoint_mixer=True, checkpoint_mlp=True, remat_residual_only=RRO,
        remat_group_size=GROUP,
        dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, L), jnp.int32))["params"]
    x = jnp.asarray((np.arange(L) % 4 + 7)[None], jnp.int32)
    y = jnp.roll(x, -1, axis=1)

    def loss_fn(p):
        logits, _ = model.apply({"params": p}, x, deterministic=True)
        return M.cross_entropy(logits, y)

    fn = loss_fn if mode == "fwd" else jax.grad(loss_fn)
    run(f"model-{mode}", jax.jit(fn), params)

elif stage == "op":
    from hyena_dna_tpu.models import HyenaOperator

    op = HyenaOperator(d_model=d, l_max=L + 2, filter_order=64,
                       filter_cfg=dict(emb_dim=5, w=10))
    u = jnp.ones((1, L, d), jnp.bfloat16) * 0.01
    params = jax.jit(op.init)(jax.random.PRNGKey(0), u)["params"]

    def f(p):
        return jnp.sum(op.apply({"params": p}, u) ** 2)

    fn = f if mode == "fwd" else jax.grad(f)
    run(f"op-{mode}", jax.jit(fn), params)

elif stage == "front":
    from hyena_dna_tpu.ops.pallas_hyena import fused_proj_conv_gate

    u = jnp.ones((1, L, d), jnp.bfloat16) * 0.01
    w = jnp.ones((d, 3 * d), jnp.float32) * 0.01
    bp = jnp.zeros((3 * d,), jnp.float32)
    wc = jnp.ones((3, 3 * d), jnp.float32) * 0.1
    bc = jnp.zeros((3 * d,), jnp.float32)

    def f(u):
        vx, x0 = fused_proj_conv_gate(u, w, bp, wc, bc)
        return jnp.sum(vx.astype(jnp.float32) ** 2) + jnp.sum(x0.astype(jnp.float32))

    fn = f if mode == "fwd" else jax.grad(f)
    run(f"front-{mode}", jax.jit(fn), u)

elif stage == "conv":
    from hyena_dna_tpu.ops.fftconv import fftconv_chunked

    u = jnp.ones((1, d, L), jnp.bfloat16) * 0.01
    k = jnp.ones((d, L), jnp.float32) * 0.01
    D = jnp.ones((d,), jnp.float32)

    def f(u):
        return jnp.sum(fftconv_chunked(u, k, D).astype(jnp.float32) ** 2)

    fn = f if mode == "fwd" else jax.grad(f)
    run(f"conv-{mode}", jax.jit(fn), u)

elif stage == "short":
    from hyena_dna_tpu.ops.short_conv import short_conv_1d

    u = jnp.ones((1, 3 * d, L), jnp.bfloat16) * 0.01
    w = jnp.ones((3 * d, 3), jnp.float32) * 0.1
    b = jnp.zeros((3 * d,), jnp.float32)

    def f(u):
        return jnp.sum(short_conv_1d(u, w, b).astype(jnp.float32) ** 2)

    fn = f if mode == "fwd" else jax.grad(f)
    run(f"short-{mode}", jax.jit(fn), u)

else:
    raise SystemExit(f"unknown stage {stage}")
