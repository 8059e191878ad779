"""Steady-state per-component timings at the 32k bench shape.

Times each slice of the train step (scanned window + hard readback sync,
same methodology as bench.py) so perf work targets the real bottleneck:

  python scripts/decompose_32k.py [component ...]

components (default: all):
  conv_fwd conv_train front_fwd front_train mlp_train model_fwd model_train
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import os
L, d, nl, B = 32768, 256, 8, int(os.environ.get('DEC_B', 4))
REPS = 20
# residual-stream dtype under test (DEC_RESID=f32|bf16, default bf16 — the
# bench default after the drift study; see STATUS.md round-3 notes)
RESID_F32 = os.environ.get('DEC_RESID', 'bf16') == 'f32'


def timeit(name, fn, *args, self_carry=False):
    """lax.scan the op REPS times in one executable; hard float() sync.

    The carry is perturbed by a data-dependent epsilon each iteration (or
    replaced by fn's output with self_carry) so XLA cannot hoist the body
    out of the loop as a common subexpression."""

    @jax.jit
    def loop(args):
        def body(c, _):
            outs = fn(*c)
            if not isinstance(outs, tuple):
                outs = (outs,)
            s = sum(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))
                    for o in outs for leaf in jax.tree_util.tree_leaves(o))
            if self_carry:
                c = outs + c[len(outs):]
            else:
                eps = (s * 1e-30).astype(jax.tree_util.tree_leaves(c[0])[0].dtype)
                c = (jax.tree_util.tree_map(lambda a: a + eps.astype(a.dtype), c[0]),
                     ) + c[1:]
            return c, s

        _, acc = jax.lax.scan(body, args, None, length=REPS)
        return jnp.sum(acc)

    acc = float(loop(args))  # compile + warm
    t0 = time.perf_counter()
    acc = float(loop(args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:14s} {dt*1e3:8.2f} ms  ({acc:.3g})", flush=True)
    return dt


rng = np.random.default_rng(0)
want = sys.argv[1:] or ["conv_fwd", "conv_train", "front_fwd", "front_train",
                        "mlp_train", "model_fwd", "model_train"]

if {"conv_fwd", "conv_train"} & set(want):
    from hyena_dna_tpu.ops.fftconv import fftconv_chunked

    u = jnp.asarray(rng.normal(size=(B, d, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(d, L)).astype(np.float32) *
                    np.exp(-np.arange(L) / 512, dtype=np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    if "conv_fwd" in want:
        timeit("conv_fwd", lambda u, k, D: fftconv_chunked(u, k, D, False), u, k, D)
    if "conv_train" in want:
        g = jax.grad(lambda u, k, D: jnp.sum(fftconv_chunked(u, k, D, False) ** 2),
                     argnums=(0, 1, 2))
        timeit("conv_train", g, u, k, D)

if {"gate_composite_train", "gate_fused_train"} & set(want):
    # the conv + post-gate slice: composite (conv kernel, then XLA gate
    # multiply) vs the gate-fused kernels (HYENA_GATED_SPEC toggles the
    # spectrum-saving vs re-transform backward)
    from hyena_dna_tpu.ops.fftconv import fftconv_chunked, fftconv_gated

    u = jnp.asarray(rng.normal(size=(B, d, L)).astype(np.float32), jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(B, d, L)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(d, L)).astype(np.float32) *
                    np.exp(-np.arange(L) / 512, dtype=np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    if "gate_composite_train" in want:
        g = jax.grad(lambda u, x0, k, D: jnp.sum(
            (fftconv_chunked(u, k, D, False) * x0).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3))
        timeit("gate_comp_train", g, u, x0, k, D)
    if "gate_fused_train" in want:
        g = jax.grad(lambda u, x0, k, D: jnp.sum(
            fftconv_gated(u, x0, k, D).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3))
        timeit("gate_fused_train", g, u, x0, k, D)

if {"front_fwd", "front_train"} & set(want):
    from hyena_dna_tpu.models import HyenaOperator

    op = HyenaOperator(d_model=d, l_max=L, filter_order=64,
                       filter_cfg=dict(emb_dim=5, w=10), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))
    params = jax.jit(op.init)(jax.random.PRNGKey(0), x)["params"]
    if "front_fwd" in want:
        timeit("op_fwd", lambda p, x: op.apply({"params": p}, x), params, x)
    if "front_train" in want:
        g = jax.grad(lambda p, x: jnp.sum(op.apply({"params": p}, x)
                                          .astype(jnp.float32) ** 2))
        timeit("op_train", g, params, x)

if "mlp_train" in want:
    w1 = jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32), jnp.bfloat16)

    def mlp(x, w1, w2):
        return jax.nn.gelu(x @ w1) @ w2

    g = jax.grad(lambda x, w1, w2: jnp.sum(mlp(x, w1, w2).astype(jnp.float32) ** 2),
                 argnums=(0, 1, 2))
    timeit("mlp8_train", lambda x, w1, w2: sum(
        jnp.sum(gi.astype(jnp.float32)) for gi in g(x, w1, w2)) * jnp.ones(1),
        x, w1, w2)

if {"model_fwd", "model_train"} & set(want):
    from flax.training.train_state import TrainState

    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.tasks import metrics as M
    from hyena_dna_tpu.train import build_optimizer

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L, modulate=True, w=10)
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d, vocab_size=12,
                            pad_vocab_size_multiple=8,
                            residual_in_fp32=RESID_F32,
                            checkpoint_mixer=os.environ.get("DEC_CKPT_MIXER") == "1",
                            checkpoint_mlp=os.environ.get("DEC_CKPT_MLP") == "1",
                            layer=layer, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, L), jnp.int32))["params"]
    x = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
    y = jnp.roll(x, -1, axis=1)

    def loss_fn(p):
        logits, _ = model.apply({"params": p}, x, deterministic=True)
        return M.cross_entropy(logits, y)

    if "model_fwd" in want:
        timeit("model_fwd", lambda p: loss_fn(p) * jnp.ones(1), params)
    if "model_train" in want:
        tx, _ = build_optimizer(params, lr=6e-4)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

        def step(state):
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return (state.apply_gradients(grads=grads),)

        timeit("model_train", step, state, self_carry=True)

if "ce_train" in want:
    # CE + logit grad at the padded-vocab shape (the lm_head/loss tail)
    from hyena_dna_tpu.tasks import metrics as M

    logits = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32),
                         jnp.bfloat16)
    y = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))

    def ce(lg):
        return M.cross_entropy(lg, y)

    g = jax.grad(lambda lg: ce(lg))
    timeit("ce_train", lambda lg: (jnp.sum(g(lg).astype(jnp.float32))
                                   * jnp.ones(1),), logits, self_carry=False)

if "glue_train" in want:
    # the per-block glue WITHOUT mixer/MLP: f32 residual adds + 2 LNs per
    # layer x nl layers (attribution for the backward time outside the ops)
    from hyena_dna_tpu.ops.layer_norm import LayerNormF32

    ln = LayerNormF32(out_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32), jnp.bfloat16)
    p = jax.jit(ln.init)(jax.random.PRNGKey(0), x)["params"]

    res_dt = jnp.float32 if RESID_F32 else jnp.bfloat16

    def glue(p, x):
        # mirror Block._add_norm: each unit is one fused add+LN call
        # (Pallas kernel on TPU for the bf16 stream, XLA twin otherwise)
        res = x.astype(res_dt)
        h = x
        for _ in range(nl):
            h, res = ln.apply({"params": p}, h, res)
            h, res = ln.apply({"params": p}, h, res)
        return jnp.sum(res[..., :1].astype(jnp.float32) ** 2)

    g = jax.grad(glue, argnums=(0, 1))
    timeit("glue_train", lambda p, x: (sum(
        jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
        for gi in g(p, x) for l in jax.tree_util.tree_leaves(gi)) * jnp.ones(1),),
        p, x, self_carry=False)

if "opt_update" in want:
    from flax.training.train_state import TrainState

    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.train import build_optimizer

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L, modulate=True, w=10)
    model2 = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d,
                             vocab_size=12, pad_vocab_size_multiple=8,
                             residual_in_fp32=True, layer=layer,
                             dtype=jnp.bfloat16)
    params2 = jax.jit(model2.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, L), jnp.int32))["params"]
    tx2, _ = build_optimizer(params2, lr=6e-4)
    st = TrainState.create(apply_fn=model2.apply, params=params2, tx=tx2)
    grads2 = jax.tree_util.tree_map(lambda a: jnp.full_like(a, 1e-6), params2)
    timeit("opt_update", lambda s: (s.apply_gradients(grads=grads2),), st,
           self_carry=True)
