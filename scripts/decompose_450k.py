"""Steady-state per-component timings at the 450k regime (B=1, d=256,
8 layers, L=450048) with the round-5 chained harness (see
scripts/calibrate.py for the timing-method corrections).

Budget question this answers: the step is 789 ms vs a 395 ms HBM floor —
how much is conv, how much is the hyena-op glue (proj/shortconv/filter/
gates/transposes), how much is MLP/LN/CE?

  python scripts/decompose_450k.py [component ...]
components: conv_train op_fwd op_train op_fwd_np op_train_np mlp_train
            filter_fwd transpose model_fwd model_train
(_np = use_pallas_front=False variant)
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from hyena_dna_tpu.utils.tpu_flags import ensure_tpu_flags

L, d, nl, B = 450048, 256, 8, 1
ensure_tpu_flags(max_seq_len=L)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = int(os.environ.get("DEC_REPS", 10))
rng = np.random.default_rng(0)


def exec_floor():
    x = jnp.ones((8,), jnp.float32)

    @jax.jit
    def loop(a):
        def body(c, _):
            return c + 1e-9, ()
        cf, _ = jax.lax.scan(body, a, None, length=REPS)
        return jnp.sum(cf[:1])

    float(loop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = exec_floor()
print(f"[exec-floor {FLOOR*1e3:.1f} ms reps={REPS}]", flush=True)


def timeit(name, fn, *args, chain_shape=None):
    """Chain fn's FIRST output leaf back into the first argument (cast/
    reshaped); everything else rides as loop arguments."""

    @jax.jit
    def loop(*a):
        x0 = a[0]

        def body(c, _):
            outs = fn(c, *a[1:])
            lead = jax.tree_util.tree_leaves(outs)[0]
            flat = jnp.ravel(lead.astype(jnp.float32))
            need = int(np.prod(np.asarray(jax.tree_util.tree_leaves(c)[0].shape)))
            if flat.size < need:
                flat = jnp.tile(flat, need // flat.size + 1)
            nxt = flat[:need].reshape(jax.tree_util.tree_leaves(c)[0].shape)
            return nxt.astype(jax.tree_util.tree_leaves(c)[0].dtype), ()

        xf, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(jnp.ravel(xf)[:1].astype(jnp.float32))

    t0 = time.perf_counter()
    float(loop(*args))
    dtc = time.perf_counter() - t0
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - FLOOR) / REPS
    print(f"{name:14s} {dt*1e3:8.2f} ms (compile {dtc:.0f}s)", flush=True)
    return dt


want = sys.argv[1:] or ["conv_train", "op_fwd", "op_train", "mlp_train",
                        "filter_fwd", "transpose", "model_train"]

if "conv_train" in want:
    from hyena_dna_tpu.ops.fftconv import fftconv

    u = jnp.asarray(rng.normal(size=(B, d, L)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(d, L)).astype(np.float32) *
                    np.exp(-np.arange(L) / 8192, dtype=np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def conv_tr(u, k, D):
        def loss(u, k, D):
            return jnp.sum(fftconv(u, k, D, False).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=0)(u, k, D)

    timeit("conv_train", conv_tr, u, k, D)

if {"op_fwd", "op_train", "op_fwd_np", "op_train_np"} & set(want):
    from hyena_dna_tpu.models import HyenaOperator

    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32),
                    jnp.bfloat16)
    for suffix, pf in (("", True), ("_np", False)):
        if not ({f"op_fwd{suffix}", f"op_train{suffix}"} & set(want)):
            continue
        op = HyenaOperator(d_model=d, l_max=L + 2, filter_order=64,
                           filter_cfg=dict(emb_dim=5, w=10),
                           use_pallas_front=pf, dtype=jnp.bfloat16)
        params = jax.jit(op.init)(jax.random.PRNGKey(0), x)["params"]
        if f"op_fwd{suffix}" in want:
            timeit(f"op_fwd{suffix}",
                   lambda x, p: op.apply({"params": p}, x), x, params)
        if f"op_train{suffix}" in want:
            def op_tr(x, p, op=op):
                return jax.grad(lambda xx: jnp.sum(
                    op.apply({"params": p}, xx).astype(jnp.float32) ** 2))(x)
            timeit(f"op_train{suffix}", op_tr, x, params)

if "mlp_train" in want:
    w1 = jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32),
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32),
                     jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32),
                    jnp.bfloat16)

    def mlp_tr(x, w1, w2):
        def loss(x):
            return jnp.sum((jax.nn.gelu(x @ w1) @ w2).astype(jnp.float32) ** 2)
        return jax.grad(loss)(x)

    timeit("mlp_train", mlp_tr, x, w1, w2)

if "filter_fwd" in want:
    from hyena_dna_tpu.models.hyena import HyenaFilter

    filt = HyenaFilter(d_model=d * 2, emb_dim=5, order=64, seq_len=L + 2,
                       w=10, dtype=jnp.bfloat16)
    xx = jnp.ones((1,), jnp.float32)
    params = jax.jit(lambda r: filt.init(r, L, method=HyenaFilter.filter))(
        jax.random.PRNGKey(0))["params"]

    def filt_fwd(xx, p):
        # perturb params by the carry so the (otherwise loop-invariant)
        # filter evaluation cannot be hoisted out of the scan
        p = jax.tree_util.tree_map(
            lambda a: a + (xx[0] * 1e-30).astype(a.dtype), p)
        k = filt.apply({"params": p}, L, method=HyenaFilter.filter)
        return jnp.ravel(k)[:4] + xx[0] * 1e-9

    timeit("filter_fwd", filt_fwd, xx, params)

if "transpose" in want:
    x = jnp.asarray(rng.normal(size=(B, L, 3 * d)).astype(np.float32),
                    jnp.bfloat16)

    def tp(x):
        y = jnp.swapaxes(x, -1, -2) * jnp.bfloat16(1.0001)
        return jnp.swapaxes(y, -1, -2)

    timeit("transpose_rt", tp, x)

if {"model_fwd", "model_train"} & set(want):
    from flax.training.train_state import TrainState

    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.tasks import metrics as M
    from hyena_dna_tpu.train import build_optimizer

    layer = dict(_name_="hyena", emb_dim=5, filter_order=64,
                 short_filter_order=3, l_max=L + 2, modulate=True, w=10,
                 use_pallas_front=True)
    model = ConvLMHeadModel(d_model=d, n_layer=nl, d_inner=4 * d,
                            vocab_size=12, pad_vocab_size_multiple=8,
                            residual_in_fp32=False, layer=layer,
                            checkpoint_mixer=True, checkpoint_mlp=True,
                            dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, L), jnp.int32))["params"]
    xi = jnp.tile(jnp.asarray((np.arange(L) % 4 + 7), jnp.int32), (B, 1))
    yi = jnp.roll(xi, -1, axis=1)

    def loss_fn(p):
        logits, _ = model.apply({"params": p}, xi, deterministic=True)
        return M.cross_entropy(logits, yi)

    def perturbed(p, z):
        # carry-dependent perturbation: keeps the loop body loop-variant
        return jax.tree_util.tree_map(lambda a: a + (z[0] * 1e-30).astype(
            a.dtype), p)

    if "model_fwd" in want:
        z = jnp.ones((4,), jnp.float32)
        timeit("model_fwd",
               lambda z, p: loss_fn(perturbed(p, z)) + z[0] * 1e-9, z, params)
    if "model_train" in want:
        z = jnp.ones((4,), jnp.float32)

        def tr(z, p):
            loss, grads = jax.value_and_grad(loss_fn)(perturbed(p, z))
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + gsum * 1e-20 + z[0] * 1e-9

        timeit("model_train", tr, z, params)
