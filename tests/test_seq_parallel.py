"""Sequence-parallel (SP) correctness: channel-pencil fftconv and halo short
conv must match the single-device ops bit-for-bit (same math, reordered),
and a seq-sharded LM forward/backward must match the unsharded one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hyena_dna_tpu.models import ConvLMHeadModel, HyenaOperator
from hyena_dna_tpu.ops import fftconv, short_conv_1d
from hyena_dna_tpu.ops.distributed import seq_fftconv, seq_short_conv
from hyena_dna_tpu.parallel import make_mesh, shard_params

B, C, L = 2, 16, 128


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, seq=4, model=1)


def _sharded(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def test_seq_fftconv_matches_local(mesh):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    ref = fftconv(u, k, D, False)
    u_s = _sharded(mesh, u, P("data", None, "seq"))
    out = jax.jit(lambda u, k, D: seq_fftconv(u, k, D, mesh))(u_s, k, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_seq_fftconv_grads_match(mesh):
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    def loss_ref(u, k, D):
        return jnp.sum(fftconv(u, k, D, False) ** 2)

    def loss_sp(u, k, D):
        return jnp.sum(seq_fftconv(u, k, D, mesh) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(u, k, D)
    u_s = _sharded(mesh, u, P("data", None, "seq"))
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(u_s, k, D)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)


def test_seq_short_conv_matches_local(mesh):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    ref = short_conv_1d(x, w, b)
    x_s = _sharded(mesh, x, P("data", None, "seq"))
    out = jax.jit(lambda x, w, b: seq_short_conv(x, w, b, mesh))(x_s, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_hyena_operator_seq_parallel_parity(mesh):
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (B, L, 16), jnp.float32)

    op_ref = HyenaOperator(d_model=16, l_max=L, filter_order=16,
                           filter_cfg=dict(emb_dim=5))
    params = op_ref.init(rng, u)["params"]
    y_ref = op_ref.apply({"params": params}, u)

    op_sp = HyenaOperator(d_model=16, l_max=L, filter_order=16,
                          filter_cfg=dict(emb_dim=5), mesh=mesh)
    u_s = _sharded(mesh, u, P("data", "seq", None))
    y_sp = jax.jit(lambda p, u: op_sp.apply({"params": p}, u))(params, u_s)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=2e-4, rtol=1e-3)


def test_lm_seq_parallel_loss_and_grads_match(mesh):
    layer = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=L, w=10)
    kw = dict(d_model=16, n_layer=2, d_inner=64, vocab_size=12,
              pad_vocab_size_multiple=8, layer=layer, embed_dropout=0.0)
    model_ref = ConvLMHeadModel(**kw)
    model_sp = ConvLMHeadModel(**kw, mesh=mesh)

    rng = jax.random.PRNGKey(3)
    x = jax.random.randint(rng, (B, L), 7, 11, jnp.int32)
    y = jnp.roll(x, -1, axis=1)
    params = model_ref.init(rng, x)["params"]

    def loss(model):
        def f(p, x_in):
            logits, _ = model.apply({"params": p}, x_in)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))
        return f

    l_ref = loss(model_ref)(params, x)
    g_ref = jax.grad(loss(model_ref))(params, x)

    x_s = _sharded(mesh, x, P("data", "seq"))
    l_sp = jax.jit(loss(model_sp))(params, x_s)
    g_sp = jax.jit(jax.grad(loss(model_sp)))(params, x_s)

    np.testing.assert_allclose(float(l_sp), float(l_ref), atol=1e-5, rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    for a, b in zip(flat_sp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_lm_tensor_parallel_loss_and_grads_match():
    """TP parity: params sharded over the model axis via PARAM_RULES
    (column/row-parallel projections, the reference's ColumnParallelLinear /
    ParallelMLP layout, `long_conv_lm.py:283-295`) must reproduce the
    unsharded loss and grads — GSPMD inserts the all-gather/reduce-scatter
    that flash-attn's hand-written TP layers do."""
    mesh = make_mesh(data=2, seq=1, model=4)
    layer = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=L, w=10)
    kw = dict(d_model=32, n_layer=2, d_inner=128, vocab_size=12,
              pad_vocab_size_multiple=8, layer=layer, embed_dropout=0.0)
    model = ConvLMHeadModel(**kw)

    rng = jax.random.PRNGKey(5)
    x = jax.random.randint(rng, (B, L), 7, 11, jnp.int32)
    y = jnp.roll(x, -1, axis=1)
    params = model.init(rng, x)["params"]

    def f(p, x_in):
        logits, _ = model.apply({"params": p}, x_in)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

    l_ref = f(params, x)
    g_ref = jax.grad(f)(params, x)

    p_tp = shard_params(params, mesh)
    # at least one wide param must actually be model-sharded for this to test TP
    shardings = [v.sharding.spec for v in jax.tree_util.tree_leaves(p_tp)]
    assert any("model" in str(s) for s in shardings), shardings
    x_tp = _sharded(mesh, x, P("data", None))
    l_tp = jax.jit(f)(p_tp, x_tp)
    g_tp = jax.jit(jax.grad(f))(p_tp, x_tp)

    np.testing.assert_allclose(float(l_tp), float(l_ref), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_tp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_seq_parallel_realistic_long_context(mesh, monkeypatch):
    """SP at a realistic shape (C=256, L=32768): the channel-chunked conv and
    the permuted two-step FFT must actually execute INSIDE shard_map (budget /
    threshold forced down so both long-L paths engage at test size) and match
    the single-device op, fwd and bwd."""
    import sys

    import hyena_dna_tpu.ops.fftconv  # noqa: F401 (package attr shadows module)

    F = sys.modules["hyena_dna_tpu.ops.fftconv"]
    monkeypatch.setattr(F, "TWO_STEP_FFT_MIN", 1 << 16)  # engage at fft_size 65536
    Lbig, C = 32768, 256
    # chunk budget sized for 16-channel blocks so fftconv_chunked really scans
    per_channel = (F.next_fast_fft_size(2 * Lbig) // 2 + 1) * 8
    monkeypatch.setattr(F, "FFTCONV_CHUNK_BUDGET", 16 * 4 * per_channel)
    assert F.fftconv_chunk_size(C // mesh.shape["seq"], Lbig) < C // mesh.shape["seq"]

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(2, C, Lbig)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(C, Lbig)) *
                     np.exp(-np.arange(Lbig) / 64)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    def loss_ref(u, k, D):
        return jnp.sum(F.fftconv_chunked(u, k, D, False) ** 2) / u.size

    def loss_sp(u, k, D):
        return jnp.sum(seq_fftconv(u, k, D, mesh) ** 2) / u.size

    u_s = _sharded(mesh, u, P("data", None, "seq"))
    y_ref = F.fftconv_chunked(u, k, D, False)
    y_sp = jax.jit(lambda u, k, D: seq_fftconv(u, k, D, mesh))(u_s, k, D)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               atol=2e-3, rtol=1e-3)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(u, k, D)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(u_s, k, D)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
