"""LM family tests: shapes, weight tying, attention hybrid, training sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyena_dna_tpu.models import ConvLMHeadModel, DNAEmbeddingModel

LAYER = dict(_name_="hyena", l_max=34, order=2, filter_order=16, emb_dim=3, w=10)


def _tiny_model(**kw):
    return ConvLMHeadModel(
        d_model=16,
        n_layer=2,
        d_inner=64,
        vocab_size=12,
        pad_vocab_size_multiple=8,
        layer=dict(LAYER),
        residual_in_fp32=True,
        **kw,
    )


def test_lm_forward_shapes_and_vocab_pad():
    model = _tiny_model()
    ids = jnp.zeros((2, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits, _ = model.apply(variables, ids)
    assert logits.shape == (2, 32, 16)  # 12 padded to 16


def test_lm_head_is_weight_tied():
    model = _tiny_model()
    ids = jnp.zeros((1, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    # no separate lm_head kernel — logits come from the embedding table
    assert not any("lm_head" in n for n in names)


def test_dna_embedding_model_returns_hidden():
    model = DNAEmbeddingModel(
        d_model=16, n_layer=2, d_inner=64, vocab_size=12,
        pad_vocab_size_multiple=8, layer=dict(LAYER),
    )
    ids = jnp.zeros((2, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    h, _ = model.apply(variables, ids)
    assert h.shape == (2, 32, 16)


def test_lm_with_attn_layer():
    model = ConvLMHeadModel(
        d_model=16, n_layer=2, d_inner=64, vocab_size=12,
        layer=dict(LAYER), attn_layer_idx=(1,),
        attn_cfg=dict(num_heads=2, causal=True),
    )
    ids = jnp.zeros((2, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits, _ = model.apply(variables, ids)
    assert logits.shape == (2, 32, 12)
    names = ["/".join(str(p) for p in path) for path, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("Wqkv" in n for n in names)
    assert any("filter_fn" in n for n in names)


def test_lm_causality():
    """Changing a future token must not affect earlier logits."""
    model = _tiny_model()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 12, (1, 32)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits1, _ = model.apply(variables, ids)
    ids2 = ids.at[0, 20].set((ids[0, 20] + 1) % 12)
    logits2, _ = model.apply(variables, ids2)
    np.testing.assert_allclose(
        np.asarray(logits1[0, :20]), np.asarray(logits2[0, :20]), rtol=1e-4, atol=1e-5
    )
    assert not np.allclose(np.asarray(logits1[0, 20:]), np.asarray(logits2[0, 20:]))


def test_lm_remat_matches_no_remat():
    kw = dict(d_model=16, n_layer=2, d_inner=64, vocab_size=12, layer=dict(LAYER))
    m1 = ConvLMHeadModel(**kw)
    m2 = ConvLMHeadModel(checkpoint_mixer=True, **kw)
    ids = jnp.zeros((1, 32), jnp.int32)
    v = m1.init(jax.random.PRNGKey(0), ids)
    y1, _ = m1.apply(v, ids)
    y2, _ = m2.apply(v, ids)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)

    def loss1(p):
        return jnp.mean(m1.apply({"params": p}, ids)[0] ** 2)

    def loss2(p):
        return jnp.mean(m2.apply({"params": p}, ids)[0] ** 2)

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g1,
        g2,
    )


def test_lm_residual_only_remat_matches():
    """remat_residual_only re-cuts checkpoint cells at the residual stream
    (stores one f32 tensor per layer instead of hidden+residual); outputs
    and grads must match the plain model."""
    kw = dict(d_model=16, n_layer=3, d_inner=64, vocab_size=12,
              layer=dict(LAYER), residual_in_fp32=True, embed_dropout=0.0)
    m1 = ConvLMHeadModel(**kw)
    m2 = ConvLMHeadModel(checkpoint_mixer=True, remat_residual_only=True, **kw)
    ids = jnp.asarray(np.arange(32)[None] % 4 + 7, jnp.int32)
    v = m1.init(jax.random.PRNGKey(0), ids)
    y1, _ = m1.apply(v, ids)
    y2, _ = m2.apply(v, ids)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-6)

    g1 = jax.grad(lambda p: jnp.mean(m1.apply({"params": p}, ids)[0] ** 2))(
        v["params"])
    g2 = jax.grad(lambda p: jnp.mean(m2.apply({"params": p}, ids)[0] ** 2))(
        v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g1, g2)

    # with dropout active the mode must still run (masks replay inside cells)
    m3 = ConvLMHeadModel(checkpoint_mixer=True, remat_residual_only=True,
                         **{**kw, "embed_dropout": 0.1, "resid_dropout": 0.1})
    y3, _ = m3.apply(v, ids, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert bool(jnp.all(jnp.isfinite(y3)))


def test_lm_loss_decreases():
    """20 Adam steps on a repetitive synthetic sequence: loss must drop."""
    model = _tiny_model()
    rng = np.random.default_rng(0)
    base = np.tile(np.array([7, 8, 9, 10], np.int32), 9)
    ids = jnp.asarray(np.stack([base[:32], base[1:33]]))
    targets = jnp.asarray(np.stack([base[1:33], base[2:34]]))
    variables = model.init(jax.random.PRNGKey(0), ids)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, ids)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, targets
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses


def test_lm_simple_registry_alias():
    """`lm_simple` (reference SimpleLMHeadModel, the dependency-free LM clone
    `simple_lm.py:433-469`) builds through the registry and matches `lm` —
    the JAX modules have no flash-attn split, so one class serves both."""
    from hyena_dna_tpu.utils.config import instantiate
    from hyena_dna_tpu.utils.registry import MODEL_REGISTRY as model_registry

    cfg = dict(
        _name_="lm_simple", d_model=32, n_layer=2, d_inner=128, vocab_size=12,
        pad_vocab_size_multiple=8,
        layer=dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10),
    )
    m = instantiate(model_registry, dict(cfg))
    x = jnp.zeros((2, 64), jnp.int32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    logits, _ = m.apply({"params": params}, x, deterministic=True)
    assert logits.shape == (2, 64, 16)

    cfg_lm = dict(cfg, _name_="lm")
    m2 = instantiate(model_registry, cfg_lm)
    logits2, _ = m2.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
