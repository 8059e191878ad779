"""Pallas fused front-end parity: forward (interpret mode on CPU) and the
custom VJP against autodiff of the reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.ops.pallas_hyena import _reference_fwd, fused_proj_conv_gate

B, L, D = 2, 128, 16
TL = 32


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32), dtype)
    w = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(3, 3 * D)).astype(np.float32))
    bc = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1)
    return u, w, bp, wc, bc


def test_fused_forward_matches_reference():
    u, w, bp, wc, bc = _inputs()
    vx, x0 = fused_proj_conv_gate(u, w, bp, wc, bc, TL, True)
    vx_ref, x0_ref = _reference_fwd(u, w, bp, wc, bc)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-4, rtol=1e-4)


def test_fused_forward_carry_across_tiles():
    """The causal conv must see the previous tile's tail, not zeros."""
    u, w, bp, wc, bc = _inputs(seed=1)
    # tile boundary at 32: compare against single-tile evaluation
    vx_a, x0_a = fused_proj_conv_gate(u, w, bp, wc, bc, TL, True)
    vx_b, x0_b = fused_proj_conv_gate(u, w, bp, wc, bc, L, True)  # one tile
    np.testing.assert_allclose(np.asarray(vx_a), np.asarray(vx_b), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_a), np.asarray(x0_b), atol=1e-4, rtol=1e-4)


def test_fused_vjp_matches_autodiff():
    u, w, bp, wc, bc = _inputs(seed=2)

    def loss_fused(u, w, bp, wc, bc):
        vx, x0 = fused_proj_conv_gate(u, w, bp, wc, bc, TL, True)
        return jnp.sum(vx**2) + jnp.sum(jnp.sin(x0))

    def loss_ref(u, w, bp, wc, bc):
        vx, x0 = _reference_fwd(u, w, bp, wc, bc)
        return jnp.sum(vx**2) + jnp.sum(jnp.sin(x0))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(u, w, bp, wc, bc)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, w, bp, wc, bc)
    for a, b, name in zip(g_fused, g_ref, ["du", "dw", "dbp", "dwc", "dbc"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3, err_msg=name
        )


def test_hyena_operator_pallas_front_parity():
    from hyena_dna_tpu.models import HyenaOperator

    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (2, 64, 16), jnp.float32)
    kw = dict(d_model=16, l_max=64, filter_order=16, filter_cfg=dict(emb_dim=5))
    op_ref = HyenaOperator(**kw, use_pallas_front=False)
    params = op_ref.init(rng, u)["params"]
    y_ref = op_ref.apply({"params": params}, u)

    op_pl = HyenaOperator(**kw, use_pallas_front=True, pallas_interpret=True)
    y_pl = op_pl.apply({"params": params}, u)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=2e-4, rtol=1e-3)


def test_hyena_operator_pallas_front_grads():
    from hyena_dna_tpu.models import HyenaOperator

    rng = jax.random.PRNGKey(1)
    u = jax.random.normal(rng, (2, 64, 16), jnp.float32)
    kw = dict(d_model=16, l_max=64, filter_order=16, filter_cfg=dict(emb_dim=5))
    op_ref = HyenaOperator(**kw, use_pallas_front=False)
    params = op_ref.init(rng, u)["params"]
    op_pl = HyenaOperator(**kw, use_pallas_front=True, pallas_interpret=True)

    def loss(op):
        return lambda p: jnp.sum(op.apply({"params": p}, u) ** 2)

    g_ref = jax.grad(loss(op_ref))(params)
    g_pl = jax.grad(loss(op_pl))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pl = {tuple(str(k) for k in path): v
               for path, v in jax.tree_util.tree_leaves_with_path(g_pl)}
    for path, v in flat_ref:
        key = tuple(str(k) for k in path)
        np.testing.assert_allclose(
            np.asarray(flat_pl[key]), np.asarray(v), atol=5e-3, rtol=5e-3,
            err_msg=str(key),
        )


def test_fused_mlp_parity():
    """Fused Pallas MLP (ops/pallas_mlp.py) vs the plain Dense math:
    fwd + all five grads, interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyena_dna_tpu.ops.pallas_mlp import mlp_fused

    rng = np.random.default_rng(0)
    n, d, dh = 256, 128, 256
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.normal(size=(d, dh)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.normal(size=(dh,)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(dh, d)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32)) * 0.1

    def ref(x, w1, b1, w2, b2):
        return jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2

    y_ref = ref(x, w1, b1, w2, b2)
    y = mlp_fused(x, w1, b1, w2, b2, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-2, rtol=5e-2)

    loss_ref = lambda *a: jnp.sum(ref(*a) ** 2) / n
    loss_fus = lambda *a: jnp.sum(mlp_fused(*a, True) ** 2) / n
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_fus = jax.grad(loss_fus, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_fus, g_ref):
        scale = max(1e-3, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=4e-2, rtol=4e-2)


def test_mlp_module_fused_matches_dense():
    """Mlp module routes through the fused kernel when forced on; outputs
    must match the Dense path within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyena_dna_tpu.models.blocks import Mlp
    from hyena_dna_tpu.ops import pallas_mlp

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 128, 128))
                    .astype(np.float32)) * 0.5
    m_ref = Mlp(hidden_features=256, out_features=128, use_fused=False)
    p = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = m_ref.apply({"params": p}, x)

    # force the fused path through interpret mode on CPU
    orig = pallas_mlp.mlp_fused
    m_fused = Mlp(hidden_features=256, out_features=128, use_fused=True)
    import functools

    try:
        pallas_mlp_mlp_fused = functools.partial(orig, interpret=True)
        pallas_mlp.mlp_fused = pallas_mlp_mlp_fused
        import hyena_dna_tpu.models.blocks  # the module imports lazily inside __call__
        y = m_fused.apply({"params": p}, x)
    finally:
        pallas_mlp.mlp_fused = orig
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-2, rtol=5e-2)
