"""Parity tests: HyenaFilter / HyenaOperator vs the torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from hyena_dna_tpu.models import HyenaFilter, HyenaOperator

from torch_oracle import hyena_filter_oracle, hyena_operator_oracle, pos_emb_oracle


def test_positional_embedding_matches():
    from hyena_dna_tpu.models.filters import positional_embedding_init

    for emb_dim, L in [(3, 64), (5, 1024)]:
        z = np.asarray(positional_embedding_init(emb_dim, L))
        z_t, _ = pos_emb_oracle(emb_dim, L)
        np.testing.assert_allclose(z, z_t.numpy(), rtol=1e-5, atol=1e-6)


def _filter_params_to_oracle(params, num_inner_mlps):
    """Map flax param tree -> oracle dict (transpose Dense kernels)."""
    out = {
        "pos_emb_z": np.asarray(params["pos_emb_z"]),
        "freq": np.asarray(params["freq"]),
        "deltas": np.asarray(params["deltas"]),
        "mlp_in_w": np.asarray(params["mlp_in"]["kernel"]).T,
        "mlp_in_b": np.asarray(params["mlp_in"]["bias"]),
        "mlp_out_w": np.asarray(params["mlp_out"]["kernel"]).T,
    }
    for i in range(num_inner_mlps):
        out[f"mlp_inner_{i}_w"] = np.asarray(params[f"mlp_inner_{i}"]["kernel"]).T
        out[f"mlp_inner_{i}_b"] = np.asarray(params[f"mlp_inner_{i}"]["bias"])
    return out


def test_hyena_filter_matches_oracle():
    d, emb_dim, order, L = 16, 5, 8, 128
    mod = HyenaFilter(d_model=d, emb_dim=emb_dim, order=order, seq_len=L, w=10)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, d, L)), L)["params"]

    k = mod.apply({"params": params}, L, method=HyenaFilter.filter)
    oracle_params = _filter_params_to_oracle(params, 2)
    k_t = hyena_filter_oracle(oracle_params, L, L, emb_dim).numpy()
    np.testing.assert_allclose(np.asarray(k), k_t, rtol=1e-4, atol=1e-5)


def test_hyena_filter_short_slice():
    """Filters for L < seq_len slice the stored positional features."""
    d, emb_dim, L = 8, 5, 256
    mod = HyenaFilter(d_model=d, emb_dim=emb_dim, order=16, seq_len=L)
    params = mod.init(jax.random.PRNGKey(1), jnp.zeros((1, d, L)), L)["params"]
    k_full = mod.apply({"params": params}, L, method=HyenaFilter.filter)
    k_half = mod.apply({"params": params}, L // 2, method=HyenaFilter.filter)
    np.testing.assert_allclose(
        np.asarray(k_full[:, : L // 2]), np.asarray(k_half), rtol=1e-5, atol=1e-6
    )


def _operator_params_to_oracle(params, num_inner_mlps=2):
    fparams = params["filter_fn"]
    out = {
        "in_proj_w": np.asarray(params["in_proj"]["kernel"]).T,
        "in_proj_b": np.asarray(params["in_proj"]["bias"]),
        "out_proj_w": np.asarray(params["out_proj"]["kernel"]).T,
        "out_proj_b": np.asarray(params["out_proj"]["bias"]),
        "short_w": np.asarray(params["short_filter_weight"]),
        "short_b": np.asarray(params["short_filter_bias"]),
        "filter_bias": np.asarray(fparams["bias"]),
    }
    for k, v in _filter_params_to_oracle(fparams, num_inner_mlps).items():
        out["filter_" + k] = v
    return out


def test_hyena_operator_matches_oracle_order2():
    d, L, order = 32, 128, 2
    mod = HyenaOperator(
        d_model=d, l_max=L, order=order, filter_order=64,
        filter_cfg=dict(emb_dim=5, w=10),
    )
    u = jnp.asarray(np.random.default_rng(0).standard_normal((2, L, d)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), u)
    y = mod.apply(variables, u)

    oracle_params = _operator_params_to_oracle(variables["params"])
    y_t = hyena_operator_oracle(
        oracle_params, torch.as_tensor(np.asarray(u)), order, d, L, emb_dim=5
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), y_t, rtol=1e-3, atol=1e-4)


def test_hyena_operator_matches_oracle_order3():
    d, L, order = 16, 64, 3
    mod = HyenaOperator(
        d_model=d, l_max=L, order=order, filter_order=32,
        filter_cfg=dict(emb_dim=3, w=1),
    )
    u = jnp.asarray(np.random.default_rng(1).standard_normal((2, L, d)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), u)
    y = mod.apply(variables, u)

    oracle_params = _operator_params_to_oracle(variables["params"])
    y_t = hyena_operator_oracle(
        oracle_params, torch.as_tensor(np.asarray(u)), order, d, L, emb_dim=3
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), y_t, rtol=1e-3, atol=1e-4)


def test_hyena_operator_short_input():
    """Input shorter than l_max uses k[:L] slices (`hyena.py:389-390,405`)."""
    d, L = 16, 64
    mod = HyenaOperator(d_model=d, l_max=L, order=2, filter_cfg=dict(emb_dim=3))
    u = jnp.asarray(np.random.default_rng(2).standard_normal((1, L // 2, d)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(2), u)
    y = mod.apply(variables, u)
    assert y.shape == (1, L // 2, d)


def test_hyena_operator_grads_finite():
    d, L = 16, 64
    mod = HyenaOperator(d_model=d, l_max=L, order=2, filter_cfg=dict(emb_dim=3))
    u = jnp.asarray(np.random.default_rng(3).standard_normal((1, L, d)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(3), u)

    def loss(params):
        return jnp.sum(mod.apply({"params": params}, u) ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    # every param receives gradient except (possibly) frozen-by-design ones
    zero_names = [
        k for k, v in jax.tree_util.tree_leaves_with_path(g)
        if not bool(jnp.any(v != 0))
    ]
    assert len(zero_names) == 0, f"zero grads: {zero_names}"


def _run_generic_parity(mod_kwargs, oracle_kwargs, seed=0, batch=2, L=None, d=None):
    """Init the operator, run it, and compare against the torch oracle."""
    mod = HyenaOperator(**mod_kwargs)
    L = L or mod_kwargs["l_max"]
    d = d or mod_kwargs["d_model"]
    u = jnp.asarray(
        np.random.default_rng(seed).standard_normal((batch, L, d)), jnp.float32
    )
    variables = mod.init(jax.random.PRNGKey(seed), u)
    y = mod.apply(variables, u)
    assert y is not None, "HyenaOperator returned None (dead generic path)"

    oracle_params = _operator_params_to_oracle(variables["params"])
    if mod_kwargs.get("post_order_ffn"):
        oracle_params["ord_proj_w"] = np.asarray(variables["params"]["ord_proj_w"])
    y_t = hyena_operator_oracle(
        oracle_params, torch.as_tensor(np.asarray(u)), **oracle_kwargs
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), y_t, rtol=1e-3, atol=1e-4)
    return mod, variables, u


def test_hyena_operator_multi_head():
    """num_heads > 1: per-head gating with a head_dim-wide shared filter
    (reference hyena.py:396-412)."""
    d, L = 32, 128
    _run_generic_parity(
        dict(d_model=d, l_max=L, order=2, filter_order=32, num_heads=4,
             filter_cfg=dict(emb_dim=5, w=10)),
        dict(order=2, d_model=d, l_max=L, emb_dim=5, num_heads=4),
    )


def test_hyena_operator_multi_block():
    """num_blocks > 1: block-diagonal sequence chunking where each block
    convolves against the full-length (aliased) filter (hyena.py:396-402)."""
    d, L = 16, 128  # block length 128/2 = 64, power of two
    _run_generic_parity(
        dict(d_model=d, l_max=L, order=2, filter_order=32, num_blocks=2,
             filter_cfg=dict(emb_dim=5, w=10)),
        dict(order=2, d_model=d, l_max=L, emb_dim=5, num_blocks=2),
    )


def test_hyena_operator_heads_and_blocks_order3():
    d, L = 24, 128
    _run_generic_parity(
        dict(d_model=d, l_max=L, order=3, filter_order=32, num_heads=2,
             num_blocks=2, filter_cfg=dict(emb_dim=3, w=1)),
        dict(order=3, d_model=d, l_max=L, emb_dim=3, num_heads=2, num_blocks=2),
        seed=3,
    )


def test_hyena_operator_outer_mixing():
    d, L = 16, 64
    _run_generic_parity(
        dict(d_model=d, l_max=L, order=2, filter_order=16, outer_mixing=True,
             filter_cfg=dict(emb_dim=3, w=1)),
        dict(order=2, d_model=d, l_max=L, emb_dim=3, outer_mixing=True),
        seed=4,
    )


def test_hyena_operator_post_order_ffn():
    d, L = 32, 64
    _run_generic_parity(
        dict(d_model=d, l_max=L, order=3, filter_order=16, num_heads=4,
             post_order_ffn=True, filter_cfg=dict(emb_dim=3, w=1)),
        dict(order=3, d_model=d, l_max=L, emb_dim=3, num_heads=4,
             post_order_ffn=True),
        seed=5,
    )


def test_hyena_operator_input_longer_than_lmax():
    """l > l_max: the FILTER truncates to l_max but the sequence keeps full
    length (the reference crops the sequence itself, `hyena.py:394`, which
    shrinks the layer output and breaks its own residual add — here ICL
    prompts longer than l_max run end-to-end). Causality makes the first
    l_max positions exactly the reference computation, so the oracle parity
    check applies to that prefix."""
    d, L = 16, 64
    mod = HyenaOperator(d_model=d, l_max=L, order=2, filter_order=16,
                        filter_cfg=dict(emb_dim=3, w=1))
    u = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, L + 32, d)), jnp.float32
    )
    variables = mod.init(jax.random.PRNGKey(6), u)
    y = mod.apply(variables, u)
    assert y is not None and y.shape == (1, L + 32, d)
    assert bool(jnp.isfinite(y).all())
    oracle_params = _operator_params_to_oracle(variables["params"])
    y_t = hyena_operator_oracle(
        oracle_params, torch.as_tensor(np.asarray(u)), 2, d, L, emb_dim=3
    ).numpy()
    np.testing.assert_allclose(np.asarray(y[:, :L]), y_t, rtol=1e-3, atol=1e-4)


def test_hyena_operator_multi_head_grads_finite():
    d, L = 16, 64
    mod = HyenaOperator(d_model=d, l_max=L, order=2, filter_order=16,
                        num_heads=2, num_blocks=2, filter_cfg=dict(emb_dim=3))
    u = jnp.asarray(np.random.default_rng(7).standard_normal((1, L, d)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(7), u)

    def loss(params):
        return jnp.sum(mod.apply({"params": params}, u) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g))


def test_inner_remat_parity():
    """inner_remat changes memory scheduling, not math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyena_dna_tpu.models import HyenaOperator

    kw = dict(d_model=16, l_max=64, filter_order=16, filter_cfg=dict(emb_dim=5),
              use_pallas_front=False)
    op_a = HyenaOperator(**kw)
    op_b = HyenaOperator(**kw, inner_remat=True)
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (2, 64, 16))
    params = op_a.init(rng, u)["params"]
    y_a = op_a.apply({"params": params}, u)
    y_b = op_b.apply({"params": params}, u)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), atol=1e-5)
    g_a = jax.grad(lambda p: jnp.sum(op_a.apply({"params": p}, u) ** 2))(params)
    g_b = jax.grad(lambda p: jnp.sum(op_b.apply({"params": p}, u) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)
