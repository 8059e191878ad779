"""Generic backbone family tests: SequenceModel/SequenceResidualBlock,
residual registry, pooling, FF layer, and LongConv vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.models.long_conv import LongConv, LongConvKernel
from hyena_dna_tpu.models.sequence_model import (
    FF,
    POOL_REGISTRY,
    RESIDUAL_REGISTRY,
    SequenceIdentity,
    SequenceModel,
    SequenceResidualBlock,
)

RNG = jax.random.PRNGKey(0)


def test_sequence_identity_and_ff():
    x = jax.random.normal(RNG, (2, 16, 8))
    sid = SequenceIdentity(d_model=8)
    y, st = sid.apply({"params": {}}, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    ff = FF(d_input=8, expand=2)
    params = ff.init(RNG, x)["params"]
    y, _ = ff.apply({"params": params}, x)
    assert y.shape == (2, 16, 8)


def test_residual_functions():
    x = jnp.ones((2, 4, 8))
    y = 2 * jnp.ones((2, 4, 8))
    r = RESIDUAL_REGISTRY["R"](i_layer=1, d_input=8, d_model=8)
    out = r.apply({"params": {}}, x, y)
    np.testing.assert_allclose(np.asarray(out), 3.0)

    f = RESIDUAL_REGISTRY["F"](i_layer=1, d_input=8, d_model=8)
    np.testing.assert_allclose(np.asarray(f.apply({"params": {}}, x, y)), 2.0)

    d = RESIDUAL_REGISTRY["D"](i_layer=4, d_input=8, d_model=8)
    beta = 4 ** -0.5
    alpha = (1 - beta**2) ** 0.5
    np.testing.assert_allclose(
        np.asarray(d.apply({"params": {}}, x, y)), alpha + 2 * beta, rtol=1e-6
    )

    a = RESIDUAL_REGISTRY["A"](i_layer=2, d_input=8, d_model=8, gamma=0.5)
    params = a.init(RNG, x, y)["params"]
    out = a.apply({"params": params}, x, y)
    np.testing.assert_allclose(np.asarray(out), 1 + 2 * 2**-0.5, rtol=1e-5)

    h = RESIDUAL_REGISTRY["H"](i_layer=1, d_input=8, d_model=8)
    params = h.init(RNG, x, y)["params"]
    assert h.apply({"params": params}, x, y).shape == x.shape


def test_pooling():
    x = jax.random.normal(RNG, (2, 16, 8))
    down = POOL_REGISTRY["avg"](d_input=8, stride=4)
    y, _ = down.apply({"params": {}}, x)
    assert y.shape == (2, 4, 8)
    np.testing.assert_allclose(
        np.asarray(y[:, 0]), np.asarray(x[:, :4].mean(axis=1)), rtol=1e-5
    )
    lin = POOL_REGISTRY["linear"](d_input=8, stride=4)
    params = lin.init(RNG, x)["params"]
    y, _ = lin.apply({"params": params}, x)
    assert y.shape == (2, 4, 8)
    samp = POOL_REGISTRY["sample"](d_input=8, stride=2, expand=2)
    y, _ = samp.apply({"params": {}}, x)
    assert y.shape == (2, 8, 16)
    assert samp.d_output == 16


def test_sequence_model_with_hyena_layer():
    model = SequenceModel(
        d_model=16,
        n_layers=2,
        layer={"_name_": "hyena", "l_max": 32, "filter_order": 16,
               "filter_cfg": {"emb_dim": 5}},
        residual="R",
        norm="layer",
        dropout=0.0,
    )
    x = jax.random.normal(RNG, (2, 32, 16))
    variables = model.init(RNG, x)
    y, states = model.apply(variables, x, mutable=["metrics"])[0]
    assert y.shape == (2, 32, 16)
    # norm tracking: d_layers + 1 entries
    _, mets = model.apply(variables, x, mutable=["metrics"])
    norms = mets["metrics"]["output_norms"]
    assert norms.shape == (3,)
    assert np.isfinite(np.asarray(norms)).all()


def test_sequence_model_ff_stack_with_pool():
    model = SequenceModel(
        d_model=8,
        n_layers=2,
        layer={"_name_": "ff", "expand": 2},
        residual="R",
        norm="layer",
        pool={"_name_": "avg", "stride": 2},
        track_norms=False,
    )
    x = jax.random.normal(RNG, (2, 16, 8))
    variables = model.init(RNG, x)
    y, _ = model.apply(variables, x)
    assert y.shape == (2, 4, 8)  # two stride-2 pools


# --------------------------------------------------------------------------
# LongConv vs numpy oracle
# --------------------------------------------------------------------------


def _oracle_longconv(u, kernel, D, lam):
    """Direct numpy evaluation of the reference math (`long_conv.py:109-165`
    with channels=1, causal, postact None applied outside)."""
    k = np.maximum(np.abs(kernel) - lam, 0.0) * np.sign(kernel)  # (1, H, L)
    B, H, L = u.shape
    n = 2 * L
    k_f = np.fft.rfft(k, n=n)
    u_f = np.fft.rfft(u, n=n)
    y_f = np.einsum("bhf,chf->bchf", u_f, k_f)
    y = np.fft.irfft(y_f, n=n)[..., :L]
    y = y + np.einsum("bhl,ch->bchl", u, D)
    return y.reshape(B, H, L)


def test_long_conv_matches_oracle():
    H, L = 8, 32
    layer = LongConv(d_model=H, l_max=L, activation="id", postact=None, dropout=0.0)
    x = jax.random.normal(RNG, (2, L, H), jnp.float32)
    params = layer.init(RNG, x)["params"]
    y, _ = layer.apply({"params": params}, x)

    kernel = np.asarray(params["kernel"]["kernel"])
    D = np.asarray(params["D"])
    ref = _oracle_longconv(
        np.asarray(jnp.swapaxes(x, -1, -2)), kernel, D, lam=0.1
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(y, -1, -2)), ref, atol=1e-4, rtol=1e-4
    )


def test_long_conv_glu_output_shape():
    layer = LongConv(d_model=8, l_max=32)
    x = jax.random.normal(RNG, (2, 32, 8))
    params = layer.init(RNG, x)["params"]
    y, _ = layer.apply({"params": params}, x)
    assert y.shape == (2, 32, 8)


def test_long_conv_kernel_inits():
    for init in ("random", "double_exp"):
        k = LongConvKernel(H=4, L=16, weight_init=init)
        params = k.init(RNG)["params"]
        assert params["kernel"].shape == (1, 4, 16)
        out, _ = k.apply({"params": params})
        assert out.shape == (1, 4, 16)


def test_long_conv_bidirectional():
    layer = LongConv(d_model=8, l_max=32, bidirectional=True, postact=None,
                     activation="id")
    x = jax.random.normal(RNG, (2, 32, 8))
    params = layer.init(RNG, x)["params"]
    assert params["kernel"]["kernel"].shape == (2, 8, 32)
    y, _ = layer.apply({"params": params}, x)
    assert y.shape == (2, 32, 8)
