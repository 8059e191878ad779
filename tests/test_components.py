"""Tests for encoders, adaptive softmax/embedding, DCT, and Gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.models.adaptive_softmax import (
    AdaptiveEmbedding,
    ProjectedAdaptiveLogSoftmax,
)
from hyena_dna_tpu.models.dxt import dct, dct_matrix, idct
from hyena_dna_tpu.models.nn import Gate
from hyena_dna_tpu.tasks.encoders import (
    ENCODER_REGISTRY,
    ClassEmbedding,
    Conv1DEncoder,
    EmbeddingEncoder,
    LayerEncoder,
    OneHotEncoder,
    PositionalEncoder,
)

RNG = jax.random.PRNGKey(0)


# --------------------------------------------------------------------------
# encoders
# --------------------------------------------------------------------------


def test_embedding_encoder():
    enc = EmbeddingEncoder(n_tokens=12, d_model=16)
    x = jnp.zeros((2, 8), jnp.int32)
    params = enc.init(RNG, x)["params"]
    y = enc.apply({"params": params}, x)
    assert y.shape == (2, 8, 16)


def test_positional_encoder_sinusoidal():
    enc = PositionalEncoder(d_model=16, dropout=0.0)
    x = jnp.zeros((2, 8, 16))
    params = enc.init(RNG, x)
    y = enc.apply(params, x)
    # position 0: sin(0)=0, cos(0)=1 pattern
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, 0, 1]), 1.0, atol=1e-6)


def test_onehot_encoder():
    enc = OneHotEncoder(n_tokens=4, d_model=8)
    x = jnp.asarray([[1, 3]])
    y = enc.apply({"params": {}}, x)
    assert y.shape == (1, 2, 8)
    assert float(y[0, 0, 1]) == 1.0 and float(y[0, 1, 3]) == 1.0


def test_class_embedding_and_conv1d():
    x = jnp.ones((2, 8, 16))
    enc = ClassEmbedding(n_classes=4, d_model=16)
    params = enc.init(RNG, x, y=jnp.asarray([0, 1]))["params"]
    out = enc.apply({"params": params}, x, y=jnp.asarray([0, 1]))
    assert out.shape == x.shape

    conv = Conv1DEncoder(d_input=16, d_model=8, kernel_size=5)
    params = conv.init(RNG, x)["params"]
    assert conv.apply({"params": params}, x).shape == (2, 8, 8)


def test_layer_encoder_with_hyena():
    enc = LayerEncoder(d_model=16, layer={"_name_": "hyena", "l_max": 8,
                                          "filter_order": 16,
                                          "filter_cfg": {"emb_dim": 5}})
    x = jax.random.normal(RNG, (2, 8, 16))
    params = enc.init(RNG, x)["params"]
    assert enc.apply({"params": params}, x).shape == x.shape


def test_registry_names():
    assert set(ENCODER_REGISTRY) >= {
        "embedding", "linear", "position", "position_id", "class",
        "onehot", "conv1d", "layer", "id",
        "time", "pack", "patch2d", "timestamp_embedding",
    }


def test_time_encoder_embeds_marks_and_mask():
    """TimeEncoder (reference encoders.py:206-230): timeenc=0 sums one
    embedding per integer time feature plus a 2-way mask embedding."""
    from hyena_dna_tpu.tasks.encoders import TimeEncoder

    enc = TimeEncoder(n_tokens_time=(13, 32, 7, 24), d_model=16)
    x = jnp.zeros((2, 8, 16))
    mark = jnp.zeros((2, 8, 4), jnp.int32)
    mask = jnp.asarray(np.r_[np.zeros(4), np.ones(4)], jnp.int32)
    mask = jnp.broadcast_to(mask, (2, 8))
    params = enc.init(RNG, x, mark=mark, mask=mask)["params"]
    y = enc.apply({"params": params}, x, mark=mark, mask=mask)
    assert y.shape == x.shape
    # mask flips between position 3 and 4 -> outputs must differ there
    assert float(jnp.abs(y[0, 3] - y[0, 4]).max()) > 0

    # timeenc=1: single Linear over the stacked marks
    enc1 = TimeEncoder(n_tokens_time=(13, 32, 7, 24), d_model=16, timeenc=1)
    params = enc1.init(RNG, x, mark=mark, mask=mask)["params"]
    assert enc1.apply({"params": params}, x, mark=mark,
                      mask=mask).shape == x.shape


def test_packed_encoder_masks_beyond_length():
    """PackedEncoder: dense-mask equivalent of pack_padded_sequence —
    positions >= row length become exact zeros."""
    from hyena_dna_tpu.tasks.encoders import PackedEncoder

    x = jnp.ones((2, 6, 4))
    y = PackedEncoder().apply({}, x, lengths=jnp.asarray([3, 6]))
    assert float(jnp.abs(y[0, :3]).min()) == 1.0
    assert float(jnp.abs(y[0, 3:]).max()) == 0.0
    assert float(jnp.abs(y[1]).min()) == 1.0


def test_conv2d_patch_encoder_shapes():
    """Conv2DPatchEncoder: (B, H, W, C) -> (B, (H/fh)*(W/fw), d_model);
    flat mode reshapes flattened rows back to 2D first."""
    from hyena_dna_tpu.tasks.encoders import Conv2DPatchEncoder

    enc = Conv2DPatchEncoder(d_input=3, d_model=16, filter_sizes=(4, 4))
    x = jax.random.normal(RNG, (2, 8, 8, 3))
    params = enc.init(RNG, x)["params"]
    assert enc.apply({"params": params}, x).shape == (2, 4, 16)

    flat = Conv2DPatchEncoder(d_input=3, d_model=16, filter_sizes=(4, 4),
                              flat=True)
    xf = x.reshape(2, 64, 3)
    params = flat.init(RNG, xf)["params"]
    assert flat.apply({"params": params}, xf).shape == (2, 4, 16)


def test_timestamp_embedding_encoder_table_and_linear():
    """TimestampEmbeddingEncoder: per-attribute add; -1 (null) timestamps
    contribute nothing in table mode (padding row)."""
    from hyena_dna_tpu.tasks.encoders import TimestampEmbeddingEncoder

    x = jnp.zeros((2, 4, 8))
    ts = {"month": jnp.asarray([[1, 12, -1, 6]] * 2),
          "hour": jnp.asarray([[0, 23, 5, -1]] * 2)}
    enc = TimestampEmbeddingEncoder(d_model=8, table=True)
    params = enc.init(RNG, x, timestamps=ts)["params"]
    y = enc.apply({"params": params}, x, timestamps=ts)
    assert y.shape == x.shape
    # both attrs null at no position here except month@2 and hour@3 —
    # a position with a null attr gets zero contribution from that attr
    ts0 = {"month": jnp.full((2, 4), -1), "hour": jnp.full((2, 4), -1)}
    y0 = enc.apply({"params": params}, x, timestamps=ts0)
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-6)

    lin = TimestampEmbeddingEncoder(d_model=8, table=False)
    params = lin.init(RNG, x, timestamps=ts)["params"]
    assert lin.apply({"params": params}, x, timestamps=ts).shape == x.shape


def test_packed_decoder_identity_and_trainer_registry():
    from hyena_dna_tpu.models.heads import PackedDecoder
    from hyena_dna_tpu.train.trainer import DECODER_REGISTRY

    x = jnp.ones((2, 6, 4))
    np.testing.assert_allclose(np.asarray(PackedDecoder().apply({}, x)),
                               np.asarray(x))
    assert {"retrieval", "state", "pack"} <= set(DECODER_REGISTRY)


# --------------------------------------------------------------------------
# adaptive softmax
# --------------------------------------------------------------------------


def test_adaptive_embedding_div1_and_div2():
    x = jnp.asarray([[1, 5, 9], [0, 3, 11]], jnp.int32)
    for div_val in (1, 2):
        emb = AdaptiveEmbedding(n_token=12, d_embed=16, d_proj=8,
                                cutoffs=[4, 8], div_val=div_val)
        params = emb.init(RNG, x)["params"]
        y = emb.apply({"params": params}, x)
        assert y.shape == (2, 3, 8)
        assert np.isfinite(np.asarray(y)).all()


def test_adaptive_logsoftmax_normalized():
    h = jax.random.normal(RNG, (6, 8))
    sm = ProjectedAdaptiveLogSoftmax(n_token=12, d_embed=16, d_proj=8,
                                     cutoffs=[4, 8], div_val=2)
    tgt = jnp.asarray([0, 3, 5, 7, 9, 11])
    params = sm.init(RNG, h, tgt)["params"]
    lp = sm.apply({"params": params}, h)
    assert lp.shape == (6, 12)
    # rows are normalized distributions
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)
    nll = sm.apply({"params": params}, h, tgt)
    assert nll.shape == (6,)
    np.testing.assert_allclose(
        np.asarray(nll), -np.asarray(lp)[np.arange(6), np.asarray(tgt)], rtol=1e-6
    )


def test_adaptive_logsoftmax_no_cutoffs_matches_dense():
    h = jax.random.normal(RNG, (4, 8))
    sm = ProjectedAdaptiveLogSoftmax(n_token=12, d_embed=8, d_proj=8, cutoffs=[])
    tgt = jnp.asarray([0, 1, 2, 3])
    params = sm.init(RNG, h, tgt)["params"]
    lp = sm.apply({"params": params}, h)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)


# --------------------------------------------------------------------------
# AdaptiveLMModel (tied adaptive encoder + softmax, `tasks.py:332-379`)
# --------------------------------------------------------------------------


def _adaptive_lm(tie_weights=True):
    from hyena_dna_tpu.models.adaptive_softmax import AdaptiveLMModel

    return AdaptiveLMModel(
        n_token=12, d_model=16, cutoffs=[4, 8], div_val=2,
        tie_weights=tie_weights,
        backbone=dict(n_layers=1, layer={"_name_": "ff", "expand": 2},
                      track_norms=False),
    )


def test_adaptive_lm_normalized_and_tied():
    model = _adaptive_lm()
    x = jnp.asarray([[1, 5, 9, 0], [11, 3, 7, 2]], jnp.int32)
    params = model.init(RNG, x)["params"]
    lp, _ = model.apply({"params": params}, x)
    assert lp.shape == (2, 4, 12)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)
    # tie_weights: no separate out_emb params; tails reuse emb_i
    assert not any(k.startswith("out_emb") for k in params)
    # default tie_projs: head untied (out_proj_0 exists when div_val>1),
    # tails tied (no out_proj_1/2)
    assert "out_proj_0" in params and "out_proj_1" not in params

    untied = _adaptive_lm(tie_weights=False)
    p2 = untied.init(RNG, x)["params"]
    assert any(k.startswith("out_emb") for k in p2)


def test_adaptive_lm_task_trains():
    """adaptive_lm registry entry + LM cross-entropy reduces loss."""
    import optax

    from hyena_dna_tpu.tasks.tasks import TASK_REGISTRY
    from hyena_dna_tpu.utils.registry import MODEL_REGISTRY

    model = MODEL_REGISTRY["adaptive_lm"](
        n_token=12, d_model=16, cutoffs=[4, 8], div_val=2,
        backbone=dict(n_layers=1, layer={"_name_": "ff", "expand": 2},
                      track_norms=False),
    )
    task = TASK_REGISTRY["adaptive_lm"](div_val=2, cutoffs=[4, 8],
                                        tie_weights=True, tie_projs=[False, True, True])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 12, (4, 16)), jnp.int32)
    y = jnp.roll(x, -1, axis=1)
    params = model.init(RNG, x)["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            lp, _ = model.apply({"params": p}, x)
            return task.compute_loss(lp, y)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses[::10]


# --------------------------------------------------------------------------
# DCT
# --------------------------------------------------------------------------


def test_dct_matches_scipy():
    from scipy.fft import dct as sp_dct

    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    for norm in ("backward", "ortho"):
        ref = sp_dct(x, type=2, norm=None if norm == "backward" else "ortho")
        for mode in ("dense", "2n", "4n"):
            out = dct(jnp.asarray(x), norm=norm, mode=mode)
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_idct_ortho_roundtrip():
    x = np.random.default_rng(1).normal(size=(2, 8)).astype(np.float32)
    X = dct(jnp.asarray(x), norm="ortho")
    back = idct(X, norm="ortho")
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


# --------------------------------------------------------------------------
# Gate
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mech", ["N", "G", "BE", "BR", "TE", "TR", "TS", "R", "UR"])
def test_gate_mechanisms(mech):
    g = Gate(size=8, mechanism=mech)
    x = jax.random.normal(RNG, (2, 8))
    params = g.init(RNG, x)
    out = g.apply(params, x)
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()
    if mech in ("G", "FS"):
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_retrieval_state_ragged_decoders():
    from hyena_dna_tpu.models.heads import (
        RetrievalDecoder,
        SequenceDecoder,
        StateDecoder,
    )

    x = jax.random.normal(RNG, (4, 8, 16))
    rd = RetrievalDecoder(d_input=16, n_classes=3)
    p = rd.init(RNG, x)["params"]
    assert rd.apply({"params": p}, x).shape == (2, 3)

    sd = SequenceDecoder(d_model=16, d_output=None, l_output=0, mode="ragged")
    lengths = jnp.asarray([3, 8, 2, 5])
    out = sd.apply({"params": {}}, x, lengths=lengths)
    ref = np.stack([np.asarray(x)[i, l - 1] for i, l in enumerate([3, 8, 2, 5])])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    st = StateDecoder(d_model=16, d_output=4)
    p = st.init(RNG, x, state=jnp.ones((4, 16)))["params"]
    assert st.apply({"params": p}, x, state=jnp.ones((4, 16))).shape == (4, 4)
