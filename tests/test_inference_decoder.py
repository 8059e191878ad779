"""hg38_inference_decoder CLI: Lightning fine-tune checkpoint (backbone +
`decoder.0.output_transform`) import and backbone+decoder prediction parity
(`/root/reference/evals/hg38_inference_decoder.py:28-166`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.evals.hg38_inference_decoder import (
    HG38Inference,
    build_model,
)
from hyena_dna_tpu.utils.torch_import import convert_state_dict
from tests.test_torch_import import _flax_to_torch_sd

D_MODEL, N_LAYER, MAX_LEN, D_OUT = 32, 2, 64, 3


@pytest.fixture(scope="module")
def stack():
    backbone, decoder = build_model(D_MODEL, N_LAYER, MAX_LEN, D_OUT)
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, MAX_LEN), jnp.int32)
    bp = backbone.init(rng, ids)["params"]
    h, _ = backbone.apply({"params": bp}, ids)
    dp = decoder.init(rng, h)["params"]
    return backbone, decoder, bp, dp


def test_decoder_ckpt_key_mapping(stack):
    """A Lightning state dict with decoder.0.* keys converts into the same
    backbone/decoder trees."""
    backbone, decoder, bp, dp = stack
    sd = _flax_to_torch_sd({"backbone": bp["backbone"]})
    w = np.asarray(dp["output_transform"]["kernel"])
    sd["model.decoder.0.output_transform.weight"] = w.T
    sd["model.decoder.0.output_transform.bias"] = np.asarray(
        dp["output_transform"]["bias"])
    tree = convert_state_dict(sd)
    np.testing.assert_array_equal(
        tree["decoder"]["output_transform"]["kernel"], w)
    # backbone keys intact
    got = tree["backbone"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(
        got, np.asarray(bp["backbone"]["embeddings"]["word_embeddings"]["embedding"]))


def test_predict_on_list_and_loader(stack):
    backbone, decoder, bp, dp = stack
    infer = HG38Inference(backbone, decoder, bp, dp, max_length=MAX_LEN)
    logits = infer.predict_on_list(["ACGTACGTAC", "TTGACANNAC"])
    assert logits.shape == (2, D_OUT)
    assert np.all(np.isfinite(logits))

    # loader protocol: iterable of (x, y) batches
    rng = np.random.default_rng(0)
    xs = rng.integers(7, 11, size=(6, MAX_LEN)).astype(np.int32)
    ys = rng.integers(0, D_OUT, size=(6,)).astype(np.int32)
    loader = [(xs[:4], ys[:4]), (xs[4:], ys[4:])]
    preds, labels = infer.predict_from_loader(loader)
    assert preds.shape == (6,)
    np.testing.assert_array_equal(labels, ys)

    # pooled-head determinism: same sequence twice -> same logits
    l2 = infer.predict_on_list(["ACGTACGTAC"])
    np.testing.assert_allclose(logits[0], l2[0], rtol=1e-5, atol=1e-5)
