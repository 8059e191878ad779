"""from_pretrained surface: load a LongSafari-layout directory (config.json +
torch weights.ckpt) and verify backbone parity + head wiring."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hyena_dna_tpu.models import DNAEmbeddingModel
from hyena_dna_tpu.pretrained import HyenaDNAModel, from_pretrained
from tests.test_torch_import import _flax_to_torch_sd

CONFIG = {
    "d_model": 32,
    "n_layer": 2,
    "d_inner": 128,
    "vocab_size": 12,
    "resid_dropout": 0.0,
    "embed_dropout": 0.1,
    "layer_norm_epsilon": 1e-5,
    "pad_vocab_size_multiple": 8,
    "residual_in_fp32": True,
    # shift explicit: from_pretrained defaults it to 0.05 (the
    # standalone_hyenadna.py loader default) when absent
    "layer": {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
              "short_filter_order": 3, "l_max": 66, "modulate": True,
              "w": 10, "lr": 6e-4, "wd": 0.0, "lr_pos_emb": 0.0,
              "shift": 0.05},
}


@pytest.fixture
def fake_longsafari_dir(tmp_path):
    model = DNAEmbeddingModel(
        **{k: v for k, v in CONFIG.items() if k != "layer"}, layer=dict(CONFIG["layer"])
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    sd = _flax_to_torch_sd(params)  # keys: model.backbone...
    d = tmp_path / "hyenadna-tiny"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(CONFIG))
    torch.save({"state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}},
               d / "weights.ckpt")
    return d, model, params


def test_from_pretrained_backbone_parity(fake_longsafari_dir):
    d, ref_model, ref_params = fake_longsafari_dir
    model, params, tok = from_pretrained(d)
    assert tok.vocab_size == 12
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 7, 11, jnp.int32)
    hidden = model.apply({"params": params}, x)
    ref_hidden, _ = ref_model.apply({"params": ref_params}, x)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden), atol=1e-6)


def test_from_pretrained_with_head(fake_longsafari_dir):
    d, _, _ = fake_longsafari_dir
    model, params, _ = from_pretrained(d, use_head=True, n_classes=5)
    x = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 7, 11, jnp.int32)
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 5)
