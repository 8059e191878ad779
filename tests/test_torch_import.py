"""Torch-checkpoint importer tests: construct a reference-layout state dict,
convert, and verify it reproduces the flax tree exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.utils.torch_import import convert_state_dict


def _flax_to_torch_sd(params, prefix="model."):
    """Reverse-map our params into the reference's torch key/value layout
    (the exact inverse of convert_state_dict) to use as test input."""
    flat = traverse_util.flatten_dict(params)
    sd = {}
    for path, val in flat.items():
        val = np.asarray(val)
        key = "/".join(path)
        tkey = None
        if key.endswith("word_embeddings/embedding"):
            tkey, tval = "backbone.embeddings.word_embeddings.weight", val
        elif "norm" in key or "ln_f" in key:
            base = key.replace("/scale", ".weight").replace("/bias", ".bias")
            tkey, tval = base.replace("/", "."), val
        elif key.endswith("in_proj/kernel") or key.endswith("out_proj/kernel"):
            tkey, tval = key.replace("/kernel", ".weight").replace("/", "."), val.T
        elif key.endswith("in_proj/bias") or key.endswith("out_proj/bias"):
            tkey, tval = key.replace("/", "."), val
        elif key.endswith("short_filter_weight"):
            tkey = key.replace("short_filter_weight", "short_filter.weight").replace("/", ".")
            tval = val[:, None, :]
        elif key.endswith("short_filter_bias"):
            tkey = key.replace("short_filter_bias", "short_filter.bias").replace("/", ".")
            tval = val
        elif key.endswith("filter_fn/bias"):
            tkey, tval = key.replace("/", "."), val
        elif key.endswith("filter_fn/pos_emb_z"):
            tkey = key.replace("pos_emb_z", "pos_emb.z").replace("/", ".")
            tval = val
        elif key.endswith("filter_fn/deltas"):
            tkey = key.replace("deltas", "modulation.deltas").replace("/", ".")
            tval = val
        elif key.endswith("filter_fn/freq"):
            # shared Sin appears at odd indices 1,3,5
            for idx in (1, 3, 5):
                sd[prefix + key.replace("freq", f"implicit_filter.{idx}.freq").replace("/", ".")] = val
            continue
        elif "filter_fn/mlp_in/" in key:
            leaf = "weight" if key.endswith("kernel") else "bias"
            tkey = key.replace("mlp_in/kernel", "implicit_filter.0.weight").replace(
                "mlp_in/bias", "implicit_filter.0.bias").replace("/", ".")
            tval = val.T if leaf == "weight" else val
        elif "filter_fn/mlp_inner_" in key:
            j = int(key.split("mlp_inner_")[1].split("/")[0])
            leaf = "weight" if key.endswith("kernel") else "bias"
            idx = 2 * (j + 1)
            tkey = key.replace(f"mlp_inner_{j}/kernel", f"implicit_filter.{idx}.weight").replace(
                f"mlp_inner_{j}/bias", f"implicit_filter.{idx}.bias").replace("/", ".")
            tval = val.T if leaf == "weight" else val
        elif "filter_fn/mlp_out" in key:
            tkey = key.replace("mlp_out/kernel", "implicit_filter.6.weight").replace("/", ".")
            tval = val.T
        elif "mlp/fc" in key:
            leaf = "weight" if key.endswith("kernel") else "bias"
            tkey = key.replace("/kernel", ".weight").replace("/bias", ".bias").replace("/", ".")
            tkey = tkey.replace("mlp.fc", "mlp.fc")
            tval = val.T if leaf == "weight" else val
        else:
            raise KeyError(f"unhandled flax key in reverse map: {key}")
        sd[prefix + tkey.replace("layers_", "layers.")] = tval
    # artifacts a real Lightning checkpoint contains
    sd["model.lm_head.weight"] = np.asarray(
        flat[("backbone", "embeddings", "word_embeddings", "embedding")]
    )
    sd["train_torchmetrics.num-tokens.count"] = np.zeros(())
    return sd


def test_roundtrip_state_dict():
    layer = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10)
    model = ConvLMHeadModel(d_model=32, n_layer=2, d_inner=128, vocab_size=12,
                            pad_vocab_size_multiple=8, layer=layer)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]

    sd = _flax_to_torch_sd(params)
    imported = convert_state_dict(sd)

    flat_orig = traverse_util.flatten_dict(params)
    flat_imp = traverse_util.flatten_dict(imported)
    assert set(flat_imp) == set(flat_orig), (
        set(flat_orig) ^ set(flat_imp)
    )
    for path in flat_orig:
        np.testing.assert_array_equal(
            np.asarray(flat_orig[path]), flat_imp[path], err_msg=str(path)
        )


def test_checkpoint_mixer_keys_normalized():
    layer = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10)
    model = ConvLMHeadModel(d_model=32, n_layer=2, d_inner=128, vocab_size=12,
                            pad_vocab_size_multiple=8, layer=layer)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    sd = _flax_to_torch_sd(params)
    # simulate gradient-checkpoint wrapping (`huggingface.py:28-45`)
    sd = {k.replace(".mixer.", ".mixer.layer.") if ".mixer." in k else k: v
          for k, v in sd.items()}
    imported = convert_state_dict(sd)
    flat_imp = traverse_util.flatten_dict(imported)
    flat_orig = traverse_util.flatten_dict(params)
    assert set(flat_imp) == set(flat_orig)


def test_imported_params_run_forward():
    layer = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10)
    model = ConvLMHeadModel(d_model=32, n_layer=2, d_inner=128, vocab_size=12,
                            pad_vocab_size_multiple=8, layer=layer)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    imported = convert_state_dict(_flax_to_torch_sd(params))
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 7, 11, jnp.int32)
    ref, _ = model.apply({"params": params}, x)
    out, _ = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, imported)}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
