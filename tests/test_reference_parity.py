"""End-to-end parity against the reference's OWN torch implementation.

The per-module oracle tests (`tests/torch_oracle.py`) re-derive the math from
the equations; this file closes the remaining gap by running the reference's
actual dependency-free model file (`/root/reference/standalone_hyenadna.py:45-937`,
the code that loads the published `LongSafari/*` checkpoints per
`/root/reference/huggingface.py:70-127`) in-process on CPU torch, exporting
its randomly-initialized state dict, importing it through
`hyena_dna_tpu.utils.torch_import.convert_state_dict`, and asserting the two
frameworks produce the same hidden states and LM logits on the same tokens.

This is the checkpoint-parity north star minus the (offline-unavailable)
published weight file: every transform the real import will apply is
exercised against the real reference network.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = Path("/root/reference/standalone_hyenadna.py")

TINY_CFG = dict(  # hyenadna-tiny-1k shape (/root/reference/README.md:205,523)
    d_model=128,
    n_layer=2,
    d_inner=512,
    vocab_size=12,
    pad_vocab_size_multiple=8,
    residual_in_fp32=True,
)
# layer config per configs/experiment/hg38/hg38_hyena.yaml; the standalone
# HyenaOperator hardcodes short_filter_order=3 and injects d_model itself.
# shift is explicit because the reference ships two defaults (0.05 in
# standalone_hyenadna.py:140, 0.0 in src/models/sequence/hyena.py:142).
TINY_LAYER = dict(
    emb_dim=5, filter_order=64, l_max=1026, modulate=True, w=10,
    lr=6e-4, wd=0.0, lr_pos_emb=0.0, shift=0.05,
)


@pytest.fixture(scope="module")
def ref_module():
    """Import the reference standalone file with a torchvision stub (only
    StochasticDepth is referenced; p=0 in every DNA config => identity)."""
    if not REF.exists():
        pytest.skip("reference tree not available")
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.__spec__ = importlib.machinery.ModuleSpec("torchvision.ops", None)

        class StochasticDepth(torch.nn.Module):
            def __init__(self, p: float, mode: str):
                super().__init__()
                assert p == 0.0, "stub only supports p=0"

            def forward(self, x):
                return x

        tv_ops.StochasticDepth = StochasticDepth
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    spec = importlib.util.spec_from_file_location("standalone_hyenadna", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_model(ref_module):
    torch.manual_seed(0)
    model = ref_module.HyenaDNAModel(layer=dict(TINY_LAYER), use_head=False,
                                     **TINY_CFG)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return rng.integers(7, 11, size=(2, 1024), dtype=np.int64)  # A/C/G/T ids


@pytest.fixture(scope="module")
def imported_params(torch_model):
    from hyena_dna_tpu.utils.torch_import import convert_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    return convert_state_dict(sd)


def test_backbone_hidden_state_parity(torch_model, imported_params, tokens):
    from hyena_dna_tpu.pretrained import HyenaDNAModel

    with torch.inference_mode():
        ref_hidden = torch_model(torch.from_numpy(tokens)).numpy()

    model = HyenaDNAModel(use_head=False, dtype=jnp.float32, **TINY_CFG,
                          layer=dict(_name_="hyena", short_filter_order=3,
                                     **TINY_LAYER))
    ours = model.apply({"params": {"model": imported_params}},
                       jnp.asarray(tokens), deterministic=True)
    ours = np.asarray(ours, np.float32)
    assert ours.shape == ref_hidden.shape
    np.testing.assert_allclose(ours, ref_hidden, rtol=2e-4, atol=2e-4)


def test_lm_logit_parity(torch_model, imported_params, tokens):
    """Full ConvLMHeadModel logits vs the reference's weight-tied head
    (logits = hidden @ E^T; `long_conv_lm.py:482-500`)."""
    from hyena_dna_tpu.models import ConvLMHeadModel

    with torch.inference_mode():
        hidden = torch_model(torch.from_numpy(tokens))
        emb = torch_model.backbone.embeddings.word_embeddings.weight
        ref_logits = (hidden @ emb.T).numpy()

    model = ConvLMHeadModel(layer=dict(_name_="hyena", short_filter_order=3,
                                       **TINY_LAYER),
                            dtype=jnp.float32, **TINY_CFG)
    logits, _ = model.apply({"params": imported_params}, jnp.asarray(tokens),
                            deterministic=True)
    logits = np.asarray(logits, np.float32)
    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)

    # perplexity parity on next-token prediction (the BASELINE metric)
    def ppl(lg):
        lg = torch.from_numpy(np.asarray(lg, np.float32))
        tgt = torch.from_numpy(tokens[:, 1:])
        lp = torch.log_softmax(lg[:, :-1], dim=-1)
        nll = -lp.gather(-1, tgt[..., None]).mean()
        return float(torch.exp(nll))

    assert abs(ppl(logits) - ppl(ref_logits)) < 1e-3


def test_classification_head_parity(ref_module, tokens):
    """use_head=True: pooled SequenceDecoder head
    (`standalone_hyenadna.py:750-905`) vs our `pretrained.HyenaDNAModel`."""
    from hyena_dna_tpu.pretrained import HyenaDNAModel
    from hyena_dna_tpu.utils.torch_import import convert_state_dict

    torch.manual_seed(1)
    tmodel = ref_module.HyenaDNAModel(layer=dict(TINY_LAYER), use_head=True,
                                      n_classes=5, **TINY_CFG)
    tmodel.eval()
    with torch.inference_mode():
        ref_out = tmodel(torch.from_numpy(tokens)).numpy()

    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    conv = convert_state_dict(sd)
    params = {"model": {k: v for k, v in conv.items() if k != "head"},
              "head": conv["head"]}
    model = HyenaDNAModel(use_head=True, n_classes=5, dtype=jnp.float32,
                          **TINY_CFG,
                          layer=dict(_name_="hyena", short_filter_order=3,
                                     **TINY_LAYER))
    ours = model.apply({"params": params}, jnp.asarray(tokens),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours, np.float32), ref_out,
                               rtol=2e-4, atol=2e-4)


def test_attention_layer_parity(ref_module, tokens):
    """Mixed Hyena+MHA stack (attn_layer_idx) vs the standalone's MHA
    (`standalone_hyenadna.py:349-430`)."""
    from hyena_dna_tpu.pretrained import HyenaDNAModel
    from hyena_dna_tpu.utils.torch_import import convert_state_dict

    torch.manual_seed(2)
    attn_cfg = dict(num_heads=4, dropout=0.0)
    # the standalone's Block calls `mixer_cls()` with no positional arg
    # (`standalone_hyenadna.py:500`), so embed_dim must ride in attn_cfg —
    # the reference's own attention path is otherwise unconstructible there
    tmodel = ref_module.HyenaDNAModel(layer=dict(TINY_LAYER), use_head=False,
                                      attn_layer_idx=[1],
                                      attn_cfg=dict(embed_dim=TINY_CFG["d_model"],
                                                    **attn_cfg), **TINY_CFG)
    tmodel.eval()
    with torch.inference_mode():
        ref_hidden = tmodel(torch.from_numpy(tokens)).numpy()

    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(sd)
    model = HyenaDNAModel(use_head=False, dtype=jnp.float32, **TINY_CFG,
                          attn_layer_idx=(1,), attn_cfg=dict(attn_cfg),
                          layer=dict(_name_="hyena", short_filter_order=3,
                                     **TINY_LAYER))
    ours = model.apply({"params": {"model": params}}, jnp.asarray(tokens),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours, np.float32), ref_hidden,
                               rtol=2e-4, atol=2e-4)


def test_longer_than_lmax_uses_filter_slice(torch_model, imported_params,
                                            ref_module):
    """Reference slices the filter to min(l, l_max) (`hyena.py:389-390`);
    check our operator matches on an input at exactly l_max boundary."""
    from hyena_dna_tpu.pretrained import HyenaDNAModel

    rng = np.random.default_rng(1)
    toks = rng.integers(7, 11, size=(1, 512), dtype=np.int64)
    with torch.inference_mode():
        ref_hidden = torch_model(torch.from_numpy(toks)).numpy()
    model = HyenaDNAModel(use_head=False, dtype=jnp.float32, **TINY_CFG,
                          layer=dict(_name_="hyena", short_filter_order=3,
                                     **TINY_LAYER))
    ours = model.apply({"params": {"model": imported_params}},
                       jnp.asarray(toks), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours, np.float32), ref_hidden,
                               rtol=2e-4, atol=2e-4)
