"""Smoke tests for the eval/serving CLIs (`hyena_dna_tpu/evals/`):
hg38_inference (fixed-window ppl from a checkpoint, reference
`evals/hg38_inference.py:30-125`) and generate_cli (sampling, reference
GenerationMixin usage). Each drives the real main() end-to-end against a
tiny Orbax checkpoint + tiny fasta."""

import json
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A real Orbax checkpoint holding tiny flagship-shaped params."""
    from hyena_dna_tpu.evals.hg38_inference import build_model
    from hyena_dna_tpu.train.checkpoint import save_checkpoint

    d_model, n_layer, max_length = 32, 1, 64
    model = build_model(d_model, n_layer, max_length)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, max_length), jnp.int32))["params"]
    state = SimpleNamespace(params=params, opt_state={}, step=jnp.asarray(0))
    path = tmp_path_factory.mktemp("ckpt") / "run"
    save_checkpoint(path, state, step=0)
    return str(path), d_model, n_layer, max_length


@pytest.fixture(scope="module")
def tiny_fasta(tmp_path_factory):
    rng = np.random.default_rng(0)
    fa = tmp_path_factory.mktemp("fa") / "g.fa"
    seq = "".join(rng.choice(list("ACGT"), size=4096))
    with open(fa, "w") as f:
        f.write(">chr14\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    return str(fa)


def test_hg38_inference_cli(tiny_ckpt, tiny_fasta, capsys):
    from hyena_dna_tpu.evals.hg38_inference import main

    ckpt, d, nl, L = tiny_ckpt
    result = main([
        "--ckpt", ckpt, "--fasta", tiny_fasta,
        "--max_length", str(L), "--d_model", str(d), "--n_layer", str(nl),
        "--batch_size", "2", "--chr_ranges", "chr14:0-1024",
        "--limit_batches", "2",
    ])
    assert np.isfinite(result["ppl"]) and result["tokens"] > 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["ppl"] == pytest.approx(result["ppl"])


def test_generate_cli(tiny_ckpt, capsys):
    from hyena_dna_tpu.evals.generate_cli import main

    ckpt, d, nl, L = tiny_ckpt
    text = main([
        "--ckpt", ckpt, "--prompt", "ACGT", "--max_new_tokens", "8",
        "--d_model", str(d), "--n_layer", str(nl), "--max_length", str(L),
        "--top_k", "4",
    ])
    assert isinstance(text, str)
    body = text.replace("[BOS]", "").replace("[SEP]", "").replace("[EOS]", "")
    # prompt survives; sampled padded-vocab ids (untrained net) are dropped
    assert body.startswith("ACGT")
    assert set(body) <= set("ACGTN")


def test_generate_cli_recurrent(tiny_ckpt):
    from hyena_dna_tpu.evals.generate_cli import main

    ckpt, d, nl, L = tiny_ckpt
    text = main([
        "--ckpt", ckpt, "--prompt", "ACGT", "--max_new_tokens", "8",
        "--d_model", str(d), "--n_layer", str(nl), "--max_length", str(L),
        "--recurrent", "--n_modes", "24", "--temperature", "0",
    ])
    body = text.replace("[BOS]", "").replace("[SEP]", "").replace("[EOS]", "")
    assert body.startswith("ACGT") and set(body) <= set("ACGTN")


# --------------------------------------------------------------------------
# configs/evals presets (reference /root/reference/configs/evals/*.yaml)
# --------------------------------------------------------------------------


def test_512ksl_preset_builds_model():
    from hyena_dna_tpu.evals.presets import (build_model_from_preset,
                                             load_eval_preset)

    cfg = load_eval_preset("hyena_dna_512ksl")
    model = build_model_from_preset(cfg["model"])
    assert model.d_model == 256 and model.n_layer == 8
    assert model.d_inner == 1024  # NOT 4*d_model — the preset's whole point
    assert model.checkpoint_mixer and model.checkpoint_mlp
    assert model.layer["emb_dim"] == 33 and model.layer["modulate"] is False


@pytest.mark.parametrize("name,mode,n_soft,lr", [
    ("soft_prompting_genomics", "soft_prompting", 16, 1e-3),
    ("instruction_tuned_genomics", "instruction_tuned", 16, 1e-4),
])
def test_icl_presets_feed_cli_args(name, mode, n_soft, lr):
    from hyena_dna_tpu.evals.presets import (apply_icl_preset,
                                             load_eval_preset)

    args = SimpleNamespace(mode="soft_prompting", lr=None, steps=500,
                           n_soft=16, dataset_name="x", shots=0,
                           max_length=0, batch_size=0)
    apply_icl_preset(args, load_eval_preset(name), explicit={"steps"})
    assert args.mode == mode
    assert args.lr == lr
    assert args.shots == 2 and args.max_length == 256
    assert args.batch_size == 16
    assert args.dataset_name == "human_nontata_promoters"
    if mode == "soft_prompting":
        assert args.n_soft == n_soft
