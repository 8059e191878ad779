"""Pin the recurrent stepper's distillation drift on a TRAINED checkpoint.

`tests/golden/recurrent_drift.npz` holds a synthetic-hg38 pretrain at the
reference recipe (d=128, n=2, L=1024 — runs/drift_f32) plus held-out
chr4-tail windows. The modal-distilled O(1)/token stepper must match the
parallel forward's held-out perplexity to within 0.1% at P=64 (the full
sweep — P=16..128, drift -0.058%..-0.00002% — is in
artifacts/recurrent_drift.json, measured by scripts/bench_recurrent.py).

The reference leaves recurrence unimplemented (`hyena.py:384-386`), so this
capability has no reference analog to compare against.
"""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

GOLDEN = Path(__file__).parent / "golden" / "recurrent_drift.npz"


def _load():
    from flax import traverse_util

    z = np.load(GOLDEN)
    flat = {tuple(k[3:].split("/")): z[k] for k in z.files if k.startswith("p::")}
    return z["tokens"], traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat.items()})


def _ppl(logits, targets):
    lg = np.asarray(logits, np.float64)
    lg = lg - lg.max(-1, keepdims=True)
    lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    nll = -np.take_along_axis(lp, targets[..., None], axis=-1)
    return float(np.exp(nll.mean()))


def test_trained_checkpoint_distillation_drift():
    from hyena_dna_tpu.models import ConvLMHeadModel
    from hyena_dna_tpu.recurrent import distill

    assert GOLDEN.exists(), "run scripts/bench_recurrent.py export first"
    tokens, params = _load()
    x, y = tokens[:, :-1], tokens[:, 1:]

    model = ConvLMHeadModel(
        d_model=128, n_layer=2, d_inner=512, vocab_size=12,
        pad_vocab_size_multiple=8, residual_in_fp32=True,
        layer=dict(_name_="hyena", emb_dim=5, filter_order=64,
                   short_filter_order=3, l_max=1026, modulate=True, w=10),
        dtype=jnp.float32)
    logits_par, _ = model.apply({"params": params}, jnp.asarray(x),
                                deterministic=True)
    ppl_par = _ppl(logits_par, y)
    assert 2.0 < ppl_par < 4.2  # a trained model, below the 4.64 uniform-12pad floor

    rec = distill(model, params, n_modes=64)
    assert rec.fit_rel_err < 0.15

    @jax.jit
    def all_logits(rec, toks):
        def body(st, col):
            st, lg = rec.step(st, col)
            return st, lg
        _, lgs = jax.lax.scan(body, rec.init_state(toks.shape[0]),
                              jnp.swapaxes(toks, 0, 1))
        return jnp.swapaxes(lgs, 0, 1)

    ppl_rec = _ppl(all_logits(rec, jnp.asarray(x)), y)
    assert abs(ppl_rec - ppl_par) / ppl_par < 1e-3  # <0.1% drift at P=64
