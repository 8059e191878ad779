"""Recurrent (modal-distilled) generation vs the parallel forward.

The reference never implemented Hyena recurrence (`hyena.py:433-435`); this
validates ours end-to-end: per-position logits from the token-by-token
stepper must track the full parallel forward within the modal fit error,
and greedy generation must produce identical tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.ops.modal import fit_modal_filters, modal_reconstruction
from hyena_dna_tpu.recurrent import distill

L = 128


@pytest.fixture(scope="module")
def model_and_params():
    layer = dict(_name_="hyena", emb_dim=5, filter_order=32, l_max=L, w=10,
                 modulate=True)
    model = ConvLMHeadModel(d_model=24, n_layer=2, d_inner=96, vocab_size=12,
                            pad_vocab_size_multiple=8, layer=layer,
                            embed_dropout=0.0, residual_in_fp32=True)
    x = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_modal_fit_quality():
    rng = np.random.default_rng(0)
    t = np.arange(256)
    k = np.stack([
        np.exp(-t / 30.0) * np.cos(0.2 * t),
        np.exp(-t / 80.0) * (np.sin(0.05 * t) + 0.3 * np.cos(0.4 * t)),
    ])
    lam, c = fit_modal_filters(k, 16)
    rec = modal_reconstruction(lam, c, 256)
    assert np.abs(rec - k).max() / np.abs(k).max() < 1e-6
    assert np.abs(lam).max() <= 1.0 + 1e-6  # stability clip


def test_recurrent_logits_match_parallel(model_and_params):
    model, params = model_and_params
    rec = distill(model, params, n_modes=48, fit_len=L)
    assert rec.fit_rel_err < 2e-2, rec.fit_rel_err

    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(7, 11, size=(2, 48)), jnp.int32)
    ref_logits, _ = model.apply({"params": params}, toks)

    state = rec.init_state(2)

    def body(st, tok):
        st, lg = rec.step(st, tok)
        return st, lg

    _, logits = jax.lax.scan(body, state, jnp.swapaxes(toks, 0, 1))
    logits = jnp.swapaxes(logits, 0, 1)  # (B, T, V)

    scale = float(jnp.abs(ref_logits).max())
    err = float(jnp.abs(logits - ref_logits).max()) / scale
    assert err < 5e-2, err
    # argmax (greedy next-token) must agree everywhere
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                  np.asarray(jnp.argmax(ref_logits, -1)))


def test_recurrent_generate_matches_full_forward(model_and_params):
    """Greedy tokens from the O(1) stepper == greedy tokens from repeated
    full forwards (the generation.py style)."""
    model, params = model_and_params
    rec = distill(model, params, n_modes=48, fit_len=L)
    prompt = jnp.asarray([[7, 8, 9, 10, 7, 8]], jnp.int32)
    n_new = 16

    out = rec.generate(prompt, n_new)
    assert out.shape == (1, prompt.shape[1] + n_new)

    # reference: greedy with full re-forward each step
    buf = prompt
    for _ in range(n_new):
        logits, _ = model.apply({"params": params}, buf)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(buf.dtype)
        buf = jnp.concatenate([buf, nxt[:, None]], axis=1)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(buf))


def test_parallel_prefill_matches_scan(model_and_params):
    """Closed-form O(T log T) prefill state == sequential-scan state."""
    model, params = model_and_params
    rec = distill(model, params, n_modes=48, fit_len=L)
    toks = jnp.asarray(
        np.random.default_rng(3).integers(7, 11, size=(2, 48)), jnp.int32)
    st_scan, lg_scan = rec.prefill(rec.init_state(2), toks)
    st_par, lg_par = rec.prefill_parallel(rec.init_state(2), toks)
    for i in range(rec.n_layer):
        for key in ("sc", "s"):
            a = np.asarray(st_scan["layers"][i][key])
            b = np.asarray(st_par["layers"][i][key])
            err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert err < 1e-4, (i, key, err)
    lerr = float(jnp.abs(lg_scan - lg_par).max() /
                 (jnp.abs(lg_scan).max() + 1e-9))
    assert lerr < 1e-4, lerr
    # and the generated continuations agree greedily
    g_scan = rec.generate(toks, 8, parallel_prefill=False)
    g_par = rec.generate(toks, 8, parallel_prefill=True)
    assert np.array_equal(np.asarray(g_scan), np.asarray(g_par))
