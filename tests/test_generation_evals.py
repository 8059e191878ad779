"""Generation + ICL-eval tests: sampling correctness on a trained toy LM,
soft prompting and instruction tuning improve over chance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyena_dna_tpu.data.icl import ICLGenomicsDataset
from hyena_dna_tpu.data.loader import DataLoader
from hyena_dna_tpu.evals.instruction_tuned import evaluate as it_evaluate
from hyena_dna_tpu.evals.instruction_tuned import instruction_tune
from hyena_dna_tpu.evals.soft_prompting import (
    SoftPromptModel,
    evaluate_soft_prompt,
    tune_soft_prompt,
)
from hyena_dna_tpu.generation import generate
from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.tasks import LMTask
from hyena_dna_tpu.train import build_optimizer, create_train_state
from hyena_dna_tpu.train.step import make_train_step

LAYER = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10)


def _toy_lm(l_max=66, d_model=32):
    return ConvLMHeadModel(
        d_model=d_model, n_layer=2, d_inner=4 * d_model, vocab_size=12,
        pad_vocab_size_multiple=8, layer=dict(LAYER, l_max=l_max),
        embed_dropout=0.0,
    )


def _train_pattern_lm(model, steps=40, lr=3e-3):
    """Teach the LM the deterministic ACGT cycle."""
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64), jnp.int32)
    params = model.init(rng, sample)["params"]
    tx, _ = build_optimizer(params, lr=lr, weight_decay=0.0)
    state = create_train_state(model, tx, rng, sample, params=params)
    step = make_train_step(LMTask())
    base = jnp.asarray((np.arange(65) % 4) + 7, jnp.int32)
    x = jnp.tile(base[:64], (8, 1))
    y = jnp.tile(base[1:65], (8, 1))
    for i in range(steps):
        state, m = step(state, (x, y), jax.random.PRNGKey(i))
    return state.params


def test_greedy_generation_learns_pattern():
    model = _toy_lm()
    params = _train_pattern_lm(model)
    prompt = jnp.asarray([(np.arange(8) % 4) + 7], jnp.int32)  # A C G T A C G T
    out = generate(model, params, prompt, max_new_tokens=12, temperature=0.0)
    cont = np.asarray(out[0, 8:])
    expected = (np.arange(8, 20) % 4) + 7
    np.testing.assert_array_equal(cont, expected)


def test_sampling_respects_topk_and_shapes():
    model = _toy_lm()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    prompt = jnp.asarray([[7, 8, 9], [10, 7, 8]], jnp.int32)
    out = generate(model, params, prompt, max_new_tokens=5,
                   temperature=0.8, top_k=4, rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(out[:, :3]), np.asarray(prompt))
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 16).all()


@pytest.fixture
def icl_loader(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "toy" / "train"
    # strongly separable: class determined by first 4 characters
    for label, motif in (("neg", "TTTT"), ("pos", "AAAA")):
        d = root / label
        d.mkdir(parents=True)
        for i in range(24):
            tail = "".join(rng.choice(list("ACGT"), size=12))
            (d / f"{i}.txt").write_text(motif + tail)
    ds = ICLGenomicsDataset(
        split="train", shots=0, max_length=16, dataset_name="toy",
        dest_path=str(tmp_path), use_padding=False, add_eos=False,
        label_to_token={0: "T", 1: "A"},
    )
    return DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                      process_index=0, process_count=1)


def test_soft_prompting_grad_flow_and_api(icl_loader):
    """A random-init Hyena is near-local (exponentially modulated filters),
    so distant soft tokens carry a tiny-but-nonzero gradient — absolute
    accuracy only becomes meaningful from a pretrained backbone (as in the
    reference eval). Assert gradient flow, frozen backbone, and the API."""
    import optax

    model = _toy_lm(l_max=40)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))["params"]

    sp = SoftPromptModel(lm=model, n_soft=4, d_model=32)
    batch = next(iter(icl_loader))
    x = jnp.asarray(batch[0])
    y = jnp.asarray(batch[1]).reshape(-1)
    soft_params = sp.init(jax.random.PRNGKey(1), x[:1], params)["params"]

    def loss_fn(spar):
        logits = sp.apply({"params": spar}, x, params)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(soft_params)
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(float(loss)) and gnorm > 0.0

    before = jax.tree_util.tree_map(np.array, params)
    soft, predict = tune_soft_prompt(
        model, params, icl_loader, n_soft=4, d_model=32, lr=3e-2,
        steps=5, log_every=0,
    )
    acc = evaluate_soft_prompt(predict, icl_loader)
    assert 0.0 <= acc <= 1.0
    # backbone untouched
    after = jax.tree_util.tree_map(np.array, params)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_instruction_tuning_beats_chance(icl_loader):
    model = _toy_lm(l_max=40)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))["params"]
    tuned, predict = instruction_tune(
        model, params, icl_loader, lr=3e-3, steps=150, log_every=0
    )
    acc = it_evaluate(predict, icl_loader)
    assert acc > 0.8, acc
