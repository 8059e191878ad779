"""Training-stack tests: metrics math, optimizer grouping, schedules,
grad-accumulation equivalence, end-to-end loss descent, and a sharded
multi-device train step on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from hyena_dna_tpu.models import ConvLMHeadModel
from hyena_dna_tpu.parallel import make_mesh, shard_params
from hyena_dna_tpu.tasks import LMTask, HG38Task
from hyena_dna_tpu.tasks import metrics as M
from hyena_dna_tpu.train import build_optimizer, create_train_state, label_params
from hyena_dna_tpu.train.optim import timm_cosine
from hyena_dna_tpu.train.step import make_eval_step, make_train_step
from hyena_dna_tpu.data.loader import shard_batch

LAYER_CFG = dict(_name_="hyena", emb_dim=5, filter_order=16, l_max=66, w=10)


def tiny_model(l_max=66):
    cfg = dict(LAYER_CFG, l_max=l_max)
    return ConvLMHeadModel(
        d_model=16, n_layer=2, d_inner=64, vocab_size=12,
        pad_vocab_size_multiple=8, layer=cfg, embed_dropout=0.1,
    )


def make_state(model, seed=0, lr=1e-3, accum_batch=None, **opt_kw):
    rng = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1, 64), jnp.int32)
    params = model.init(rng, sample)["params"]
    tx, _ = build_optimizer(params, lr=lr, **opt_kw)
    return create_train_state(model, tx, rng, sample, params=params)


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------


def test_cross_entropy_matches_torch_semantics():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 8, 12)).astype(np.float32)
    y = rng.integers(0, 12, size=(4, 8))
    y[0, :3] = -100  # ignore index
    ours = float(M.cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    theirs = float(
        F.cross_entropy(
            torch.tensor(logits).view(-1, 12), torch.tensor(y).view(-1), ignore_index=-100
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_stats_consistent():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 16, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 12, size=(2, 16)))
    nll, cnt = M.cross_entropy_stats(logits, y)
    assert cnt == 32
    assert abs(float(nll / cnt) - float(M.cross_entropy(logits, y))) < 1e-6


def test_accuracy_and_topk():
    logits = jnp.asarray([[3.0, 1.0, 0.0], [0.0, 2.0, 1.0]])
    y = jnp.asarray([0, 2])
    assert float(M.accuracy(logits, y)) == 0.5
    assert float(M.accuracy_at_k(logits, y, k=2)) == 1.0


def test_host_metrics_match_sklearn():
    from sklearn.metrics import matthews_corrcoef

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(64, 2))
    y = rng.integers(0, 2, size=64)
    assert M.mcc(logits, y) == matthews_corrcoef(y, logits.argmax(-1))
    assert 0 <= M.roc_auc_macro(logits, y) <= 1


def test_streaming_host_metrics_match_sklearn_multiclass():
    """StreamingHostMetrics (sufficient statistics) vs sklearn on the full
    gathered arrays: mcc/f1 exact (confusion-based), AUC within the binning
    tolerance (8192 bins)."""
    from sklearn.metrics import f1_score, matthews_corrcoef, roc_auc_score

    rng = np.random.default_rng(7)
    names = ["mcc", "f1_binary", "f1_macro", "f1_micro", "roc_auc_macro"]
    s = M.StreamingHostMetrics(names)
    all_logits, all_y = [], []
    for _ in range(5):  # batches stream in
        logits = rng.normal(size=(64, 2))
        y = rng.integers(0, 2, size=64)
        s.update(logits, y)
        all_logits.append(logits)
        all_y.append(y)
    logits = np.concatenate(all_logits)
    y = np.concatenate(all_y)
    out = s.compute()
    pred = logits.argmax(-1)
    assert out["mcc"] == pytest.approx(matthews_corrcoef(y, pred), abs=1e-12)
    assert out["f1_binary"] == pytest.approx(
        f1_score(y, pred, average="binary"), abs=1e-12)
    assert out["f1_macro"] == pytest.approx(
        f1_score(y, pred, average="macro"), abs=1e-12)
    assert out["f1_micro"] == pytest.approx(
        f1_score(y, pred, average="micro"), abs=1e-12)
    probs = M._softmax_np(logits)[:, 1]
    assert out["roc_auc_macro"] == pytest.approx(
        roc_auc_score(y, probs), abs=1e-3)
    cm = s.confusion_matrix
    assert cm is not None and cm.sum() == len(y)


def test_streaming_host_metrics_multilabel_auroc():
    """Multilabel layout (chromatin-profile shape): per-class AUROC macro +
    median vs sklearn per-class scores; f1_macro at threshold 0.5."""
    from sklearn.metrics import f1_score, roc_auc_score

    rng = np.random.default_rng(11)
    C = 7
    s = M.StreamingHostMetrics(["auroc_macro", "auroc_median", "f1_macro"])
    all_logits, all_y = [], []
    for _ in range(4):
        y = rng.integers(0, 2, size=(50, C))
        logits = rng.normal(size=(50, C)) + 1.5 * y  # informative scores
        s.update(logits, y)
        all_logits.append(logits)
        all_y.append(y)
    logits = np.concatenate(all_logits)
    y = np.concatenate(all_y)
    out = s.compute()
    probs = 1.0 / (1.0 + np.exp(-logits))
    per_class = np.array([roc_auc_score(y[:, c], probs[:, c])
                          for c in range(C)])
    assert out["auroc_macro"] == pytest.approx(per_class.mean(), abs=1e-3)
    assert out["auroc_median"] == pytest.approx(np.median(per_class), abs=2e-3)
    ref_f1 = f1_score(y, probs > 0.5, average="macro", zero_division=0)
    assert out["f1_macro"] == pytest.approx(ref_f1, abs=1e-12)
    assert s.confusion_matrix is None  # no C×C matrix in multilabel mode


def test_last_k_ppl_and_per_token():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 8, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 12, size=(2, 8)))
    full = M.last_k_ppl(logits.reshape(-1, 12), y.reshape(-1), seq_len=8, k=None)
    assert float(full) > 0
    per = M.per_token_ppl(logits.reshape(-1, 12), y.reshape(-1), seq_len=8, ks=[1, 8])
    assert per.shape == (2,)


# --------------------------------------------------------------------------
# optimizer grouping / schedules
# --------------------------------------------------------------------------


def test_param_labels_cover_filter_groups():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
    labels = traverse_util.flatten_dict(label_params(params))
    values = set(labels.values())
    assert {"main", "no_decay", "filter", "pos_emb", "modulation"} <= values
    for path, lab in labels.items():
        joined = "/".join(path)
        if "filter_fn" in path and path[-1] == "pos_emb_z":
            assert lab == "pos_emb", joined
        if "filter_fn" in path and path[-1] == "deltas":
            assert lab == "modulation", joined
        if "filter_fn" in path and "mlp" in joined:
            assert lab == "filter", joined
        if "filter_fn" in path and path[-1] == "freq":
            # reference trains Sin.freq at the filter lr/wd (hyena.py:224-227)
            assert lab == "filter", joined
        if path[-1] == "kernel" and "filter_fn" not in path:
            assert lab == "main", joined


def test_frozen_groups_get_zero_updates():
    model = tiny_model()
    state = make_state(model, lr_pos_emb=0.0, modulation_lr=0.0)
    step = make_train_step(LMTask())
    x = jnp.ones((2, 64), jnp.int32)
    y = jnp.ones((2, 64), jnp.int32)
    before = jax.tree_util.tree_map(np.array, state.params)
    state2, _ = step(state, (x, y), jax.random.PRNGKey(1))
    flat_b = traverse_util.flatten_dict(before)
    flat_a = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, state2.params))
    for path in flat_b:
        if path[-1] in ("pos_emb_z", "deltas"):
            np.testing.assert_array_equal(flat_b[path], flat_a[path])
        if path[-1] == "kernel" and "backbone" in path:
            assert not np.array_equal(flat_b[path], flat_a[path])


def test_timm_cosine_schedule_shape():
    s = timm_cosine(6e-4, t_initial=1000, lr_min=6e-5, warmup_t=100, warmup_lr_init=1e-6)
    assert float(s(0)) == pytest.approx(1e-6)
    assert float(s(100)) == pytest.approx(6e-4, rel=1e-3)
    assert float(s(1000)) == pytest.approx(6e-5, rel=1e-3)
    assert float(s(50)) < 6e-4


# --------------------------------------------------------------------------
# train step
# --------------------------------------------------------------------------


def _rand_batch(rng, b=4, l=64):
    x = jnp.asarray(rng.integers(7, 11, size=(b, l)), jnp.int32)
    return x, jnp.roll(x, -1, axis=1)


def test_loss_decreases():
    model = tiny_model()
    state = make_state(model, lr=3e-3)
    step = make_train_step(LMTask())
    rng = np.random.default_rng(0)
    # learnable structure: repeated ACGT pattern
    base = jnp.asarray((np.arange(65) % 4) + 7, jnp.int32)
    x = jnp.tile(base[:64], (8, 1))
    y = jnp.tile(base[1:65], (8, 1))
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, (x, y), sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert np.isfinite(losses).all()


def test_grad_accum_equivalence():
    model = tiny_model()
    s1 = make_state(model, seed=3)
    s2 = make_state(model, seed=3)
    rng = np.random.default_rng(5)
    x, y = _rand_batch(rng, b=8)
    key = jax.random.PRNGKey(7)

    step1 = make_train_step(LMTask(), accumulate_grad_batches=1)
    # dropout rngs differ between the two paths; use deterministic-friendly
    # comparison by zeroing dropout via a model without dropout
    model_nd = ConvLMHeadModel(
        d_model=16, n_layer=2, d_inner=64, vocab_size=12,
        pad_vocab_size_multiple=8, layer=dict(LAYER_CFG), embed_dropout=0.0,
    )
    s1 = make_state(model_nd, seed=3)
    s2 = make_state(model_nd, seed=3)
    step1 = make_train_step(LMTask(), accumulate_grad_batches=1)
    step4 = make_train_step(LMTask(), accumulate_grad_batches=4)
    out1, m1 = step1(s1, (x, y), key)
    out4, m4 = step4(s2, (x, y), key)
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-5
    flat1 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, out1.params))
    flat4 = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, out4.params))
    for path in flat1:
        np.testing.assert_allclose(flat1[path], flat4[path], atol=2e-5, err_msg=str(path))


def test_eval_step_metrics():
    model = tiny_model()
    state = make_state(model)
    task = HG38Task(metrics=["accuracy"], last_k_ppl=8, seq_len=64)
    estep = make_eval_step(task)
    rng = np.random.default_rng(11)
    m = estep(state, _rand_batch(rng))
    assert set(m) >= {"loss", "accuracy", "last_k_ppl", "nll_sum", "token_count"}
    assert np.isfinite(float(m["loss"]))


# --------------------------------------------------------------------------
# sharded multi-device step
# --------------------------------------------------------------------------


def test_sharded_train_step_8dev():
    assert jax.device_count() == 8
    mesh = make_mesh(data=2, seq=1, model=4)
    model = tiny_model()
    state = make_state(model)
    state = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=state.tx.init(shard_params(state.params, mesh)),
    )
    step = make_train_step(LMTask())
    rng = np.random.default_rng(13)
    x = np.asarray(rng.integers(7, 11, size=(4, 64)), np.int32)
    y = np.roll(x, -1, axis=1)
    batch = shard_batch((x, y), mesh)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # compare against a replicated single-step run
    state_r = make_state(model)
    step_r = make_train_step(LMTask())
    _, metrics_r = step_r(state_r, (jnp.asarray(x), jnp.asarray(y)), jax.random.PRNGKey(0))
    assert abs(float(metrics["loss"]) - float(metrics_r["loss"])) < 1e-4


def test_launch_helpers_single_process():
    from hyena_dna_tpu.parallel.launch import (
        all_reduce_scalar,
        barrier,
        initialize_distributed,
        is_main_process,
    )

    initialize_distributed()  # no-op single process
    assert is_main_process()
    barrier()
    assert all_reduce_scalar(2.5) == 2.5


def test_multistep_matches_sequential_steps():
    from hyena_dna_tpu.train.step import make_multistep_train_step

    model_nd = ConvLMHeadModel(
        d_model=16, n_layer=2, d_inner=64, vocab_size=12,
        pad_vocab_size_multiple=8, layer=dict(LAYER_CFG), embed_dropout=0.0,
    )
    s_seq = make_state(model_nd, seed=9)
    s_multi = make_state(model_nd, seed=9)

    rng = np.random.default_rng(4)
    batches = [_rand_batch(rng, b=4) for _ in range(4)]
    key = jax.random.PRNGKey(11)

    step = make_train_step(LMTask())
    keys = jax.random.split(key, 4)
    for i, b in enumerate(batches):
        s_seq, m_seq = step(s_seq, b, keys[i])

    mstep = make_multistep_train_step(LMTask(), steps_per_call=4)
    xs = jnp.stack([b[0] for b in batches])
    ys = jnp.stack([b[1] for b in batches])
    s_multi, m_multi = mstep(s_multi, (xs, ys), key)
    assert m_multi["loss"].shape == (4,)
    np.testing.assert_allclose(
        float(m_multi["loss"][-1]), float(m_seq["loss"]), atol=1e-5
    )
    flat_a = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, s_seq.params))
    flat_b = traverse_util.flatten_dict(jax.tree_util.tree_map(np.array, s_multi.params))
    for path in flat_a:
        np.testing.assert_allclose(flat_a[path], flat_b[path], atol=3e-5,
                                   err_msg=str(path))


def test_lamb_matches_reference_semantics():
    """Our optax lamb vs a from-the-equations oracle of the reference's
    JITLamb update (`src/utils/optim/lamb.py:148-167`): no bias correction,
    wd added to the normalized step pre-trust-ratio, weight norm clamped to
    [0, 10], trust ratio 1 where either norm vanishes."""
    from hyena_dna_tpu.train.optim import lamb

    rng = np.random.default_rng(0)
    shapes = [(4, 3), (8,), (2, 2, 2)]
    params = [rng.normal(size=s).astype(np.float32) for s in shapes]
    params.append(np.zeros((3,), np.float32))  # zero weight norm edge case
    lr, b1, b2, eps, wd = 0.02, 0.9, 0.999, 1e-6, 0.01

    # oracle
    ref = [p.copy() for p in params]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    grads_per_step = [
        [rng.normal(size=p.shape).astype(np.float32) for p in params]
        for _ in range(5)
    ]
    for grads in grads_per_step:
        for i, g in enumerate(grads):
            m[i] = b1 * m[i] + (1 - b1) * g
            v[i] = b2 * v[i] + (1 - b2) * g * g
            a = m[i] / (np.sqrt(v[i]) + eps) + wd * ref[i]
            wn = min(np.linalg.norm(ref[i]), 10.0)
            an = np.linalg.norm(a)
            tr = 1.0 if (wn == 0.0 or an == 0.0) else wn / (an + eps)
            ref[i] = ref[i] - lr * tr * a

    # ours
    tx = lamb(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    ours = [jnp.asarray(p) for p in params]
    state = tx.init(ours)
    for grads in grads_per_step:
        updates, state = tx.update([jnp.asarray(g) for g in grads], state, ours)
        ours = jax.tree_util.tree_map(lambda p, u: p + u, ours, updates)

    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=2e-6)


def test_build_optimizer_lamb_and_adam_names():
    """optimizer._name_ plumbing: lamb/adam/adamw all build and step."""
    from hyena_dna_tpu.train.optim import build_optimizer

    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.1), params)
    for name in ("lamb", "adam", "adamw"):
        tx, _ = build_optimizer(params, lr=1e-3, optimizer_name=name)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert float(jnp.abs(new["dense"]["kernel"] - 1.0).max()) > 0


def test_flat_optimizer_matches_tree_form():
    """The flattened (per-group concatenated) adamw path must reproduce the
    tree-form multi_transform + clip_by_global_norm trajectory on a real
    model param tree, including the per-group lrs and the frozen groups."""
    from hyena_dna_tpu.models import ConvLMHeadModel

    layer = dict(_name_="hyena", emb_dim=5, filter_order=16,
                 short_filter_order=3, l_max=128, modulate=True, w=10)
    model = ConvLMHeadModel(d_model=64, n_layer=2, d_inner=128, vocab_size=12,
                            pad_vocab_size_multiple=8, layer=layer)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 128), jnp.int32))["params"]
    kw = dict(lr=1e-3, weight_decay=0.1, gradient_clip_val=0.5,
              scheduler={"_name_": "cosine_warmup_timm", "t_initial": 10,
                         "warmup_t": 2})
    tx_tree, labels_t = build_optimizer(params, flatten=False, **kw)
    tx_flat, labels_f = build_optimizer(params, flatten=True, **kw)
    assert labels_t == labels_f

    rng = np.random.default_rng(7)
    grads_per_step = []
    for _ in range(3):
        flat = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 5.0), params)
        grads_per_step.append(flat)

    def run(tx):
        p = params
        s = tx.init(p)
        for g in grads_per_step:
            u, s = tx.update(g, s, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, u)
        return p

    p_tree = run(tx_tree)
    p_flat = run(tx_flat)
    flat_a = traverse_util.flatten_dict(p_tree)
    flat_b = traverse_util.flatten_dict(p_flat)
    for path in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[path]), np.asarray(flat_b[path]),
            rtol=2e-5, atol=1e-7, err_msg="/".join(path))
    # frozen groups stayed frozen on both paths
    base = traverse_util.flatten_dict(params)
    froz = [p for p, lab in traverse_util.flatten_dict(
        label_params(params)).items() if lab == "modulation"]
    assert froz
    for path in froz:
        np.testing.assert_array_equal(np.asarray(flat_b[path]),
                                      np.asarray(base[path]))
