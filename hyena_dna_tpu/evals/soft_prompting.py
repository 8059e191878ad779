"""Soft-prompting ICL eval: splice trainable soft tokens into the embedded
prompt and tune ONLY those.

Parity target: `/root/reference/evals/soft_prompting_genomics.py:29-390` —
load a pretrained LM, prepend `n_tunable_tokens` learnable embedding vectors
to each (k-shot) prompt's embedding, freeze every pretrained weight, train
the soft tokens on the ICL task, then measure label-token accuracy.

TPU design: the pretrained params are a frozen closure input; the optimizer
state covers only the (n_soft, d_model) soft matrix, so each train step
differentiates a single small leaf (XLA drops the unused backbone grads).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as fnn


class SoftPromptModel(fnn.Module):
    """Wrap a ConvLMHeadModel: logits = lm([soft_tokens; embed(ids)])."""

    lm: fnn.Module  # ConvLMHeadModel
    n_soft: int
    d_model: int
    init_std: float = 0.02

    @fnn.compact
    def __call__(self, input_ids: jax.Array, lm_params, deterministic: bool = True):
        soft = self.param(
            "soft_tokens",
            fnn.initializers.normal(stddev=self.init_std),
            (self.n_soft, self.d_model),
        )
        # embed with the frozen LM's embedding table
        embeds = self.lm.apply(
            {"params": lm_params},
            input_ids,
            method=lambda m, ids: m.backbone.embeddings(ids),
        )
        b = embeds.shape[0]
        soft_b = jnp.broadcast_to(soft[None], (b, self.n_soft, self.d_model))
        full = jnp.concatenate([soft_b.astype(embeds.dtype), embeds], axis=1)
        logits, _ = self.lm.apply(
            {"params": lm_params},
            input_ids,  # ignored given inputs_embeds
            deterministic=deterministic,
            inputs_embeds=full,
        )
        return logits  # (B, n_soft + L, V)


def tune_soft_prompt(
    lm,
    lm_params,
    train_loader,
    *,
    n_soft: int = 16,
    d_model: int,
    lr: float = 1e-3,
    steps: int = 200,
    rng: Optional[jax.Array] = None,
    log_every: int = 50,
) -> Tuple[Dict, Callable]:
    """Train soft tokens on (prompt_ids, label_token) batches.

    The loss is cross-entropy of the LAST position's logits against the
    label token (the ICL dataset places the answer right after the prompt).
    Returns (soft_params, predict_fn).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = SoftPromptModel(lm=lm, n_soft=n_soft, d_model=d_model)

    first = next(iter(train_loader))
    x0 = jnp.asarray(first[0][:1])
    variables = model.init(rng, x0, lm_params)
    soft_params = variables["params"]

    tx = optax.adamw(lr)
    opt_state = tx.init(soft_params)

    @jax.jit
    def step(soft_params, opt_state, x, y):
        def loss_fn(sp):
            logits = model.apply({"params": sp}, x, lm_params)
            last = logits[:, -1].astype(jnp.float32)
            logp = jax.nn.log_softmax(last, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y.reshape(-1, 1), axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(soft_params)
        updates, opt_state = tx.update(grads, opt_state, soft_params)
        return optax.apply_updates(soft_params, updates), opt_state, loss

    it, done = iter(train_loader), 0
    while done < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            continue
        x = jnp.asarray(batch[0])
        y = jnp.asarray(batch[1]).reshape(-1)
        soft_params, opt_state, loss = step(soft_params, opt_state, x, y)
        done += 1
        if log_every and done % log_every == 0:
            print(f"[soft-prompt step {done}] loss={float(loss):.4f}", flush=True)

    @jax.jit
    def predict(x):
        logits = model.apply({"params": soft_params}, x, lm_params)
        return jnp.argmax(logits[:, -1], axis=-1)

    return soft_params, predict


def evaluate_soft_prompt(predict_fn, loader) -> float:
    """Label-token accuracy over a loader of (prompt, label) batches."""
    correct = total = 0
    for batch in loader:
        preds = np.asarray(predict_fn(jnp.asarray(batch[0])))
        y = np.asarray(batch[1]).reshape(-1)
        correct += int((preds == y).sum())
        total += len(y)
    return correct / max(total, 1)
