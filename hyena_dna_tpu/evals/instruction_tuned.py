"""Instruction-tuned ICL eval: fine-tune the WHOLE pretrained LM on k-shot
prompts, then measure label-token accuracy.

Parity target: `/root/reference/evals/instruction_tuned_genomics.py:35-337` —
same data shape as soft prompting (`soft_prompting.py` here) but every
parameter trains. Loss = cross-entropy of the last position's logits against
the label token.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def instruction_tune(
    lm,
    lm_params,
    train_loader,
    *,
    lr: float = 1e-4,
    steps: int = 200,
    weight_decay: float = 0.0,
    log_every: int = 50,
) -> Tuple[Dict, Callable]:
    """Returns (tuned_params, predict_fn)."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    params = lm_params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits, _ = lm.apply({"params": p}, x, deterministic=True)
            last = logits[:, -1].astype(jnp.float32)
            logp = jax.nn.log_softmax(last, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y.reshape(-1, 1), axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it, done = iter(train_loader), 0
    while done < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            continue
        x = jnp.asarray(batch[0])
        y = jnp.asarray(batch[1]).reshape(-1)
        params, opt_state, loss = step(params, opt_state, x, y)
        done += 1
        if log_every and done % log_every == 0:
            print(f"[instruction-tune step {done}] loss={float(loss):.4f}", flush=True)

    @jax.jit
    def predict(x):
        logits, _ = lm.apply({"params": params}, x, deterministic=True)
        return jnp.argmax(logits[:, -1], axis=-1)

    return params, predict


def evaluate(predict_fn, loader) -> float:
    correct = total = 0
    for batch in loader:
        preds = np.asarray(predict_fn(jnp.asarray(batch[0])))
        y = np.asarray(batch[1]).reshape(-1)
        correct += int((preds == y).sum())
        total += len(y)
    return correct / max(total, 1)
