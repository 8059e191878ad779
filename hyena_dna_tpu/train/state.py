"""Train state: parameters + optimizer state + step, as a jax pytree.

Replaces the reference's PyTorch-Lightning module state
(`/root/reference/train.py:124-573`) with the standard JAX functional
pattern: the entire mutable training state is one immutable pytree threaded
through a jitted step and donated for in-place buffer reuse.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jax.Array,
    params: Optional[Any] = None,
) -> TrainState:
    """Initialize parameters (unless given) and optimizer state."""
    if params is None:
        # jitted init: eager op-by-op init at long context is pathologically
        # slow (and fragile) — compile the whole initializer
        variables = jax.jit(model.init)(rng, sample_input)
        params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        tx=tx,
        apply_fn=model.apply,
    )
