"""Small neural-net building blocks shared across models.

Mirrors the surface of `/root/reference/src/models/nn/components.py:13-389`
(activation picker, normalization picker) in idiomatic flax.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


def activation_fn(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Activation registry (reference `components.py:13-60`)."""
    if name in (None, "id", "identity", "linear", "none"):
        return lambda x: x
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "softplus":
        return jax.nn.softplus
    if name == "sqrelu":
        return lambda x: jnp.square(jax.nn.relu(x))
    if name == "laplace":
        mu, sigma = math.sqrt(0.5), math.sqrt(0.25)
        return lambda x: 0.5 * (1.0 + jax.lax.erf((x - mu) / (sigma * math.sqrt(2.0))))
    if name == "sin":
        return jnp.sin
    if name == "glu":
        return lambda x: jax.nn.glu(x, axis=-1)
    raise NotImplementedError(f"activation '{name}' not implemented")


class Normalization(fnn.Module):
    """Normalization picker (reference `components.py:266-339`): layer / rms /
    group / instance / batch-free variants commonly used by SequenceModel."""

    d: int
    norm_type: str = "layer"
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.norm_type in ("layer", "layernorm"):
            return fnn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        if self.norm_type in ("rms", "rmsnorm"):
            return fnn.RMSNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        if self.norm_type == "group":
            return fnn.GroupNorm(num_groups=min(self.d, 32), epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        if self.norm_type in ("none", "id", None):
            return x
        raise NotImplementedError(f"norm '{self.norm_type}' not implemented")


def stochastic_depth(
    rng, x: jax.Array, p: float, mode: str = "row", deterministic: bool = False
) -> jax.Array:
    """Row-mode stochastic depth (reference `components.py:342-389`)."""
    if deterministic or p == 0.0:
        return x
    survival = 1.0 - p
    if mode == "row":
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    else:
        shape = (1,) * x.ndim
    mask = jax.random.bernoulli(rng, survival, shape)
    return jnp.where(mask, x / survival, jnp.zeros_like(x))


class Gate(fnn.Module):
    """Gating mechanisms from the LSSL/UR-LSTM line
    (`/root/reference/src/models/nn/gate.py:6-99`): N (none), G (sigmoid),
    UR (uniform refine), R (refine), and the discretization variants that
    reduce to exp/relu/sigmoid activations of a learned preactivation.
    The preactivation here is a Dense layer over the input."""

    size: int
    mechanism: str = "N"

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        m = self.mechanism
        if m == "N":
            return jnp.ones(x.shape[:-1] + (self.size,), x.dtype)
        g_pre = fnn.Dense(self.size, name="W_g")(x)
        if m in ("G", "FS"):
            return jax.nn.sigmoid(g_pre)
        if m == "BE":
            return jnp.exp(g_pre)  # backward discretization
        if m == "BR":
            return jax.nn.relu(g_pre)
        if m == "TE":
            e = jnp.exp(g_pre)
            return e / (1.0 + e / 2.0)  # trapezoid, exp
        if m == "TR":
            r = jax.nn.relu(g_pre)
            return r / (1.0 + r / 2.0)
        if m == "TS":
            return 2.0 * jax.nn.sigmoid(g_pre)
        if m in ("UR", "R"):
            g = jax.nn.sigmoid(g_pre)
            if m == "UR":
                b = self.param("uniform_b", lambda k, s: jnp.log(
                    jnp.maximum(jax.random.uniform(k, s), 1e-6)
                    / jnp.maximum(1 - jax.random.uniform(jax.random.fold_in(k, 1), s), 1e-6)
                ), (self.size,))
                g = jax.nn.sigmoid(g_pre + b)
            r = fnn.Dense(self.size, name="W_r")(x)
            r = jax.nn.sigmoid(r)
            return (1 - 2 * r) * g**2 + 2 * r * g  # refine interpolation
        raise NotImplementedError(f"gate mechanism {m!r}")
