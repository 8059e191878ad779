"""Decoders/heads mapping backbone outputs to task outputs.

Parity target: `/root/reference/src/tasks/decoders.py:38-280` — the
`SequenceDecoder` (mode last/first/pool/sum, masked pooling, l_output=0 =>
squeeze) plus `TokenDecoder` and `NDDecoder`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


class SequenceDecoder(fnn.Module):
    """Pool over length then (optionally) project: (B, L, d) -> (B, l_out, d_out).

    mode semantics (`decoders.py:81-117`):
      last:  take the final l_output positions
      first: take the first l_output positions
      pool:  running mean over the prefix, take the final l_output positions;
             with a mask, the mean at each sequence's true last position
      sum:   cumulative sum, final l_output positions
    l_output=0 means "length-1 output then squeeze" (`decoders.py:49-52`).
    """

    d_model: int
    d_output: Optional[int] = None
    l_output: Optional[int] = None
    mode: str = "last"
    use_lengths: bool = False
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,
        state=None,
        lengths=None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        squeeze = False
        l_output = self.l_output
        if l_output is None:
            l_output = x.shape[-2]
        elif l_output == 0:
            l_output = 1
            squeeze = True

        if self.mode == "last":
            x = x[..., -l_output:, :]
        elif self.mode == "first":
            x = x[..., :l_output, :]
        elif self.mode == "pool":
            denom = jnp.arange(1, x.shape[-2] + 1, dtype=x.dtype)[:, None]
            cummean = jnp.cumsum(x, axis=-2) / denom
            if mask is None:
                x = cummean[..., -l_output:, :]
            else:
                # mean at each sequence's true end (`decoders.py:93-105`)
                mask_sums = jnp.sum(mask, axis=-1).reshape(x.shape[0]).astype(jnp.int32) - 1
                x = cummean[jnp.arange(x.shape[0]), mask_sums, :][:, None, :]
        elif self.mode == "sum":
            x = jnp.cumsum(x, axis=-2)[..., -l_output:, :]
        elif self.mode == "ragged":
            # per-sequence true length (`decoders.py:110-114`): gather the
            # feature at each sequence's last real position (static shapes:
            # gather instead of python-side trimming)
            assert lengths is not None, "lengths required for ragged mode"
            idx = jnp.asarray(lengths).reshape(-1) - 1
            x = jnp.take_along_axis(
                x, idx[:, None, None].astype(jnp.int32), axis=-2
            )
        else:
            raise NotImplementedError(f"mode {self.mode}")

        if squeeze:
            x = x.squeeze(-2)

        if self.d_output is not None:
            x = fnn.Dense(
                self.d_output,
                kernel_init=fnn.initializers.normal(stddev=self.init_std),
                bias_init=fnn.initializers.zeros,
                dtype=self.dtype,
                name="output_transform",
            )(x)
        return x


class TokenDecoder(fnn.Module):
    """Per-token classification head (`decoders.py:145-161`)."""

    d_model: int
    d_output: int
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array, state=None, **kwargs) -> jax.Array:
        return fnn.Dense(
            self.d_output,
            kernel_init=fnn.initializers.normal(stddev=self.init_std),
            bias_init=fnn.initializers.zeros,
            dtype=self.dtype,
            name="output_transform",
        )(x)


class NDDecoder(fnn.Module):
    """N-D regression/classification decoder (`decoders.py:164-198`):
    optional pooling over length then linear."""

    d_model: int
    d_output: Optional[int] = None
    mode: str = "pool"
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array, state=None, **kwargs) -> jax.Array:
        assert self.mode in ("pool", "full")
        if self.mode == "pool":
            x = jnp.mean(x, axis=-2)
        if self.d_output is not None:
            x = fnn.Dense(
                self.d_output,
                kernel_init=fnn.initializers.normal(stddev=self.init_std),
                bias_init=fnn.initializers.zeros,
                dtype=self.dtype,
                name="output_transform",
            )(x)
        return x


class RetrievalHead(fnn.Module):
    """Dual-sequence retrieval classifier (`decoders.py:201-245`): NLI-style
    [a, b, a-b, a*b] features or plain concat, then an MLP."""

    d_input: int
    d_model: int
    n_classes: int
    nli: bool = True
    activation: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[self.activation]
        a, b = jnp.split(x, 2, axis=0)  # (2B, d) -> 2 x (B, d)
        if self.nli:
            feats = jnp.concatenate([a, b, a - b, a * b], axis=-1)
            h = fnn.Dense(self.d_model, dtype=self.dtype, name="fc1")(feats)
            h = act(h)
            return fnn.Dense(self.n_classes, dtype=self.dtype, name="fc2")(h)
        feats = jnp.concatenate([a, b], axis=-1)
        h = act(fnn.Dense(self.d_model, dtype=self.dtype, name="fc1")(feats))
        h = act(fnn.Dense(self.d_model // 2, dtype=self.dtype, name="fc2")(h))
        return fnn.Dense(self.n_classes, dtype=self.dtype, name="fc3")(h)


class RetrievalDecoder(fnn.Module):
    """SequenceDecoder feature pool + RetrievalHead (`decoders.py:248-275`)."""

    d_input: int
    n_classes: int
    d_model: Optional[int] = None
    nli: bool = True
    activation: str = "relu"
    mode: str = "pool"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array, state=None, **kwargs) -> jax.Array:
        feat = SequenceDecoder(
            d_model=self.d_input, d_output=None, l_output=0, mode=self.mode,
            dtype=self.dtype, name="feature",
        )(x, **kwargs)
        return RetrievalHead(
            d_input=self.d_input,
            d_model=self.d_model or self.d_input,
            n_classes=self.n_classes,
            nli=self.nli,
            activation=self.activation,
            dtype=self.dtype,
            name="retrieval",
        )(feat)


class PackedDecoder(fnn.Module):
    """Inverse of the `pack` encoder (`decoders.py:270-273`). The torch
    version re-pads a PackedSequence; under XLA the batch never left its
    dense (B, L, d) layout (see `tasks.encoders.PackedEncoder`), so this is
    the identity — kept so configs pairing pack encoder/decoder port 1:1."""

    def __call__(self, x, state=None, **kwargs):
        return x


class StateDecoder(fnn.Module):
    """Decode from the model's final state (`decoders.py:188-198`)."""

    d_model: int
    d_output: int
    state_to_tensor: Any = None  # callable state -> (B, d_model)
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, state=None, **kwargs) -> jax.Array:
        s = self.state_to_tensor(state) if self.state_to_tensor else state
        return fnn.Dense(self.d_output, dtype=self.dtype, name="output_transform")(s)
