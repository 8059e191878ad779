"""Input encoders mapping raw batch inputs into model space.

Parity target: `/root/reference/src/tasks/encoders.py:16-331` — the encoder
registry (embedding/linear/position/position_id/class/onehot/conv1d/layer/
pack) plus the dataset/model attribute auto-wiring
(`encoders.py:311-331`: n_tokens from the dataset, d_model from the model).

LM pipelines use no encoder (embeddings live in the backbone); these cover
the generic `SequenceModel` pipelines and synthetic tasks.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


class EmbeddingEncoder(fnn.Module):
    """Token embedding (`encoders.py:295` 'embedding' -> nn.Embedding)."""

    n_tokens: int
    d_model: int
    init_std: float = 0.02
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, **kwargs):
        return fnn.Embed(
            self.n_tokens, self.d_model,
            embedding_init=fnn.initializers.normal(stddev=self.init_std),
            dtype=self.dtype, name="embedding",
        )(x)


class LinearEncoder(fnn.Module):
    d_input: int
    d_model: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, **kwargs):
        return fnn.Dense(self.d_model, dtype=self.dtype, name="linear")(x)


class PositionalIDEncoder(fnn.Module):
    """Return position ids alongside (used by transformer-xl style models)."""

    def __call__(self, x, **kwargs):
        pos = jnp.arange(x.shape[-1])
        return x, jnp.broadcast_to(pos, x.shape)


class PositionalEncoder(fnn.Module):
    """Sinusoidal (or learned) positional encoding added to the input
    (`encoders.py:42-91`)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 16384
    pe_init: Optional[float] = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True, **kwargs):
        if self.pe_init is not None:
            pe = self.param(
                "pe", fnn.initializers.normal(stddev=self.pe_init),
                (self.max_len, 1, self.d_model),
            )[: x.shape[-2], 0]
        else:
            position = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
            div = jnp.exp(
                -math.log(10000.0) * jnp.arange(0, self.d_model, 2) / self.d_model
            )
            pe = jnp.zeros((self.max_len, self.d_model))
            pe = pe.at[:, 0::2].set(jnp.sin(position * div))
            pe = pe.at[:, 1::2].set(jnp.cos(position * div))
            pe = pe[: x.shape[-2]]
        x = x + pe
        return fnn.Dropout(rate=self.dropout, name="drop")(x, deterministic=deterministic)


class ClassEmbedding(fnn.Module):
    """Add a class embedding to every position (`encoders.py:94-102`)."""

    n_classes: int
    d_model: int

    @fnn.compact
    def __call__(self, x, y=None, **kwargs):
        emb = fnn.Embed(self.n_classes, self.d_model, name="embedding")(y)
        return x + emb[..., None, :]


class OneHotEncoder(fnn.Module):
    """int tokens -> one-hot float vectors (`encoders.py:242-249`)."""

    n_tokens: int
    d_model: int

    def __call__(self, x, **kwargs):
        assert self.n_tokens <= self.d_model
        out = jax.nn.one_hot(x.squeeze(-1) if x.ndim > 2 else x, self.d_model)
        return out.astype(jnp.float32)


class Conv1DEncoder(fnn.Module):
    """1D conv over length (`encoders.py:105-119`)."""

    d_input: int
    d_model: int
    kernel_size: int = 25
    stride: int = 1

    @fnn.compact
    def __call__(self, x, **kwargs):
        return fnn.Conv(
            self.d_model, (self.kernel_size,), strides=(self.stride,),
            padding="SAME", name="conv",
        )(x)


class LayerEncoder(fnn.Module):
    """Wrap an arbitrary registered layer as an encoder (`encoders.py:121-141`)."""

    d_model: int
    prenorm: bool = False
    norm: str = "layer"
    layer: Optional[dict] = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True, **kwargs):
        from hyena_dna_tpu.models.sequence_model import SequenceResidualBlock

        block = SequenceResidualBlock(
            d_input=self.d_model,
            prenorm=self.prenorm,
            layer=dict(self.layer or {"_name_": "id"}),
            residual="R",
            norm=self.norm,
            name="layer",
        )
        y, _ = block(x, deterministic=deterministic)
        return y


ENCODER_REGISTRY = {
    "embedding": EmbeddingEncoder,
    "linear": LinearEncoder,
    "position": PositionalEncoder,
    "position_id": PositionalIDEncoder,
    "class": ClassEmbedding,
    "onehot": OneHotEncoder,
    "conv1d": Conv1DEncoder,
    "layer": LayerEncoder,
    "id": None,
}

# auto-wired ctor args per encoder, from dataset/model attributes
# (`encoders.py:311-331`)
DATASET_ATTRS = {
    "embedding": [("n_tokens", "n_tokens")],
    "linear": [("d_input", "d_input")],
    "class": [("n_classes", "n_classes")],
    "onehot": [("n_tokens", "n_tokens")],
    "conv1d": [("d_input", "d_input")],
}
MODEL_ATTRS = {
    "embedding": ["d_model"],
    "linear": ["d_model"],
    "position": ["d_model"],
    "class": ["d_model"],
    "onehot": ["d_model"],
    "conv1d": ["d_model"],
    "layer": ["d_model"],
}
