"""Input encoders mapping raw batch inputs into model space.

Parity target: `/root/reference/src/tasks/encoders.py:16-331` — the full
encoder registry (embedding/linear/position/position_id/class/onehot/
conv1d/layer/time/pack/patch2d/timestamp_embedding) plus the dataset/model
attribute auto-wiring (`encoders.py:311-331`: n_tokens from the dataset,
d_model from the model).

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


class TimeEncoder(fnn.Module):
    """Time-feature encoder for forecasting (`encoders.py:206-230`):
    timeenc=0 sums one embedding table per integer time feature (month/day/
    weekday/hour...); timeenc!=0 projects the float marks with one Linear.
    Either way a 2-way mask embedding (observed vs to-predict) is added."""

    n_tokens_time: tuple  # vocab size per integer time feature
    d_model: int
    timeenc: int = 0
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mark=None, mask=None, **kwargs):
        assert mark is not None and mask is not None, (
            "TimeEncoder needs `mark`/`mask` extras from the collate fn "
            "(reference encoders.py:222)")
        if self.timeenc == 0:
            assert mark.shape[-1] == len(self.n_tokens_time)
            time_encode = 0
            for i, v in enumerate(self.n_tokens_time):
                time_encode += fnn.Embed(int(v), self.d_model,
                                         dtype=self.dtype,
                                         name=f"encoder_{i}")(mark[..., i])
        else:
            time_encode = fnn.Dense(self.d_model, dtype=self.dtype,
                                    name="encoders")(
                mark.astype(self.dtype))
        mask_tok = mask[..., 0] if mask.ndim == x.ndim else mask
        mask_encode = fnn.Embed(2, self.d_model, dtype=self.dtype,
                                name="mask_embed")(mask_tok.astype(jnp.int32))
        return x + time_encode + mask_encode


class PackedEncoder(fnn.Module):
    """Variable-length batch handling (`encoders.py:233-239`).

    The reference packs padded rows into a torch PackedSequence for RNN
    consumption. Packed (ragged) layouts don't exist under XLA's static
    shapes — the TPU-native equivalent keeps the dense (B, L, d) layout and
    zero-masks positions at or beyond each row's length, so downstream
    length-aware pooling (masked-mean SequenceDecoder) sees exact zeros."""

    def __call__(self, x, lengths=None, len_batch=None, **kwargs):
        lens = lengths if lengths is not None else len_batch
        assert lens is not None, "PackedEncoder needs `lengths` in the batch"
        pos = jnp.arange(x.shape[1])
        keep = pos[None, :] < jnp.asarray(lens).reshape(-1, 1)
        return x * keep[..., None].astype(x.dtype)


class Conv2DPatchEncoder(fnn.Module):
    """Image -> patch-sequence tokenizer (`encoders.py:252-287`): a strided
    conv with stride == kernel, flattened to (B, h*w, d_model). Input is
    NHWC (flax convention — the reference rearranges to NCHW for torch);
    `flat=True` accepts flattened rows and reshapes back to 2D first."""

    d_input: int
    d_model: int
    filter_sizes: tuple
    flat: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, **kwargs):
        assert len(self.filter_sizes) == 2
        fh, fw = self.filter_sizes
        if self.flat:
            side = int(math.isqrt(x.shape[1]))
            x = x.reshape(x.shape[0], side, side, self.d_input)
        y = fnn.Conv(self.d_model, (fh, fw), strides=(fh, fw),
                     padding="VALID", dtype=self.dtype, name="encoder")(x)
        return y.reshape(y.shape[0], -1, self.d_model)


class TimestampEmbeddingEncoder(fnn.Module):
    """Monash-style timestamp encoder (`encoders.py:144-204`): for each
    timestamp attribute (year/month/day/...), add either a padded embedding
    lookup (`table=True`) or a Linear of the [-1, 1]-normalized value.
    -1 marks a null timestamp and maps to the padding row (table mode) /
    index 0."""

    d_model: int
    table: bool = False
    features: Optional[tuple] = None
    dtype: Any = jnp.float32

    # (min, max) per attribute, padding slot included as +2
    CARDINALITIES = {
        "day": (1, 31), "hour": (0, 23), "minute": (0, 59),
        "second": (0, 59), "month": (1, 12), "year": (1950, 2010),
        "dayofweek": (0, 6), "dayofyear": (1, 366), "quarter": (1, 4),
        "week": (1, 53), "is_month_start": (0, 1), "is_month_end": (0, 1),
        "is_quarter_start": (0, 1), "is_quarter_end": (0, 1),
        "is_year_start": (0, 1), "is_year_end": (0, 1),
        "is_leap_year": (0, 1),
    }

    @fnn.compact
    def __call__(self, x, timestamps=None, **kwargs):
        assert timestamps is not None, (
            "TimestampEmbeddingEncoder needs a `timestamps` dict extra")
        cards = self.CARDINALITIES
        if self.features is not None:
            cards = {k: v for k, v in cards.items() if k in self.features}
        for attr in timestamps:
            lo, hi = cards[attr]
            t = jnp.asarray(timestamps[attr])
            null = t == -1
            idx = jnp.where(null, 0, t - lo)
            if self.table:
                emb = fnn.Embed(hi - lo + 2, self.d_model, dtype=self.dtype,
                                name=f"embedding_{attr}")(
                    idx.astype(jnp.int32))
                emb = emb * (~null)[..., None].astype(emb.dtype)  # padding_idx=0
            else:
                rng = hi - lo + 2
                val = (2.0 * idx.astype(jnp.float32) / rng - 1.0)[..., None]
                emb = fnn.Dense(self.d_model, dtype=self.dtype,
                                name=f"linear_{attr}")(val)
            x = x + emb
        return x


ENCODER_REGISTRY = {
    "embedding": EmbeddingEncoder,
    "linear": LinearEncoder,
    "position": PositionalEncoder,
    "position_id": PositionalIDEncoder,
    "class": ClassEmbedding,
    "onehot": OneHotEncoder,
    "conv1d": Conv1DEncoder,
    "layer": LayerEncoder,
    "time": TimeEncoder,
    "pack": PackedEncoder,
    "patch2d": Conv2DPatchEncoder,
    "timestamp_embedding": TimestampEmbeddingEncoder,
    "id": None,
}

# auto-wired ctor args per encoder, from dataset/model attributes
# (`encoders.py:311-331`)
DATASET_ATTRS = {
    "embedding": [("n_tokens", "n_tokens")],
    "linear": [("d_input", "d_input")],
    "class": [("n_classes", "n_classes")],
    "time": [("n_tokens_time", "n_tokens_time")],
    "onehot": [("n_tokens", "n_tokens")],
    "conv1d": [("d_input", "d_input")],
    "patch2d": [("d_input", "d_input")],
}
MODEL_ATTRS = {
    "embedding": ["d_model"],
    "linear": ["d_model"],
    "position": ["d_model"],
    "class": ["d_model"],
    "time": ["d_model"],
    "onehot": ["d_model"],
    "conv1d": ["d_model"],
    "patch2d": ["d_model"],
    "timestamp_embedding": ["d_model"],
    "layer": ["d_model"],
}
