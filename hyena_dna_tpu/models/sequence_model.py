"""Generic isotropic sequence backbone: SequenceModel / SequenceResidualBlock
plus the residual, pooling, FF, and identity layer registries they consume.

Parity targets:
  * `SequenceModel` (`/root/reference/src/models/sequence/model.py:18-134`,
    registered `model`) — stack of residual blocks with per-block
    residual/norm/pool configs and per-layer output-norm tracking;
  * `SequenceResidualBlock` (`block.py:21-129`) — prenorm/postnorm around a
    black-box layer with residual-fn + pool;
  * residual registry R/H/D/A/F (`src/models/nn/residual.py:6-108`);
  * pool registry sample/avg/linear (`pool.py:18-459` — the entries the DNA
    configs can reach; spectral pool is S4-era legacy);
  * `FF` transformer FFN layer (`ff.py:8-49`, registered `ff`);
  * `SequenceIdentity` test layer (`base.py:109-132`, registered `id`).

The torch `SequenceModule` protocol (forward(x, state) -> (y, state)) maps to
flax modules returning `(y, state)` tuples; recurrent `step()` is provided
where the reference implements it.

Layer instantiation goes through `hyena_dna_tpu.utils.registry.LAYER_REGISTRY`
keyed by `_name_`, mirroring `utils.instantiate(registry.layer, ...)`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from hyena_dna_tpu.models.nn import Normalization, activation_fn


# --------------------------------------------------------------------------
# simple registered layers
# --------------------------------------------------------------------------


class SequenceIdentity(fnn.Module):
    """Identity layer for testing (`base.py:109-132`, layer `id`)."""

    d_model: int = 0
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, state=None, **kwargs):
        return x, state

    def step(self, x, state=None, **kwargs):
        return x, state


class FF(fnn.Module):
    """Transformer FFN as a standalone layer (`ff.py:8-49`, layer `ff`)."""

    d_input: int
    expand: int = 2
    d_output: Optional[int] = None
    activation: str = "gelu"
    dropout: float = 0.0
    transposed: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, state=None, deterministic: bool = True, **kwargs):
        d_out = self.d_output or self.d_input
        h = fnn.Dense(self.expand * self.d_input, dtype=self.dtype, name="linear1")(x)
        h = activation_fn(self.activation)(h)
        h = fnn.Dropout(rate=self.dropout, name="drop")(h, deterministic=deterministic)
        h = fnn.Dense(d_out, dtype=self.dtype, name="linear2")(h)
        return h, None


# --------------------------------------------------------------------------
# residual functions (residual.py registry: R/H/D/A/F)
# --------------------------------------------------------------------------


class Residual(fnn.Module):
    """alpha*x + beta*y (`residual.py:6-25`)."""

    i_layer: int
    d_input: int
    d_model: int
    alpha: float = 1.0
    beta: float = 1.0

    @fnn.compact
    def __call__(self, x, y):
        y = self.beta * y if self.beta != 1.0 else y
        return self.alpha * x + y if self.alpha else y

    @property
    def d_output(self):
        return self.d_model


class Affine(Residual):
    """Learnable scalar multiplier on the layer branch (`residual.py:27-46`)."""

    scalar: bool = True
    gamma: float = 0.0

    @fnn.compact
    def __call__(self, x, y):
        c0 = self.beta * self.i_layer ** (-self.gamma)
        d = 1 if self.scalar else self.d_input
        affine = self.param("affine", lambda k, s: c0 * jnp.ones(s), (d,))
        return self.alpha * x + affine * y


class Feedforward(fnn.Module):
    """No residual (`residual.py:49-52`)."""

    i_layer: int
    d_input: int
    d_model: int

    def __call__(self, x, y):
        return y

    @property
    def d_output(self):
        return self.d_model


class Highway(fnn.Module):
    """Gated highway residual (`residual.py:55-73`)."""

    i_layer: int
    d_input: int
    d_model: int
    scaling_correction: bool = False
    elemwise: bool = False

    @fnn.compact
    def __call__(self, x, y):
        corr = 1.732 if self.scaling_correction else 1.0
        wx = fnn.Dense(self.d_input, name="Wx")(x)
        if self.elemwise:
            wy = self.param("Wy", fnn.initializers.normal(1.0), (self.d_input,))
            yy = wy * y
        else:
            yy = fnn.Dense(self.d_input, name="Wy")(y)
        r = jax.nn.sigmoid(wx + yy)
        return corr * (1.0 - r) * x + r * y

    @property
    def d_output(self):
        return self.d_model


class DecayResidual(fnn.Module):
    """Depth-decayed combination (`residual.py:76-91`)."""

    i_layer: int
    d_input: int
    d_model: int
    power: float = 0.5
    l2: bool = True

    def __call__(self, x, y):
        beta = self.i_layer ** (-self.power)
        alpha = (1.0 - beta**2) ** 0.5 if self.l2 else 1.0 - beta
        return alpha * x + beta * y

    @property
    def d_output(self):
        return self.d_model


RESIDUAL_REGISTRY = {
    "F": Feedforward,
    "N": Feedforward,
    "R": Residual,
    "H": Highway,
    "D": DecayResidual,
    "A": Affine,
    "none": Feedforward,
    "ff": Feedforward,
    "feedforward": Feedforward,
    "residual": Residual,
    "highway": Highway,
    "decay": DecayResidual,
    "affine": Affine,
}


# --------------------------------------------------------------------------
# pooling (pool.py registry: sample/avg/linear)
# --------------------------------------------------------------------------


class DownSample(fnn.Module):
    """Stride subsampling (`pool.py:18-50`)."""

    d_input: int
    stride: int = 1
    expand: int = 1

    def __call__(self, x):
        if self.stride > 1:
            x = x[..., ::self.stride, :]
        if self.expand > 1:
            x = jnp.repeat(x, self.expand, axis=-1)
        return x, None

    @property
    def d_output(self):
        return self.d_input * self.expand


class DownAvgPool(fnn.Module):
    """Average-pool along length (`pool.py:53-102`)."""

    d_input: int
    stride: int = 1
    expand: int = 1

    def __call__(self, x):
        if self.stride > 1:
            l = (x.shape[-2] // self.stride) * self.stride
            x = x[..., :l, :].reshape(*x.shape[:-2], l // self.stride, self.stride, x.shape[-1])
            x = x.mean(axis=-2)
        if self.expand > 1:
            x = jnp.repeat(x, self.expand, axis=-1)
        return x, None

    @property
    def d_output(self):
        return self.d_input * self.expand


class DownLinearPool(fnn.Module):
    """Fold `stride` steps into channels then project (`pool.py:213-255`)."""

    d_input: int
    stride: int = 1
    expand: int = 1

    @fnn.compact
    def __call__(self, x):
        s = self.stride
        l = (x.shape[-2] // s) * s
        x = x[..., :l, :].reshape(*x.shape[:-2], l // s, s * x.shape[-1])
        x = fnn.Dense(self.d_input * self.expand, name="linear")(x)
        return x, None

    @property
    def d_output(self):
        return self.d_input * self.expand


class UpAvgPool(fnn.Module):
    """Repeat-upsample along length, causal shift (`pool.py:174-210`)."""

    d_input: int
    stride: int = 1
    expand: int = 1
    causal: bool = False

    @fnn.compact
    def __call__(self, x):
        if self.expand > 1:
            x = fnn.Dense(self.d_input // self.expand, name="linear")(x)
        if self.stride > 1:
            if self.causal:
                x = jnp.pad(x[..., :-1, :], [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
            x = jnp.repeat(x, self.stride, axis=-2)
        return x, None

    @property
    def d_output(self):
        return self.d_input // self.expand


POOL_REGISTRY = {
    "sample": DownSample,
    "pool": DownAvgPool,
    "avg": DownAvgPool,
    "linear": DownLinearPool,
}
UP_POOL_REGISTRY = {"pool": UpAvgPool, "avg": UpAvgPool}


# --------------------------------------------------------------------------
# the block and the backbone
# --------------------------------------------------------------------------


def _make_layer(d_input: int, layer_cfg: Optional[dict], dtype, name: str):
    from hyena_dna_tpu.utils.registry import LAYER_REGISTRY

    cfg = dict(layer_cfg or {"_name_": "id"})
    lname = cfg.pop("_name_", "id")
    cfg.pop("transposed", None)
    cfg.pop("dropout", None) if lname == "id" else None
    build = LAYER_REGISTRY[lname]
    if lname == "hyena":
        return build(d_model=d_input, dtype=dtype, name=name, **cfg)
    if lname == "mha":
        return build(d_model=d_input, dtype=dtype, name=name, **cfg)
    if lname == "ff":
        return build(d_input=d_input, dtype=dtype, name=name, **cfg)
    if lname == "long-conv":
        return build(d_model=d_input, dtype=dtype, name=name, **cfg)
    if lname == "id":
        return build(d_model=d_input, name=name)
    return build(d_input, name=name, **cfg)


class SequenceResidualBlock(fnn.Module):
    """Norm -> layer -> dropout -> residual -> pool (`block.py:21-129`)."""

    d_input: int
    i_layer: int = 1
    prenorm: bool = True
    dropout: float = 0.0
    layer: Optional[dict] = None
    residual: Optional[str] = None
    norm: Optional[str] = None
    pool: Optional[dict] = None
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.inner = _make_layer(self.d_input, self.layer, self.dtype, "layer")
        if self.residual is not None:
            res_cls = RESIDUAL_REGISTRY[self.residual]
            self.residual_fn = res_cls(
                i_layer=self.i_layer,
                d_input=self.d_input,
                d_model=getattr(self.inner, "d_output", self.d_input),
                name="residual",
            )
        if self.norm is not None:
            d_norm = self.d_input if self.prenorm else self.d_residual
            self.norm_fn = Normalization(d=d_norm, norm_type=self.norm, name="norm")
        if self.pool is not None:
            pool_cfg = dict(self.pool)
            pname = pool_cfg.pop("_name_", "avg")
            self.pool_fn = POOL_REGISTRY[pname](d_input=self.d_residual, name="pool", **pool_cfg)
        self.drop = fnn.Dropout(rate=self.dropout)

    @property
    def d_residual(self) -> int:
        return getattr(self.inner, "d_output", self.d_input)

    @property
    def d_output(self) -> int:
        if self.pool is not None:
            return self.pool_fn.d_output
        return self.d_residual

    def step(self, x, state=None):
        """Single-token recurrent step (`block.py:109-129`): norms apply
        per-token; only layers implementing `step` are supported."""
        y = x
        if self.norm is not None and self.prenorm:
            y = self.norm_fn(y)
        y, state = self.inner.step(y, state)
        if self.residual is not None:
            y = self.residual_fn(x, y)
        if self.norm is not None and not self.prenorm:
            y = self.norm_fn(y)
        return y, state

    def __call__(self, x, state=None, deterministic: bool = True, **kwargs):
        y = x
        if self.norm is not None and self.prenorm:
            y = self.norm_fn(y)
        out = self.inner(y, deterministic=deterministic) if not isinstance(
            self.inner, SequenceIdentity
        ) else self.inner(y, state=state)
        if isinstance(out, tuple):
            y, state = out[0], (out[1] if len(out) > 1 else None)
        else:
            y, state = out, None
        if self.residual is not None:
            y = self.residual_fn(x, self.drop(y, deterministic=deterministic))
        if self.norm is not None and not self.prenorm:
            y = self.norm_fn(y)
        if self.pool is not None:
            y, _ = self.pool_fn(y)
        return y, state


class SequenceModel(fnn.Module):
    """Isotropic backbone, registered `model` (`model.py:18-134`)."""

    d_model: int
    n_layers: int = 1
    dropout: float = 0.0
    prenorm: bool = True
    n_repeat: int = 1
    layer: Optional[Any] = None  # dict or list of dicts
    residual: Optional[str] = None
    norm: Optional[str] = None
    pool: Optional[dict] = None
    track_norms: bool = True
    dropinp: float = 0.0
    transposed: bool = False  # accepted for config parity; layout fixed B,L,D
    dtype: Any = jnp.float32

    def setup(self):
        layer_cfgs = self.layer if isinstance(self.layer, (list, tuple)) else [self.layer]
        layer_cfgs = [dict(c or {"_name_": "id"}) for c in layer_cfgs]
        for c in layer_cfgs:
            c.setdefault("dropout", self.dropout)
        cfgs = list(layer_cfgs) * self.n_layers * self.n_repeat
        blocks = []
        for i, cfg in enumerate(cfgs):
            pool_cfg = self.pool if (i + 1) % self.n_repeat == 0 else None
            blocks.append(
                SequenceResidualBlock(
                    d_input=self.d_model,
                    i_layer=i + 1,
                    prenorm=self.prenorm,
                    dropout=self.dropout,
                    layer=cfg,
                    residual=self.residual,
                    norm=self.norm,
                    pool=pool_cfg,
                    dtype=self.dtype,
                    name=f"layers_{i}",
                )
            )
        self.blocks = blocks
        if self.prenorm and self.norm is not None:
            self.norm_f = Normalization(d=self.d_model, norm_type=self.norm, name="norm_f")
        self.dropinp_fn = fnn.Dropout(rate=self.dropinp)

    def __call__(self, x, state=None, deterministic: bool = True, **kwargs):
        x = self.dropinp_fn(x, deterministic=deterministic)
        norms = [jnp.mean(jax.lax.stop_gradient(x) ** 2)] if self.track_norms else None
        states = [None] * len(self.blocks) if state is None else state
        next_states = []
        for block, st in zip(self.blocks, states):
            x, st = block(x, state=st, deterministic=deterministic)
            next_states.append(st)
            if self.track_norms:
                norms.append(jnp.mean(jax.lax.stop_gradient(x) ** 2))
        if self.prenorm and self.norm is not None:
            x = self.norm_f(x)
        if self.track_norms:
            self.sow(
                "metrics", "output_norms", jnp.stack(norms),
                reduce_fn=lambda _, b: b,
            )
        return x, next_states

    def step(self, x, state=None):
        """Recurrent step through the stack (`model.py:124-134`)."""
        states = [None] * len(self.blocks) if state is None else state
        next_states = []
        for block, st in zip(self.blocks, states):
            x, st = block.step(x, state=st)
            next_states.append(st)
        if self.prenorm and self.norm is not None:
            x = self.norm_f(x)
        return x, next_states

    @property
    def d_output(self) -> int:
        return self.d_model
