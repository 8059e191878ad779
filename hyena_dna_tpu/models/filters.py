"""Implicit Hyena filter: positional embedding -> Sin-MLP -> exponential
modulation window.

Math parity with the reference (`/root/reference/src/models/sequence/hyena.py:96-267`):
  * PositionalEmbedding (`hyena.py:109-131`): z = [t, Re(e^{-i f w}), Im(...)]
    with t = linspace(0,1,L), w = 2*pi*linspace(0,L-1,L)/L,
    f = linspace(1e-4, bands-1, bands), bands = (emb_dim-1)//2. `z` is a
    registered tensor with its own learning rate (`lr_pos_emb`); `t` is frozen.
  * Sin activation (`hyena.py:96-106`): sin(freq * x) with a single `freq`
    parameter of shape (1, order) SHARED across every activation in the MLP
    (the reference appends the same module instance repeatedly).
  * ExponentialModulation (`hyena.py:134-155`): decay rates linspace between
    log(target)/slow_pct and log(target)/fast_pct; h *= exp(-t*|deltas|)+shift.
  * The filter MLP: Linear(emb_dim->order), [Linear(order->order)] x
    num_inner_mlps, Linear(order->d_model, no bias), each followed by Sin
    except the last (`hyena.py:205-219`).

Per-parameter optimizer hyperparameters (reference `hyena.py:224-227` +
`src/utils/train.py:142-156`): the MLP weights and `freq` train at `lr`/`wd`;
`pos_emb_z` at `lr_pos_emb`; `deltas` at `modulation_lr` (0 = frozen). These
are expressed here through parameter labels consumed by
`hyena_dna_tpu.train.optim.build_optimizer`.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn
from hyena_dna_tpu.ops import fftconv
from hyena_dna_tpu.ops.fftconv import CONV_OUT_TAG, tag_conv_out  # noqa: F401


def positional_embedding_init(emb_dim: int, seq_len: int) -> jnp.ndarray:
    """Compute the (1, seq_len, emb_dim) z tensor of complex-exponential
    positional features. emb_dim must be odd and >= 3."""
    assert emb_dim % 2 != 0 and emb_dim >= 3, "emb_dim must be odd and >= 3"
    bands = (emb_dim - 1) // 2
    t = jnp.linspace(0.0, 1.0, seq_len)[None, :, None]  # (1, L, 1)
    t_rescaled = jnp.linspace(0.0, seq_len - 1, seq_len)[None, :, None]
    w = 2.0 * math.pi * t_rescaled / seq_len
    f = jnp.linspace(1e-4, bands - 1, bands)[None, None]  # (1, 1, bands)
    z = jnp.exp(-1j * f * w)
    return jnp.concatenate([t, z.real, z.imag], axis=-1)  # (1, L, emb_dim)


def modulation_deltas_init(
    d_model: int,
    fast_decay_pct: float = 0.3,
    slow_decay_pct: float = 1.5,
    target: float = 1e-2,
) -> jnp.ndarray:
    max_decay = math.log(target) / fast_decay_pct
    min_decay = math.log(target) / slow_decay_pct
    return jnp.linspace(min_decay, max_decay, d_model)[None, None]  # (1, 1, d)


class HyenaFilter(fnn.Module):
    """Implicit long-convolution filter generator + FFT conv applier.

    Attributes mirror the reference constructor (`hyena.py:158-227`). d_model
    here is the *filter* channel count: head_dim * inner_factor * (order-1)
    as wired by HyenaOperator.
    """

    d_model: int
    emb_dim: int = 3
    order: int = 16  # width of the implicit MLP
    seq_len: int = 1024
    w: float = 1.0  # Sin frequency init
    use_bias: bool = True
    num_inner_mlps: int = 2
    linear_mixer: bool = False
    modulate: bool = True
    normalized: bool = False
    bidirectional: bool = False
    modulation_shift: float = 0.0
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    modulation_target: float = 1e-2
    dropout: float = 0.0  # filter dropout (reference leaves unimplemented too)
    dtype: Any = jnp.float32
    # optimizer-group hints; consumed by train.optim via param labels
    lr: float | None = 1e-3
    lr_pos_emb: float = 1e-5
    wd: float = 0.0
    init_std: float = 0.02  # GPT-2 init applies to all nn.Linear in reference

    def setup(self):
        # per-channel conv bias (the "D" skip term); plain randn like torch
        # nn.Parameter(torch.randn(d)) (`hyena.py:195`)
        self.bias = self.param(
            "bias", fnn.initializers.normal(stddev=1.0), (self.d_model,), jnp.float32
        )
        # trainable positional features (frozen when lr_pos_emb == 0, handled
        # by the optimizer label map)
        self.pos_emb_z = self.param(
            "pos_emb_z",
            lambda key, shape: positional_embedding_init(self.emb_dim, self.seq_len),
            (1, self.seq_len, self.emb_dim),
        )
        if not self.linear_mixer:
            # shared Sin frequency (single instance reused, `hyena.py:199`)
            self.freq = self.param(
                "freq",
                lambda key, shape: self.w * jnp.ones(shape, jnp.float32),
                (1, self.order),
            )
            dense = lambda feat, name, use_bias=True: fnn.Dense(
                feat,
                use_bias=use_bias,
                kernel_init=fnn.initializers.normal(stddev=self.init_std),
                bias_init=fnn.initializers.zeros,
                dtype=jnp.float32,
                name=name,
            )
            self.mlp_in = dense(self.order, "mlp_in")
            self.mlp_inner = [
                dense(self.order, f"mlp_inner_{i}") for i in range(self.num_inner_mlps)
            ]
            self.mlp_out = dense(self.d_model, "mlp_out", use_bias=False)
        else:
            self.mlp_out = fnn.Dense(
                self.d_model,
                use_bias=False,
                kernel_init=fnn.initializers.normal(stddev=self.init_std),
                dtype=jnp.float32,
                name="mlp_out",
            )
        if self.modulate:
            self.deltas = self.param(
                "deltas",
                lambda key, shape: modulation_deltas_init(
                    self.d_model,
                    self.fast_decay_pct,
                    self.slow_decay_pct,
                    self.modulation_target,
                ),
                (1, 1, self.d_model),
            )

    def filter(self, L: int, anchor: jax.Array | None = None,
               out_dtype=jnp.float32) -> jax.Array:
        """Generate the length-L filter bank: (1, L, d_model), `out_dtype`
        (math runs f32; a bf16 out_dtype lets XLA fuse the cast into the
        final elementwise pass so no f32 (L, d) bank is ever materialized —
        at 1M tokens each such bank is 977 MB).

        `anchor` forces a scheduling dependence of the filter MLP on the
        given activation: the filter depends only on parameters, so inside
        per-layer remat cells XLA's scheduler otherwise hoists EVERY layer's
        filter recompute to the front of the backward pass — at 1M tokens
        that is 8 simultaneously-live f32 (L, d) banks (977 MB each), the
        difference between fitting on one 16 GB chip and OOM."""
        z = self.pos_emb_z[:, :L]
        if anchor is not None:
            z, _ = jax.lax.optimization_barrier(
                (z, jax.lax.stop_gradient(anchor)))
        t = jnp.linspace(0.0, 1.0, self.seq_len, dtype=jnp.float32)[None, :L, None]
        if self.linear_mixer:
            h = self.mlp_out(z)
        else:
            h = jnp.sin(self.freq * self.mlp_in(z))
            for layer in self.mlp_inner:
                h = jnp.sin(self.freq * layer(h))
            h = self.mlp_out(h)
        # in reduced precision, cast BEFORE the modulation so every (L, d)
        # buffer past the MLP — and every backward cotangent — is out_dtype
        # (the f32 cotangent banks otherwise dominate HBM at 1M tokens)
        h = h.astype(out_dtype)
        if self.modulate:
            decay = jnp.exp(-t * jnp.abs(self.deltas))
            h = h * (decay + self.modulation_shift).astype(out_dtype)
        if self.normalized:
            h = h / jnp.linalg.norm(
                h.astype(jnp.float32), ord=1, axis=-1, keepdims=True
            ).astype(out_dtype)
        return h

    def __call__(
        self,
        x: jax.Array,
        L: int,
        k: jax.Array | None = None,
        bias: jax.Array | None = None,
    ) -> jax.Array:
        """Apply the long conv: x (..., C, L) -> (..., C, L).

        Long-context memory: whenever the layout can be normalized to
        (N, C, L) the conv runs channel-chunked (bounded FFT workspace —
        at 450k+ the full-width conv's f32 spectra otherwise exceed HBM)."""
        if k is None:
            k = self.filter(L)[0].T  # (d_model, L)
        if bias is None:
            bias = self.bias
        if not self.use_bias:
            bias = jnp.zeros_like(bias)

        from hyena_dna_tpu.ops.fftconv import fftconv_aliased, fftconv_chunked

        c = k.shape[0]
        bias_arr = jnp.asarray(bias)
        if bias_arr.size == c:
            if x.ndim == 3 and x.shape[-2] == c:
                if k.shape[-1] > x.shape[-1]:
                    # kernel longer than signal (num_blocks > 1): the conv is
                    # circular at exactly 2L with kernel aliasing, as in the
                    # reference (`hyena.py:77` + torch rfft crop semantics)
                    y = fftconv_aliased(x, k, bias_arr.reshape(c))
                else:
                    y = fftconv_chunked(x, k, bias_arr.reshape(c), False)
                return tag_conv_out(y.astype(x.dtype))
            if x.ndim == 5 and x.shape[-3] == c:
                b, ho, _, z, l = x.shape
                xt = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b * ho * z, c, l)
                if k.shape[-1] > l:
                    y = fftconv_aliased(xt, k, bias_arr.reshape(c))
                else:
                    y = fftconv_chunked(xt, k, bias_arr.reshape(c), False)
                y = jnp.transpose(y.reshape(b, ho, z, c, l), (0, 1, 3, 2, 4))
                return tag_conv_out(y.astype(x.dtype))
        y = fftconv(x, k, bias, False)
        return tag_conv_out(y.astype(x.dtype))
