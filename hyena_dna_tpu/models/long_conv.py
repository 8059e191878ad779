"""Directly-parameterized long convolution layer (registered `long-conv`).

Parity targets:
  * `LongConvKernel` (`/root/reference/src/models/sequence/long_conv_kernel.py:8-82`):
    explicit kernel parameter (channels, H, L) with random / double-exp init,
    L1-style squashing `relu(|k|-lam)*sign(k)`, optional moving-average or
    frequency-domain smoothing, kernel dropout, per-tensor learning rate.
  * `LongConv` (`long_conv.py:18-173`): FFT convolution of the squashed
    kernel with the input (length-padded to L_kernel+L), per-channel D skip,
    GLU output transform. The learnable `BlockFFT` (monarch) path is S4-era
    legacy gated behind `block_fft_conv` — represented here by the direct
    FFT (the learnable-DFT decomposition contradicts XLA's fused FFT and is
    dead config surface in the DNA experiments).

The kernel parameter gets the "filter" optimizer label treatment via
`learning_rate` (reference `OptimModule.register`).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from hyena_dna_tpu.models.nn import activation_fn
from hyena_dna_tpu.ops.fftconv import _irfft, _rfft, next_fast_fft_size


def _double_exp_init(key, shape, dtype=jnp.float32):
    c, h, l = shape
    k = jax.random.normal(key, shape, dtype) * 0.02
    i = jnp.arange(h)[:, None]
    j = jnp.arange(l)[None, :]
    double_exp = jnp.exp(-(j / l) * jnp.power(float(h // 2), i / h))
    return k * double_exp[None]


class LongConvKernel(fnn.Module):
    H: int
    L: int
    channels: int = 1
    learning_rate: Optional[float] = None
    lam: float = 0.1
    causal: bool = True
    kernel_dropout: float = 0.0
    weight_init: str = "random"
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False

    @property
    def kernel_length(self) -> int:
        return self.L if self.causal else self.L * 2

    def setup(self):
        shape = (self.channels, self.H, self.kernel_length)
        if self.weight_init == "random":
            init = lambda key, s: jax.random.normal(key, s) * 0.002
        elif self.weight_init == "double_exp":
            init = _double_exp_init
        else:
            raise NotImplementedError(f"weight_init {self.weight_init!r}")
        self.kernel = self.param("kernel", init, shape)
        self.drop = fnn.Dropout(rate=self.kernel_dropout)

    def __call__(self, L: Optional[int] = None, deterministic: bool = True, **kwargs):
        k = self.kernel
        if self.use_ma_smoothing:
            w = self.ma_window_len
            if self.smooth_freq:
                weight = jnp.exp(-0.5 * jnp.abs(jnp.arange(w) - w // 2) ** 2)
                k_f = jnp.fft.rfft(k, axis=-1)
                # depthwise 'same' conv over frequency bins
                pad = w // 2
                k_f_p = jnp.pad(k_f, [(0, 0), (0, 0), (pad, pad)])
                sm = sum(
                    weight[j] * k_f_p[..., j : j + k_f.shape[-1]] for j in range(w)
                )
                k = jnp.fft.irfft(sm, axis=-1)
            else:
                assert w % 2 != 0, "window size must be odd"
                pad = w // 2
                kp = jnp.pad(k, [(0, 0), (0, 0), (pad, pad)])
                k = sum(kp[..., j : j + k.shape[-1]] for j in range(w)) / w
        k = jax.nn.relu(jnp.abs(k) - self.lam) * jnp.sign(k)
        k = self.drop(k, deterministic=deterministic)
        return k, None

    @property
    def d_output(self) -> int:
        return self.H


class LongConv(fnn.Module):
    d_model: int
    l_max: int = 1024
    channels: int = 1
    bidirectional: bool = False
    activation: str = "gelu"
    postact: Optional[str] = "glu"
    dropout: float = 0.0
    transposed: bool = False  # accepted for parity; layout is (B, L, H)
    kernel_cfg: Optional[dict] = None
    block_fft_conv: bool = False  # monarch/learnable block-FFT path
    block_fft_conv_args: Optional[dict] = None
    learn_ifft: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.D = self.param(
            "D", fnn.initializers.normal(1.0), (self.channels, self.d_model)
        )
        kcfg = dict(self.kernel_cfg or {})
        self.kernel = LongConvKernel(
            H=self.d_model,
            L=self.l_max,
            channels=self.channels * (2 if self.bidirectional else 1),
            name="kernel",
            **kcfg,
        )
        if self.block_fft_conv:
            from hyena_dna_tpu.models.block_fft import BlockFFT

            args = dict(self.block_fft_conv_args or {})
            self.block_fft_u = BlockFFT(name="block_fft_u", **args)
            self.block_fft_k = BlockFFT(name="block_fft_k", **args)
        self.act = activation_fn(self.activation)
        self.drop = fnn.Dropout(rate=self.dropout)
        if self.postact is not None:
            # GLU postact halves features: project to 2*d then glu -> d
            mult = 2 if self.postact == "glu" else 1
            self.output_linear = fnn.Dense(
                self.d_model * mult, dtype=self.dtype, name="output_linear"
            )
            self.postact_fn = activation_fn(self.postact)

    def __call__(self, u: jax.Array, state=None, deterministic: bool = True, **kwargs):
        """u: (B, L, H) -> (B, L, H)."""
        u = jnp.swapaxes(u, -1, -2)  # (B, H, L)
        L = u.shape[-1]
        L_kernel = min(L, self.l_max)
        k, _ = self.kernel(L=L_kernel, deterministic=deterministic)  # (C', H, Lk)
        k = k[..., :L_kernel]

        if self.bidirectional:
            k0, k1 = jnp.split(k, 2, axis=0)
            k = jnp.pad(k0, [(0, 0), (0, 0), (0, L)]) + jnp.pad(
                k1[..., ::-1], [(0, 0), (0, 0), (L, 0)]
            )

        n = next_fast_fft_size(L_kernel + L)
        if self.block_fft_conv:
            # learnable block-FFT path (`long_conv.py:140-147`)
            k_f = self.block_fft_k(k.astype(jnp.complex64), N=n)
            u_f = self.block_fft_u(u.astype(jnp.complex64), N=n)
            y_f = jnp.einsum("bhf,chf->bchf", u_f, k_f)
            if self.learn_ifft:
                y = self.block_fft_u(y_f, N=n, forward=False).real[..., :L]
            else:
                y = jnp.fft.ifft(y_f, n=n, axis=-1).real[..., :L]
        else:
            k_f = _rfft(k.astype(jnp.float32), n=n)  # (C, H, F)
            u_f = _rfft(u.astype(jnp.float32), n=n)  # (B, H, F)
            y_f = jnp.einsum("bhf,chf->bchf", u_f, k_f)
            y = _irfft(y_f, n=n)[..., :L]  # (B, C, H, L)
        y = y + jnp.einsum("bhl,ch->bchl", u.astype(jnp.float32), self.D)
        y = y.reshape(y.shape[0], -1, L)  # (B, C*H, L)
        y = jnp.swapaxes(y, -1, -2)  # (B, L, C*H)
        y = self.act(y.astype(self.dtype))
        y = self.drop(y, deterministic=deterministic)
        if self.postact is not None:
            y = self.postact_fn(self.output_linear(y))
        return y, None

    @property
    def d_output(self) -> int:
        return self.d_model
