"""Block (monarch) FFT: Cooley-Tukey with (optionally learnable) DFT blocks.

Parity target: `/root/reference/src/models/sequence/block_fft.py:10-176` —
the H3-paper block-FFT: reshape to (m, n), m-length DFT matmuls, twiddle
multiply, recurse on n, with base-case blocks of at most `max_m` (simulated
16x16 tensor cores there — real 128x128 MXU tiles here). `BlockFFT` makes
the base DFT matrices learnable parameters (initialized to the true DFT) and
reduces to the exact FFT when `learn_dft_matrices=False`.

Consumed by `LongConv(block_fft_conv=True)`.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


def ref_dft_matrix(n: int) -> jnp.ndarray:
    a = jnp.arange(n)
    return jnp.exp(-2j * jnp.pi * a[:, None] * a[None, :] / n)


def compute_twiddle_factors(n: int, m: int) -> jnp.ndarray:
    return jnp.exp(-2j * jnp.pi * jnp.arange(n)[:, None] * jnp.arange(m)[None, :] / (n * m))


def _cooley_tukey(k: jax.Array, n: int, m: int, mats, max_m: int, depth: int = 0):
    """k: (..., m*n) complex. mats: list of (size, matrix) per recursion depth
    (matrix may be a learnable parameter)."""
    shape = k.shape[:-1]
    k = k.reshape(*shape, m, n)
    mat_m = mats[depth]
    k_f = jnp.einsum("mo,...on->...mn", mat_m, k)
    twi = compute_twiddle_factors(n, m)
    k_f = jnp.einsum("nm,...mn->...nm", twi, k_f)
    if n <= max_m:
        mat_n = mats[depth + 1]
        k_f = jnp.einsum("no,...om->...nm", mat_n, k_f)
    else:
        k_f = jnp.swapaxes(k_f, -1, -2).reshape(*shape, m, n)
        k_f = _cooley_tukey(k_f, n // max_m, max_m, mats, max_m, depth + 1)
        k_f = k_f.reshape(*shape, m, n).swapaxes(-1, -2)
    return k_f.reshape(*shape, n * m)


def _plan(N: int, max_m: int):
    """Sizes of the base DFT matrices for each recursion depth."""
    sizes = []
    n = N
    while n > max_m:
        sizes.append(max_m)
        n //= max_m
    sizes.append(n)
    return sizes


def block_fft(k: jax.Array, N: int, max_m: int = 16, mats=None) -> jax.Array:
    """FFT of length N via block Cooley-Tukey (`block_fft.py:91-131`)."""
    if not math.log2(N).is_integer():
        N = 1 << math.ceil(math.log2(N))
    if k.shape[-1] != N:
        pad = [(0, 0)] * (k.ndim - 1) + [(0, N - k.shape[-1])]
        k = jnp.pad(k, pad)
    k = k.astype(jnp.complex64)
    sizes = _plan(N, max_m)
    if mats is None:
        mats = [ref_dft_matrix(s) for s in sizes]
    if len(sizes) == 1:
        return jnp.einsum("no,...o->...n", mats[0], k)
    m = sizes[0]
    return _cooley_tukey(k, N // m, m, mats, max_m)


class BlockFFT(fnn.Module):
    """Learnable block FFT (`block_fft.py:115-162`): one learnable matrix per
    power-of-2 block size up to max_m (shared across recursion depths, as in
    the reference's `compute_dft_matrix`); iFFT via the conjugation identity
    ifft(x) = conj(fft(conj(x)))/N (`block_fft.py:158-162`)."""

    N: int = 1024
    max_m: int = 16
    learn_dft_matrices: bool = True
    learn_additive: bool = False
    dtype: Any = jnp.complex64

    def _mats_for(self, sizes):
        mats = []
        for s in sizes:
            base = ref_dft_matrix(s)
            if not self.learn_dft_matrices:
                mats.append(base)
                continue
            if self.learn_additive:
                re = self.param(f"mat_{s}_re",
                                fnn.initializers.normal(stddev=0.01), (s, s))
                im = self.param(f"mat_{s}_im",
                                fnn.initializers.normal(stddev=0.01), (s, s))
                mats.append(base + re + 1j * im)
            else:
                re = self.param(f"mat_{s}_re", lambda k_, sh, b=base: jnp.real(b), (s, s))
                im = self.param(f"mat_{s}_im", lambda k_, sh, b=base: jnp.imag(b), (s, s))
                mats.append(re + 1j * im)
        return mats

    @fnn.compact
    def __call__(self, x: jax.Array, N: Optional[int] = None, forward: bool = True) -> jax.Array:
        n = N or self.N
        n_pow2 = 1 << math.ceil(math.log2(n))
        sizes = _plan(n_pow2, self.max_m)
        mats = self._mats_for(sizes)
        if forward:
            return block_fft(x, n_pow2, max_m=self.max_m, mats=mats)
        x = jnp.conj(x.astype(jnp.complex64))
        out = block_fft(x, n_pow2, max_m=self.max_m, mats=mats)
        return jnp.conj(out) / n_pow2
