"""Discrete cosine transforms (DCT-II / DCT-III) via FFT.

Parity target: `/root/reference/src/models/nn/dxt.py:12-196` — DCT/IDCT
modules with dense / 4N-FFT / 2N-FFT / N-FFT evaluation modes and
'backward'/'ortho' normalization. Used by spectral-pooling style layers and
as a self-tested numerical utility.
"""

from __future__ import annotations

import math
from typing import Literal

import jax
import jax.numpy as jnp


def dct_matrix(n: int, norm: str = "backward") -> jnp.ndarray:
    """Dense DCT-II matrix: X[k] = sum_j x[j] cos(pi k (2j+1) / (2N))."""
    j = jnp.arange(n)[None, :]
    k = jnp.arange(n)[:, None]
    m = 2.0 * jnp.cos(math.pi * k * (2 * j + 1) / (2 * n))  # scipy type-2
    if norm == "ortho":
        scale = jnp.full((n, 1), math.sqrt(1.0 / (2 * n)))
        scale = scale.at[0, 0].set(math.sqrt(1.0 / (4 * n)))
        m = m * scale
    return m


def dct(x: jax.Array, norm: str = "backward", mode: Literal["dense", "2n", "4n"] = "2n") -> jax.Array:
    """DCT-II along the last axis."""
    n = x.shape[-1]
    if mode == "dense":
        return jnp.einsum("...j,kj->...k", x, dct_matrix(n, norm))
    if mode == "4n":
        # interleave into a 4N zero-padded odd extension
        z = jnp.zeros(x.shape[:-1] + (4 * n,), x.dtype)
        z = z.at[..., 1 : 2 * n : 2].set(x)
        z = z.at[..., 2 * n + 1 :: 2].set(x[..., ::-1])
        X = jnp.fft.rfft(z)[..., :n].real
        if norm == "ortho":
            X = _ortho_scale(X, n)
        return X
    # 2n: reflect-concatenate then phase-shift
    z = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    Xf = jnp.fft.fft(z)[..., :n]
    k = jnp.arange(n)
    phase = jnp.exp(-1j * math.pi * k / (2 * n))
    X = (Xf * phase).real
    if norm == "ortho":
        X = _ortho_scale(X, n)
    return X


def _ortho_scale(X, n):
    scale = jnp.full((n,), math.sqrt(1.0 / (2 * n)))
    scale = scale.at[0].set(math.sqrt(1.0 / (4 * n)))
    return X * scale


def idct(x: jax.Array, norm: str = "backward") -> jax.Array:
    """DCT-III (inverse of DCT-II up to normalization) along the last axis.

    With norm='ortho' this is the exact inverse of `dct(..., norm='ortho')`;
    with 'backward' it matches the reference's unnormalized IDCT (inverse up
    to the factor N/2 plus the DC offset, as in scipy's dct type 3)."""
    n = x.shape[-1]
    if norm == "ortho":
        # exact inverse: transpose of the orthonormal DCT-II matrix
        return jnp.einsum("...k,kj->...j", x, dct_matrix(n, "ortho"))
    # scipy unnormalized DCT-III: y[j] = x0 + 2 sum_{k>=1} xk cos(pi k (2j+1)/(2N))
    j = jnp.arange(n)[None, :]
    k = jnp.arange(n)[:, None]
    m3 = 2.0 * jnp.cos(math.pi * k * (2 * j + 1) / (2 * n))
    y = jnp.einsum("...k,kj->...j", x, m3)
    return y - x[..., :1]
