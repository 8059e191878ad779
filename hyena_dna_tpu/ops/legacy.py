"""Legacy S4-support kernels: Toeplitz/causal-conv views, Krylov kernel
construction, and Vandermonde contractions.

Parity targets:
  * `construct_toeplitz` / `triangular_toeplitz_multiply` / `causal_convolution`
    (`/root/reference/src/ops/toeplitz.py:14-157`) — the three equivalent
    views of causal convolution;
  * `krylov` (squaring trick), `krylov_sequential`, `power` (binary
    exponentiation with optional v product)
    (`/root/reference/src/ops/krylov.py:15-139`);
  * `vandermonde_naive` / `log_vandermonde` / transpose variants
    (`/root/reference/src/ops/vandermonde.py:30-105`) — the pykeops path is
    replaced by plain einsum (XLA fuses the exp·matmul chain on TPU).

These back the S4/S4D model family surface; HyenaDNA itself does not call
them at runtime (SURVEY §2.4 marks them legacy), but they complete the ops
inventory with tested TPU-native equivalents.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hyena_dna_tpu.ops.fftconv import _irfft, _rfft


# --------------------------------------------------------------------------
# toeplitz
# --------------------------------------------------------------------------


def construct_toeplitz(v: jax.Array, f: float = 0.0) -> jax.Array:
    """Krylov matrix [v, Av, A²v, ...] for the f-circulant shift A = Z_f
    (`toeplitz.py:14-30`). v: (..., n) -> (..., n, n)."""
    n = v.shape[-1]
    a = jnp.arange(n)
    indices = a[:, None] - a[None, :]
    K = v[..., indices % n]
    return jnp.where(indices < 0, f * K, K)


def triangular_toeplitz_multiply(u: jax.Array, v: jax.Array) -> jax.Array:
    """Product of lower-triangular Toeplitz matrices == causal conv
    (`toeplitz.py:32-42`)."""
    n = u.shape[-1]
    u_f = _rfft(u, n=2 * n)
    v_f = _rfft(v, n=2 * n)
    return _irfft(u_f * v_f, n=2 * n)[..., :n]


def triangular_toeplitz_multiply_padded(u: jax.Array, v: jax.Array) -> jax.Array:
    """Variant on already-0-padded inputs (`toeplitz.py:44-53`)."""
    n = u.shape[-1]
    assert n % 2 == 0
    out = _irfft(_rfft(u, n=n) * _rfft(v, n=n), n=n)
    return out.at[..., n // 2 :].set(0.0)


def causal_convolution(u: jax.Array, v: jax.Array, fast: bool = True, pad: bool = False) -> jax.Array:
    """Causal convolution front-end (`toeplitz.py:149-157`). The non-fast
    path multiplies explicit Toeplitz matrices (the correctness oracle)."""
    if not pad and not fast:
        K_u = construct_toeplitz(u)
        return jnp.einsum("...ij,...j->...i", K_u, v)
    if pad:
        return triangular_toeplitz_multiply_padded(u, v)
    return triangular_toeplitz_multiply(u, v)


# --------------------------------------------------------------------------
# krylov
# --------------------------------------------------------------------------


def krylov_sequential(L: int, A: jax.Array, b: jax.Array, c: Optional[jax.Array] = None):
    """[b, Ab, A²b, ...] by sequential multiplication (`krylov.py:15-47`).
    A: (..., N, N), b: (..., N) -> (..., N, L) (or (..., L) with c)."""

    def body(x, _):
        nxt = jnp.einsum("...ij,...j->...i", A, x)
        return nxt, (jnp.sum(c * x, axis=-1) if c is not None else x)

    _, ys = jax.lax.scan(body, b, None, length=L)
    return jnp.moveaxis(ys, 0, -1)  # (..., L) with c, else (..., N, L)


def krylov(L: int, A: jax.Array, b: jax.Array, c: Optional[jax.Array] = None,
           return_power: bool = False):
    """Krylov matrix via the squaring trick (`krylov.py:50-92`): O(log L)
    matmuls of doubling width."""
    x = b[..., None]  # (..., N, 1)
    A_ = A
    done = x.shape[-1] >= L
    while x.shape[-1] < L:
        x2 = A_ @ x
        x = jnp.concatenate([x, x2], axis=-1)
        A_ = A_ @ A_
    x = x[..., :L]
    if c is not None:
        x = jnp.einsum("...n,...nl->...l", c, x)
    if return_power:
        return x, A_
    return x


def power(L: int, A: jax.Array, v: Optional[jax.Array] = None):
    """A^L (and optionally Σ-free product with v) by binary exponentiation
    (`krylov.py:95-139`)."""
    I = jnp.eye(A.shape[-1], dtype=A.dtype)
    result = jnp.broadcast_to(I, A.shape)
    powers = A
    l = L
    while l > 0:
        if l % 2 == 1:
            result = powers @ result
        l //= 2
        if l > 0:
            powers = powers @ powers
    if v is None:
        return result
    return jnp.einsum("...ij,...j->...i", result, v)


# --------------------------------------------------------------------------
# vandermonde
# --------------------------------------------------------------------------


def vandermonde_naive(v: jax.Array, x: jax.Array, L: int, conj: bool = True) -> jax.Array:
    """Σ_n v_n x_n^l (`vandermonde.py:30-40`). v, x: (..., N) complex ->
    (..., L) real (2*Re when conj)."""
    vand = x[..., None] ** jnp.arange(L)  # (..., N, L)
    out = jnp.einsum("...n,...nl->...l", v, vand)
    return 2 * out.real if conj else out


def log_vandermonde(v: jax.Array, x: jax.Array, L: int, conj: bool = True) -> jax.Array:
    """Σ_n v_n exp(x_n l) — numerically-preferred form (`vandermonde.py:43-53`)."""
    vand = jnp.exp(x[..., None] * jnp.arange(L))  # (..., N, L)
    out = jnp.einsum("...n,...nl->...l", v, vand)
    return 2 * out.real if conj else out


def log_vandermonde_transpose(u: jax.Array, v: jax.Array, x: jax.Array, L: int) -> jax.Array:
    """Σ_l u_l v_n exp(x_n l) (`vandermonde.py:95-105`)."""
    vand = jnp.exp(x[..., None] * jnp.arange(L))  # (..., N, L)
    return jnp.einsum("...l,...n,...nl->...n", u, v, vand)
