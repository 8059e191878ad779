"""Tests for legacy ops (toeplitz/krylov/vandermonde), permutations, and the
block (monarch) FFT against numpy/jnp oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyena_dna_tpu.models.block_fft import BlockFFT, block_fft, ref_dft_matrix
from hyena_dna_tpu.ops.legacy import (
    causal_convolution,
    construct_toeplitz,
    krylov,
    krylov_sequential,
    log_vandermonde,
    log_vandermonde_transpose,
    power,
    triangular_toeplitz_multiply,
    vandermonde_naive,
)
from hyena_dna_tpu.utils.permutations import (
    bitreversal_permutation,
    bitreversal_po2,
    snake_permutation,
    transpose_permutation,
)


def test_construct_toeplitz_matches_shift_structure():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    K = np.asarray(construct_toeplitz(v))
    # column j = Z^j v (lower-triangular shift with f=0)
    expected = np.array([
        [1, 0, 0, 0],
        [2, 1, 0, 0],
        [3, 2, 1, 0],
        [4, 3, 2, 1],
    ], dtype=np.float32)
    np.testing.assert_allclose(K, expected)


def test_toeplitz_multiply_is_causal_conv():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    out = triangular_toeplitz_multiply(u, v)
    ref = np.stack([np.convolve(a, b)[:16] for a, b in zip(np.asarray(u), np.asarray(v))])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    # matrix view agrees
    out2 = causal_convolution(u, v, fast=False)
    np.testing.assert_allclose(np.asarray(out2), ref, atol=1e-4)


def test_krylov_matches_sequential():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)) * 0.5
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    K1 = krylov(8, A, b)
    # explicit: K[:, l] = A^l b
    cols = [np.asarray(b)]
    for _ in range(7):
        cols.append(np.asarray(A) @ cols[-1])
    np.testing.assert_allclose(np.asarray(K1), np.stack(cols, -1), atol=1e-4)
    c = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    Kc = krylov(8, A, b, c=c)
    np.testing.assert_allclose(
        np.asarray(Kc), np.einsum("n,nl->l", np.asarray(c), np.stack(cols, -1)),
        atol=1e-4,
    )


def test_power_binary_exponentiation():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32)) * 0.7
    for L in (1, 2, 5, 8, 13):
        out = power(L, A)
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.matrix_power(np.asarray(A), L), atol=1e-3
        )


def test_vandermonde():
    rng = np.random.default_rng(3)
    N, L = 4, 8
    v = jnp.asarray((rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64))
    x = jnp.asarray((-0.1 + 1j * rng.normal(size=N)).astype(np.complex64))
    out = vandermonde_naive(v, x, L, conj=False)
    ref = np.stack([np.sum(np.asarray(v) * np.asarray(x) ** l) for l in range(L)])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-2, rtol=1e-3)
    # log form agrees with exp(x)^l
    out_log = log_vandermonde(v, jnp.log(x), L, conj=False)
    np.testing.assert_allclose(np.asarray(out_log), ref, atol=1e-2, rtol=1e-3)
    u = jnp.asarray(rng.normal(size=L).astype(np.float32))
    t = log_vandermonde_transpose(u, v, jnp.log(x), L)
    ref_t = np.asarray(v) * np.sum(
        np.asarray(u)[:, None] * np.asarray(x)[None, :] ** np.arange(L)[:, None], 0
    )
    np.testing.assert_allclose(np.asarray(t), ref_t, atol=1e-2, rtol=1e-3)


def test_permutations():
    np.testing.assert_array_equal(bitreversal_po2(8), [0, 4, 2, 6, 1, 5, 3, 7])
    p = bitreversal_permutation(6)
    assert sorted(p.tolist()) == list(range(6))
    np.testing.assert_array_equal(
        transpose_permutation(2, 3), [0, 3, 1, 4, 2, 5]
    )
    np.testing.assert_array_equal(
        snake_permutation(2, 3), [0, 1, 2, 5, 4, 3]
    )


def test_block_fft_matches_fft():
    rng = np.random.default_rng(4)
    for N in (16, 64, 256):
        k = jnp.asarray(rng.normal(size=(2, N)).astype(np.float32))
        out = block_fft(k, N, max_m=16)
        ref = np.fft.fft(np.asarray(k), n=N)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-2, rtol=1e-3)


def test_block_fft_module_init_is_exact_fft():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    mod = BlockFFT(N=64, learn_dft_matrices=True)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.fft.fft(np.asarray(x)), atol=1e-2, rtol=1e-3)
    # inverse roundtrip
    inv = mod.apply({"params": params}, out, forward=False)
    # note: inverse blocks are conj-transposed DFTs only when not learned;
    # with learned (initialized) mats the roundtrip still holds at init
    np.testing.assert_allclose(np.asarray(inv.real), np.asarray(x), atol=1e-2)


def test_long_conv_block_fft_path():
    from hyena_dna_tpu.models.long_conv import LongConv

    layer = LongConv(d_model=8, l_max=32, activation="id", postact=None,
                     block_fft_conv=True, block_fft_conv_args={"max_m": 16})
    layer_ref = LongConv(d_model=8, l_max=32, activation="id", postact=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 8))
    params = layer.init(jax.random.PRNGKey(1), x)["params"]
    y, _ = layer.apply({"params": params}, x)
    # with DFT-initialized matrices the block path equals the exact FFT conv
    ref_params = {k: v for k, v in params.items() if not k.startswith("block_fft")}
    y_ref, _ = layer_ref.apply({"params": ref_params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3, rtol=1e-3)


def test_krylov_sequential_matches_squaring():
    rng = np.random.default_rng(6)
    A = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)) * 0.5
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(krylov_sequential(8, A, b)), np.asarray(krylov(8, A, b)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(krylov_sequential(8, A, b, c=c)), np.asarray(krylov(8, A, b, c=c)),
        atol=1e-4,
    )


def test_power_with_vector():
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32)) * 0.5
    v = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    out = power(6, A, v=v)
    ref = np.linalg.matrix_power(np.asarray(A), 6) @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
