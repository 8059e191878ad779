"""Parity tests: JAX fftconv vs torch oracle and vs direct convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hyena_dna_tpu.ops import fftconv, fftconv_ref, short_conv_1d

from torch_oracle import fftconv_oracle, short_conv_oracle


@pytest.mark.parametrize("L", [16, 100, 1024])
@pytest.mark.parametrize("shape", ["bcl", "bhvzl"])
def test_fftconv_matches_oracle(L, shape):
    rng = np.random.default_rng(0)
    C = 8
    if shape == "bcl":
        u = rng.standard_normal((2, C, L)).astype(np.float32)
        D = rng.standard_normal((C,)).astype(np.float32)
    else:
        u = rng.standard_normal((2, 1, C, 1, L)).astype(np.float32)
        D = rng.standard_normal((1, C, 1)).astype(np.float32)
    k = rng.standard_normal((C, L)).astype(np.float32)

    got = np.asarray(fftconv_ref(jnp.asarray(u), jnp.asarray(k), jnp.asarray(D)))
    want = fftconv_oracle(torch.as_tensor(u), torch.as_tensor(k), torch.as_tensor(D)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fftconv_is_causal_conv():
    """Direct O(L^2) causal convolution check."""
    rng = np.random.default_rng(1)
    L, C = 32, 3
    u = rng.standard_normal((1, C, L)).astype(np.float32)
    k = rng.standard_normal((C, L)).astype(np.float32)
    got = np.asarray(fftconv_ref(jnp.asarray(u), jnp.asarray(k), None))
    want = np.zeros_like(u[0])
    for c in range(C):
        for t in range(L):
            want[c, t] = sum(u[0, c, s] * k[c, t - s] for s in range(t + 1))
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_fftconv_gelu_and_custom_vjp_grads():
    rng = np.random.default_rng(2)
    B, C, L = 2, 4, 64
    u = jnp.asarray(rng.standard_normal((B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((C, L)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))

    for gelu in (False, True):
        # forward parity custom_vjp vs ref
        y1 = fftconv(u, k, D, gelu)
        y2 = fftconv_ref(u, k, D, gelu=gelu)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)

        # gradient parity: custom_vjp vs autodiff through the ref
        f1 = lambda u, k, D: jnp.sum(jnp.sin(fftconv(u, k, D, gelu)))
        f2 = lambda u, k, D: jnp.sum(jnp.sin(fftconv_ref(u, k, D, gelu=gelu)))
        g1 = jax.grad(f1, argnums=(0, 1, 2))(u, k, D)
        g2 = jax.grad(f2, argnums=(0, 1, 2))(u, k, D)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fftconv_vjp_grads_5d_broadcast():
    """The Hyena inner loop shape: u (B, H, C, Z, L), k (C, L), D (1, C, 1)."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2, 1, 4, 1, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((1, 4, 1)).astype(np.float32))

    f1 = lambda u, k, D: jnp.sum(jnp.tanh(fftconv(u, k, D, False)))
    f2 = lambda u, k, D: jnp.sum(jnp.tanh(fftconv_ref(u, k, D)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(u, k, D)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(u, k, D)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fftconv_bidirectional():
    rng = np.random.default_rng(4)
    u = rng.standard_normal((2, 4, 48)).astype(np.float32)
    k = rng.standard_normal((4, 48)).astype(np.float32)
    got = np.asarray(fftconv_ref(jnp.asarray(u), jnp.asarray(k), None, bidirectional=True))
    want = fftconv_oracle(torch.as_tensor(u), torch.as_tensor(k), None, bidirectional=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fftconv_bf16_inputs():
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((2, 4, 128)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    y = fftconv(u, k, D, False)
    assert y.dtype == jnp.bfloat16
    y32 = fftconv(u.astype(jnp.float32), k, D, False)
    np.testing.assert_allclose(
        np.asarray(y, dtype=np.float32), np.asarray(y32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("K", [3, 5])
def test_short_conv_matches_torch(K):
    rng = np.random.default_rng(6)
    B, C, L = 2, 6, 40
    x = rng.standard_normal((B, C, L)).astype(np.float32)
    w = rng.standard_normal((C, K)).astype(np.float32)
    b = rng.standard_normal((C,)).astype(np.float32)
    got = np.asarray(short_conv_1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = short_conv_oracle(torch.as_tensor(x), torch.as_tensor(w), torch.as_tensor(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fftconv_chunked_matches_unchunked():
    import jax

    from hyena_dna_tpu.ops import fftconv, fftconv_chunked

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(2, 16, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    ref = fftconv(u, k, D, False)
    out = fftconv_chunked(u, k, D, False, channel_block=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients flow through the scan and match
    g_ref = jax.grad(lambda u, k, D: jnp.sum(fftconv(u, k, D, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
    g_out = jax.grad(
        lambda u, k, D: jnp.sum(fftconv_chunked(u, k, D, False, channel_block=4) ** 2),
        argnums=(0, 1, 2),
    )(u, k, D)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fftconv_two_step_path_parity():
    """Force the two-step FFT path at small size and check fwd+bwd parity."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")

    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2), argnums=(0, 1, 2))(u, k, D)

    old = F.TWO_STEP_FFT_MIN
    F.TWO_STEP_FFT_MIN = 64
    try:
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-3, rtol=1e-3)
        g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2), argnums=(0, 1, 2))(u, k, D)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-3)
    finally:
        F.TWO_STEP_FFT_MIN = old


def test_fftconv_chunk_size_math():
    from hyena_dna_tpu.ops.fftconv import fftconv_chunk_size, next_fast_fft_size

    # 450k context: fft 2^20, ~4MB/channel spectrum -> 32-channel chunks
    assert next_fast_fft_size(2 * 450048) == 1 << 20
    blk = fftconv_chunk_size(256, 450048)
    assert 256 % blk == 0 and blk <= 64
    # small L: no chunking
    assert fftconv_chunk_size(256, 1024) == 256


def test_fftconv_mxu_matches_reference():
    import importlib

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref = fftconv(u, k, D, False)
    old_sd = F.MXU_SPECTRUM_DTYPE
    F.MXU_SPECTRUM_DTYPE = None  # exactness check: f32 storage
    try:
        out = F.fftconv_mxu(u, k, D, False)
    finally:
        F.MXU_SPECTRUM_DTYPE = old_sd
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fft_matmul_roundtrip():
    from hyena_dna_tpu.ops.fftconv import fft_matmul, ifft_matmul

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(3, 200)).astype(np.float32))
    back = ifft_matmul(fft_matmul(x, 512), 512)
    np.testing.assert_allclose(np.asarray(back.real[..., :200]), np.asarray(x),
                               atol=1e-4)


def test_fftconv_mxu_path_parity_fwd_bwd():
    """Force the MXU matmul-FFT path and check fwd+grad parity vs the
    rfft-based conv at a realistic size."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(13)
    u = jnp.asarray(rng.normal(size=(1, 8, 4096)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(8, 4096)) * 0.02).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
    old_min, old_use = F.MATMUL_FFT_MIN, F._use_mxu_fft
    old_sd = F.MXU_SPECTRUM_DTYPE
    F.MATMUL_FFT_MIN = 1024
    F._use_mxu_fft = lambda n, rows=1: n >= 1024  # ignore backend gate for the test
    F.MXU_SPECTRUM_DTYPE = None  # f32 storage: this test checks structure
    try:
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
    finally:
        F.MATMUL_FFT_MIN, F._use_mxu_fft = old_min, old_use
        F.MXU_SPECTRUM_DTYPE = old_sd


def test_fftconv_mxu_bf16_spectrum_tolerance():
    """bf16 interior spectra (the TPU default) stay within bf16-training
    tolerance of the f32 conv."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(21)
    u = jnp.asarray(rng.normal(size=(2, 8, 2048)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(8, 2048)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref_y = F.fftconv(u, k, D, False)
    old_use, old_sd = F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE
    F._use_mxu_fft = lambda n, rows=1: n >= 1024
    F.MXU_SPECTRUM_DTYPE = jnp.bfloat16
    try:
        y = F.fftconv(u, k, D, False)
        scale = float(np.abs(np.asarray(ref_y)).max())
        err = float(np.abs(np.asarray(y) - np.asarray(ref_y)).max()) / scale
        assert err < 3e-2, f"bf16 spectrum error too large: {err}"
        g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
        assert all(np.isfinite(np.asarray(x)).all() for x in g)
    finally:
        F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE = old_use, old_sd


def test_fftconv_mxu_packed_matches_reference():
    from hyena_dna_tpu.ops.fftconv import fftconv_mxu_packed

    rng = np.random.default_rng(15)
    for shape in ((2, 8, 128), (1, 16, 200)):
        u = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        k = jnp.asarray((rng.normal(size=shape[1:]) * 0.05).astype(np.float32))
        D = jnp.asarray(rng.normal(size=(shape[1],)).astype(np.float32))
        ref = fftconv(u, k, D, False)
        out = fftconv_mxu_packed(u, k, D, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3, err_msg=str(shape))


def test_fftconv_packed_path_fwd_bwd_parity():
    """Force the packed MXU path through the custom VJP; fwd+grad parity."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(16)
    u = jnp.asarray(rng.normal(size=(2, 8, 512)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(8, 512)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
    old = F._use_mxu_fft
    old_packed = F.ENABLE_PACKED_MXU
    old_sd = F.MXU_SPECTRUM_DTYPE
    F._use_mxu_fft = lambda n, rows=1: n >= 256
    F.ENABLE_PACKED_MXU = True
    F.MXU_SPECTRUM_DTYPE = None  # f32 storage: this test checks structure
    try:
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
    finally:
        F._use_mxu_fft = old
        F.ENABLE_PACKED_MXU = old_packed
        F.MXU_SPECTRUM_DTYPE = old_sd


def test_fft_natural_matmul_matches_numpy():
    from hyena_dna_tpu.ops.fftconv import fft_natural_matmul, ifft_natural_matmul

    rng = np.random.default_rng(17)
    for n in (128, 512, 4096):
        x = jnp.asarray(rng.normal(size=(3, n - 37)).astype(np.float32))
        out = fft_natural_matmul(x, n)
        ref = np.fft.fft(np.asarray(x), n=n)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=1e-3,
                                   err_msg=f"n={n}")
        back = ifft_natural_matmul(out, n)
        np.testing.assert_allclose(np.asarray(back.real[..., : n - 37]),
                                   np.asarray(x), atol=1e-3)

def test_fft_chain_matmul_conv_and_roundtrip():
    """The digit-permuted chain pair: exact roundtrip, layout-consistent
    bin-wise convolution, and DP chain structure."""
    import importlib

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(18)
    # DP sanity: factors multiply to n; small factors first
    for e in (12, 16, 17, 20):
        ch = F._nat_chain(1 << e)
        assert int(np.prod(ch)) == 1 << e, ch
        assert list(ch) == sorted(ch), ch
    for n, override in ((1024, None), (4096, None), (4096, (4, 32, 32)),
                        (8192, (4, 4, 8, 64)), (2048, (16, 128))):
        if override is not None:
            F.CHAIN_OVERRIDE[n] = override
        try:
            L = n // 2 - 13
            x = jnp.asarray(rng.normal(size=(3, L)).astype(np.float32))
            k = jnp.asarray((rng.normal(size=(3, L)) * 0.05).astype(np.float32))
            xf = F.fft_chain_matmul(x, n)
            back = F.ifft_chain_matmul(xf, n)
            np.testing.assert_allclose(np.asarray(back.real[..., :L]),
                                       np.asarray(x), atol=1e-3,
                                       err_msg=f"roundtrip n={n} {override}")
            # conv through the permuted layout == direct linear conv
            y = F.ifft_chain_matmul(xf * F.fft_chain_matmul(k, n), n).real[..., :L]
            ref = F.fftconv_ref(x[None], k, None)[0]
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"conv n={n} {override}")
            # permuted spectrum is a permutation of the natural one
            ref_f = np.fft.fft(np.asarray(x), n=n)
            np.testing.assert_allclose(
                np.sort(np.abs(np.asarray(xf)), axis=-1),
                np.sort(np.abs(ref_f), axis=-1), atol=2e-2, rtol=1e-3,
                err_msg=f"permutation n={n} {override}")
        finally:
            F.CHAIN_OVERRIDE.pop(n, None)

def test_fft_chain_ri_matches_complex():
    """Split real/imag chain pair == complex chain pair == numpy."""
    import importlib

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    rng = np.random.default_rng(19)
    old_sd = F.MXU_SPECTRUM_DTYPE
    F.MXU_SPECTRUM_DTYPE = None  # compare f32-stored ri against complex
    for n, override in ((2048, None), (4096, (4, 32, 32))):
        if override is not None:
            F.CHAIN_OVERRIDE[n] = override
        try:
            L = n // 2 - 7
            x = jnp.asarray(rng.normal(size=(2, L)).astype(np.float32))
            k = jnp.asarray((rng.normal(size=(2, L)) * 0.05).astype(np.float32))
            xr, xi = F.fft_chain_ri(x, n)
            ref = np.asarray(F.fft_chain_matmul(x, n))
            np.testing.assert_allclose(np.asarray(xr), ref.real, atol=1e-2)
            np.testing.assert_allclose(np.asarray(xi), ref.imag, atol=1e-2)
            kr, ki = F.fft_chain_ri(k, n)
            y = F.ifft_chain_real(xr * kr - xi * ki, xr * ki + xi * kr, n)[..., :L]
            refy = F.fftconv_ref(x[None], k, None)[0]
            np.testing.assert_allclose(np.asarray(y), np.asarray(refy),
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"n={n} {override}")
        finally:
            F.CHAIN_OVERRIDE.pop(n, None)
    F.MXU_SPECTRUM_DTYPE = old_sd

def test_pallas_fused_fftconv_fwd_bwd_parity():
    """The fully-fused Pallas conv kernel (interpret mode) matches the rfft
    conv in forward and all three gradients."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    PF = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")
    rng = np.random.default_rng(23)
    u = jnp.asarray(rng.normal(size=(2, 4, 2048)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(4, 2048)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
    old = (F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET)
    old_dot = (PF._DOT_DTYPE, PF._STORE_DTYPE)
    F._use_mxu_fft = lambda n, rows=1: n >= 4096
    F.MXU_SPECTRUM_DTYPE = None
    F.PALLAS_FFTCONV_INTERPRET = True
    PF._CB_BY_N[4096] = 2
    # structure check in full f32; bf16 covered separately below
    PF._DOT_DTYPE = PF._STORE_DTYPE = jnp.float32
    try:
        plan = F._pallas_conv_plan(u, k, 4096, False)
        assert plan == (64, 64, 2), plan
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g = jax.grad(lambda *a: jnp.sum(F.fftconv(*a, False) ** 2),
                     argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
        # bf16 dots+storage (the TPU configuration): bounded relative error
        PF._DOT_DTYPE = PF._STORE_DTYPE = jnp.bfloat16
        y16 = F.fftconv(u, k, D, False)
        scale = float(np.abs(np.asarray(ref_y)).max())
        err = float(np.abs(np.asarray(y16) - np.asarray(ref_y)).max()) / scale
        assert err < 3e-2, f"bf16 kernel error too large: {err}"
    finally:
        F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET = old
        PF._DOT_DTYPE, PF._STORE_DTYPE = old_dot
        PF._CB_BY_N.pop(4096, None)


def test_pallas_packed_vs_unpacked_paths():
    """The batch-packed fused kernels (two real rows per complex transform)
    match the unpacked kernels in forward and all gradients, on both the
    spectrum-saving and recompute backward paths; odd batch falls back."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    PF = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")
    rng = np.random.default_rng(31)
    u = jnp.asarray(rng.normal(size=(4, 4, 2048)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(4, 2048)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    import os

    old = (F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET,
           F.PALLAS_PACK_BATCH, os.environ.get("HYENA_PALLAS_SAVE_SPEC_MAX"))
    old_dot = (PF._DOT_DTYPE, PF._STORE_DTYPE)
    F._use_mxu_fft = lambda n, rows=1: n >= 4096
    F.MXU_SPECTRUM_DTYPE = None
    F.PALLAS_FFTCONV_INTERPRET = True
    PF._CB_BY_N[4096] = 2
    PF._DOT_DTYPE = PF._STORE_DTYPE = jnp.float32
    loss = lambda *a: jnp.sum(F.fftconv(*a, False) ** 2)
    try:
        F.PALLAS_PACK_BATCH = False
        ref_y = F.fftconv(u, k, D, False)
        ref_g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)

        F.PALLAS_PACK_BATCH = True
        for save_bytes in (1 << 29, 0):  # spec-saving and recompute bwds
            # the budget is env-overridable (device-derived otherwise);
            # "0" must read as an explicit zero, not fall through
            os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = str(save_bytes)
            assert F.pallas_save_spec_max_bytes() == save_bytes
            y = F.fftconv(u, k, D, False)
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                       atol=2e-3, rtol=1e-3)
            g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)
            for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-3,
                    err_msg=f"{name} save_bytes={save_bytes}")

        # odd batch: packing must disengage, results still correct
        y3 = F.fftconv(u[:3], k, D, False)
        np.testing.assert_allclose(np.asarray(y3), np.asarray(ref_y[:3]),
                                   atol=2e-3, rtol=1e-3)
        g3 = jax.grad(loss, argnums=(0,))(u[:3], k, D)[0]
        np.testing.assert_allclose(np.asarray(g3),
                                   np.asarray(jax.grad(loss)(u[:3], k, D)),
                                   atol=1e-5)
    finally:
        (F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET,
         F.PALLAS_PACK_BATCH, old_env) = old
        if old_env is None:
            os.environ.pop("HYENA_PALLAS_SAVE_SPEC_MAX", None)
        else:
            os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = old_env
        PF._DOT_DTYPE, PF._STORE_DTYPE = old_dot
        PF._CB_BY_N.pop(4096, None)


def test_fftconv_short_filter_grads():
    """Filter SHORTER than the signal (l > l_max routing in HyenaOperator:
    only the filter truncates): forward equals the zero-padded-filter conv
    and the custom VJP matches autodiff through the reference, with dk
    cropped to the filter's own length."""
    rng = np.random.default_rng(9)
    B, C, L, Lk = 2, 4, 96, 40
    u = jnp.asarray(rng.standard_normal((B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((C, Lk)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))

    y1 = fftconv(u, k, D, False)
    k_pad = jnp.pad(k, [(0, 0), (0, L - Lk)])
    y2 = fftconv_ref(u, k_pad, D)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)

    f1 = lambda u, k, D: jnp.sum(jnp.sin(fftconv(u, k, D, False)))
    f2 = lambda u, k, D: jnp.sum(
        jnp.sin(fftconv_ref(u, jnp.pad(k, [(0, 0), (0, L - Lk)]), D)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(u, k, D)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(u, k, D)
    g2 = (g2[0], g2[1][:, :Lk], g2[2])  # pad cotangent -> crop
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_device_derived_budgets():
    """Memory-guard budgets derive from the runtime device's HBM (tuned on
    the 16 GB v5e, scaled by the actual bytes_limit, clamped [1,8]); env
    overrides win; CPU keeps the conservative tuned values."""
    import importlib
    import os

    # the ops package re-exports the fftconv FUNCTION under the same name,
    # shadowing the submodule attribute — resolve the module explicitly
    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")

    assert F._hbm_scale() >= 1.0  # CPU in tests -> exactly the tuned base
    if jax.default_backend() == "cpu":
        assert F.mxu_fft_budget_bytes() == F._MXU_FFT_BUDGET_BASE
        assert F.pallas_save_spec_max_bytes() == F._PALLAS_SAVE_SPEC_BASE
    os.environ["HYENA_MXU_FFT_BUDGET"] = str(123 << 20)
    os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = str(45 << 20)
    try:
        assert F.mxu_fft_budget_bytes() == 123 << 20
        assert F.pallas_save_spec_max_bytes() == 45 << 20
    finally:
        del os.environ["HYENA_MXU_FFT_BUDGET"]
        del os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"]


def test_pallas_split_backward_parity():
    """The split backward (du kernel writing dy's spectrum + dk-from-specs
    kernel, the fft>=2^18 route) matches the rfft conv's gradients, in
    interpret mode at a monkeypatched small size."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    PF = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")
    rng = np.random.default_rng(41)
    u = jnp.asarray(rng.normal(size=(3, 4, 2048)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(4, 2048)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    loss = lambda *a: jnp.sum(F.fftconv(*a, False) ** 2)
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)

    import os

    old = (F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET,
           PF._SPLIT_BWD_MIN, os.environ.get("HYENA_PALLAS_SAVE_SPEC_MAX"))
    old_dot = (PF._DOT_DTYPE, PF._STORE_DTYPE)
    F._use_mxu_fft = lambda n, rows=1: n >= 4096
    F.MXU_SPECTRUM_DTYPE = None
    F.PALLAS_FFTCONV_INTERPRET = True
    PF._CB_BY_N[4096] = 2
    PF._SPLIT_BWD_MIN = 4096
    PF._DOT_DTYPE = PF._STORE_DTYPE = jnp.float32
    try:
        assert PF.needs_split_bwd(4096)
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)

        # without spectrum saving, split sizes must NOT take the fused path
        # (the split backward has no u-transform) — the chain handles them
        os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = "0"
        y2 = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g2 = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g2, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
    finally:
        (F._use_mxu_fft, F.MXU_SPECTRUM_DTYPE, F.PALLAS_FFTCONV_INTERPRET,
         PF._SPLIT_BWD_MIN, env) = old
        if env is None:
            os.environ.pop("HYENA_PALLAS_SAVE_SPEC_MAX", None)
        else:
            os.environ["HYENA_PALLAS_SAVE_SPEC_MAX"] = env
        PF._DOT_DTYPE, PF._STORE_DTYPE = old_dot
        PF._CB_BY_N.pop(4096, None)


def test_pallas_narrow_cb_kernels_parity():
    """The narrow-cb (4-D block) kernels — the fft>=2^19 route — match the
    rfft conv in forward and all gradients, interpret mode at a small size."""
    import importlib

    import jax

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    PF = importlib.import_module("hyena_dna_tpu.ops.pallas_fftconv")
    rng = np.random.default_rng(53)
    u = jnp.asarray(rng.normal(size=(3, 4, 4096)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(4, 4096)) * 0.05).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    loss = lambda *a: jnp.sum(F.fftconv(*a, False) ** 2)
    ref_y = F.fftconv(u, k, D, False)
    ref_g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)

    old = (F.PALLAS_FFTCONV_INTERPRET,)
    old_dot = (PF._DOT_DTYPE, PF._STORE_DTYPE)
    F.PALLAS_FFTCONV_INTERPRET = True
    PF._CB_BY_N_NARROW[8192] = 2
    PF._DOT_DTYPE = PF._STORE_DTYPE = jnp.float32
    try:
        plan = F._pallas_conv_plan(u, k, 8192, False)
        assert plan is not None and plan[2] == 2, plan
        r, m, cb = plan
        assert r * m == 8192 and r % 2 == 0
        y = F.fftconv(u, k, D, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=2e-3, rtol=1e-3)
        g = jax.grad(loss, argnums=(0, 1, 2))(u, k, D)
        for a, b, name in zip(g, ref_g, ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
        # cb=1 (the 2^20 configuration) and odd channel counts
        PF._CB_BY_N_NARROW[8192] = 1
        y1 = F.fftconv(u[:, :3], k[:3], D[:3], False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(ref_y[:, :3]),
                                   atol=2e-3, rtol=1e-3)
        g1 = jax.grad(loss, argnums=(0, 1, 2))(u[:, :3], k[:3], D[:3])
        for a, b, name in zip(g1, (ref_g[0][:, :3], ref_g[1][:3], ref_g[2][:3]),
                              ("du", "dk", "dD")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-3, err_msg=name)
    finally:
        (F.PALLAS_FFTCONV_INTERPRET,) = old
        PF._DOT_DTYPE, PF._STORE_DTYPE = old_dot
        PF._CB_BY_N_NARROW.pop(8192, None)
