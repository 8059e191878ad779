"""Parity tests for the fused 3-pass Pallas conv (ops/pallas_fftconv3.py).

Small factor chains in interpret mode on CPU, f32 throughout (the module
globals are overridden) so the checks isolate structure from rounding.
Mirrors the oracle style of tests/test_fftconv.py: forward against
fftconv_ref, backward against jax.grad of the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hyena_dna_tpu.ops.pallas_fftconv3 as P3
from hyena_dna_tpu.ops.fftconv import fftconv_ref


@pytest.fixture(autouse=True)
def _f32_kernel(monkeypatch):
    monkeypatch.setattr(P3, "_STORE_DTYPE", jnp.float32)
    monkeypatch.setattr(P3, "_DOT_DTYPE", jnp.float32)
    monkeypatch.setattr(P3, "_TW1_DTYPE", jnp.float32)


def _data(B, C, L, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(B, C, L)).astype(np.float32)
    k = (rng.normal(size=(C, L)) * np.exp(-np.arange(L) / max(16, L // 8))
         ).astype(np.float32)
    D = rng.normal(size=(C,)).astype(np.float32)
    return u, k, D


@pytest.mark.parametrize("factors,cb,B", [
    ((8, 4, 4), 2, 3),
    ((8, 4, 4), 1, 2),
    ((16, 8, 4), 4, 1),   # B=1: the long-context training case
    ((4, 4, 8), 2, 2),    # f1 < f2, f3 > f2
])
def test_fwd_matches_reference(factors, cb, B):
    f1, f2, f3 = factors
    lp = (f1 // 2) * f2 * f3
    C = 4 if cb <= 2 else 8
    L = lp - 3
    u, k, D = _data(B, C, L)
    up = jnp.pad(jnp.asarray(u), [(0, 0), (0, 0), (0, lp - L)])
    kp = jnp.pad(jnp.asarray(k), [(0, 0), (0, lp - L)])
    y = P3.fftconv3_fwd(up, kp, jnp.asarray(D), f1, f2, f3, cb,
                        interpret=True)
    yref = fftconv_ref(jnp.asarray(u), jnp.asarray(k), jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(y[..., :L]), np.asarray(yref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("factors,cb,B", [
    ((8, 4, 4), 2, 3),
    ((16, 8, 4), 4, 1),
])
def test_bwd_matches_reference_grads(factors, cb, B):
    f1, f2, f3 = factors
    lp = (f1 // 2) * f2 * f3
    C = 4 if cb <= 2 else 8
    L = lp - 3
    u, k, D = _data(B, C, L, seed=1)
    dy = np.random.default_rng(2).normal(size=(B, C, L)).astype(np.float32)
    up = jnp.pad(jnp.asarray(u), [(0, 0), (0, 0), (0, lp - L)])
    kp = jnp.pad(jnp.asarray(k), [(0, 0), (0, lp - L)])
    dyp = jnp.pad(jnp.asarray(dy), [(0, 0), (0, 0), (0, lp - L)])
    du, dk, dD = P3.fftconv3_bwd(up, dyp, kp, jnp.asarray(D),
                                 f1, f2, f3, cb, interpret=True)

    def loss(u_, k_, D_):
        return jnp.sum(fftconv_ref(u_, k_, D_) * jnp.asarray(dy))

    gu, gk, gD = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(u), jnp.asarray(k), jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(du[..., :L]), np.asarray(gu),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk[..., :L]), np.asarray(gk),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dD), np.asarray(gD),
                               rtol=1e-4, atol=1e-4)


def test_plan3_gating():
    # supported sizes with matching channel divisibility
    assert P3.plan3(1 << 20, 256, 450048) == ((128, 64, 128), 1)
    assert P3.plan3(1 << 19, 256, 200000) == ((64, 64, 128), 2)
    assert P3.plan3(1 << 21, 256, 1000448) == ((128, 128, 128), 1)
    # out-of-table size and too-long seqlen
    assert P3.plan3(1 << 18, 256, 100000) is None
    assert P3.plan3(1 << 20, 256, (1 << 19) + 1) is None


def test_custom_vjp_dispatch_interpret(monkeypatch):
    """End-to-end through fftconv's custom VJP with the 3-pass plan forced
    (interpret mode): grads of a scalar loss match the reference path."""
    import importlib

    F = importlib.import_module("hyena_dna_tpu.ops.fftconv")
    monkeypatch.setattr(F, "PALLAS_FFTCONV_INTERPRET", True)
    # the kernel is gated off by default (measured slower than the XLA
    # chain on v5e — see the module docstring); force it on here so the
    # dispatch wiring stays exercised
    monkeypatch.setattr(F, "PALLAS3_FFTCONV", True)
    # shrink the plan table so a test-size conv routes through plan3
    monkeypatch.setattr(P3, "_PLAN3_BY_N", {256: ((8, 4, 8), 2)})
    called = {}
    orig = F._pallas3_apply

    def spy(*a, **kw):
        called["fwd"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(F, "_pallas3_apply", spy)
    B, C, L = 2, 4, 120  # fft size 256
    u, k, D = _data(B, C, L, seed=3)

    def loss_fused(u_, k_, D_):
        return jnp.sum(F.fftconv(u_, k_, D_, False) ** 2)

    def loss_ref(u_, k_, D_):
        return jnp.sum(fftconv_ref(u_, k_, D_) ** 2)

    args = (jnp.asarray(u), jnp.asarray(k), jnp.asarray(D))
    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(*args)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-4)
    assert called.get("fwd"), "conv did not route through the 3-pass plan"
