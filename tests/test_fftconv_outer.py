"""Parity tests for the outer-radix fused conv (ops/pallas_fftconv_n3.py).

Small factor triples in interpret mode on CPU, f32 throughout (module
globals overridden) so the checks isolate structure from rounding; one
bf16 case pins the production dtype path. Mirrors the oracle style of
tests/test_fftconv.py: forward against the jnp rfft reference, backward
against jax.vjp of the reference; a routing test injects a small size
into the plan table and drives the public custom_vjp fftconv through the
outer path end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys

import hyena_dna_tpu.ops.fftconv  # noqa: F401 — ensure module registration
import hyena_dna_tpu.ops.pallas_fftconv_n3 as PO

# the ops package re-exports the fftconv FUNCTION under the same name, so a
# plain `import ... as F` would bind the custom_vjp object, not the module
F = sys.modules["hyena_dna_tpu.ops.fftconv"]


@pytest.fixture
def f32_kernel(monkeypatch):
    monkeypatch.setattr(PO, "_STORE_DTYPE", jnp.float32)
    monkeypatch.setattr(PO, "_DOT_DTYPE", jnp.float32)


def _data(B, C, L, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(B, C, L)).astype(np.float32)
    k = (rng.normal(size=(C, L)) * np.exp(-np.arange(L) / max(16, L // 8))
         ).astype(np.float32)
    D = rng.normal(size=(C,)).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(k), jnp.asarray(D)


def _ref(u, k, D, n):
    L = u.shape[-1]
    uf = jnp.fft.rfft(u.astype(jnp.float32), n=n, axis=-1)
    kf = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)
    y = jnp.fft.irfft(uf * kf[None], n=n, axis=-1)[..., :L]
    return y + u.astype(jnp.float32) * D[None, :, None]


@pytest.mark.parametrize("plan,B,C", [
    ((16, 32, 32), 2, 3),
    ((8, 32, 64), 1, 2),   # B=1: the long-context training case
    ((16, 16, 128), 2, 1),
    ((4, 64, 32), 3, 2),
])
def test_fwd_matches_reference(plan, B, C, f32_kernel):
    n1, r, m = plan
    n = n1 * r * m
    u, k, D = _data(B, C, n // 2)
    y = PO.fftconv_outer_fwd(u, k, D, n1, r, m, interpret=True)
    ref = _ref(u, k, D, n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("plan,B,C", [
    ((16, 32, 32), 3, 2),
    ((8, 32, 64), 1, 2),
])
def test_bwd_matches_reference_vjp(plan, B, C, f32_kernel):
    n1, r, m = plan
    n = n1 * r * m
    u, k, D = _data(B, C, n // 2, seed=1)
    dy = jnp.asarray(
        np.random.default_rng(2).normal(size=u.shape).astype(np.float32))
    du, dk, dD = PO.fftconv_outer_bwd(u, dy, k, D, n1, r, m, interpret=True)
    _, vjp = jax.vjp(lambda u, k, D: _ref(u, k, D, n), u, k, D)
    rdu, rdk, rdD = vjp(dy)
    scale = float(jnp.max(jnp.abs(rdk)))
    np.testing.assert_allclose(np.asarray(du), np.asarray(rdu),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk) / scale,
                               np.asarray(rdk) / scale,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dD), np.asarray(rdD),
                               rtol=2e-4, atol=1e-3)


def test_bf16_interior_error_bounded():
    """Production dtypes (bf16 interior): max-normalized error stays at the
    bf16 level over a full channel."""
    n1, r, m = 16, 32, 32
    n = n1 * r * m
    u, k, D = _data(2, 2, n // 2, seed=3)
    y = PO.fftconv_outer_fwd(u, k, D, n1, r, m, interpret=True)
    ref = _ref(u, k, D, n)
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_routed_custom_vjp_grads(monkeypatch, f32_kernel):
    """The public fftconv custom_vjp routes through the outer kernel when
    plan_outer covers the size, with matching grads."""
    n1, r, m = 16, 32, 32
    n = n1 * r * m
    monkeypatch.setitem(PO._OUTER_BY_N, n, (n1, r, m))
    monkeypatch.setattr(F, "PALLAS_FFTCONV_INTERPRET", True)
    # odd batch: below 2^19 the dispatch hands even batches to the packed
    # kernels (batch-pair transforms beat the per-row outer kernel there)
    u, k, D = _data(3, 2, n // 2, seed=4)

    # the plan must actually engage (otherwise this test silently passes
    # through the jnp path)
    assert F._pallas_outer_plan(u, k, n, False) == (n1, r, m)

    def loss_fused(u, k, D):
        return jnp.sum(F.fftconv(u, k, D, False) ** 2)

    def loss_ref(u, k, D):
        return jnp.sum(_ref(u, k, D, n) ** 2)

    gu, gk, gD = jax.grad(loss_fused, argnums=(0, 1, 2))(u, k, D)
    ru, rk, rD = jax.grad(loss_ref, argnums=(0, 1, 2))(u, k, D)
    for a, b in [(gu, ru), (gk, rk), (gD, rD)]:
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 2e-3, rel


def test_plan_outer_batch_gate():
    """Below 2^19 the outer plan engages only for odd (unpackable) batches;
    at 2^19+ it engages regardless of batch parity."""
    for n in (1 << 17, 1 << 18):
        spec = PO._OUTER_BY_N[n]
        n1, r, m = spec
        L = (n1 // 2) * r * m
        assert PO.plan_outer(n, 256, L, bsz=1) == spec
        assert PO.plan_outer(n, 256, L, bsz=3) == spec
        assert PO.plan_outer(n, 256, L, bsz=2) is None
        assert PO.plan_outer(n, 256, L, bsz=4) is None
    for n in (1 << 19, 1 << 20, 1 << 21):
        spec = PO._OUTER_BY_N[n]
        n1, r, m = spec
        L = (n1 // 2) * r * m
        assert PO.plan_outer(n, 256, L, bsz=2) == spec
        # seqlen past the causal-zero-pad capacity never plans
        assert PO.plan_outer(n, 256, L + 1, bsz=1) is None
