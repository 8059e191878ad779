"""Parity for the 4-D conv-layout route: the fused front end emitting the
outer-radix kernel's (B, d, rows, m) tiling (ops/pallas_hyena.py
fused_proj_conv_gate4), the 4-D conv wrapper (ops/fftconv.py
fftconv_outer_4d), and the end-to-end HyenaOperator route
(models/hyena.py _try_front4) against the flat-path oracle.

All interpret mode on CPU; a small factor triple is injected into the
outer plan table so the route engages at test sizes (mirrors
tests/test_fftconv_outer.py). The route changes PHYSICAL LAYOUT only —
outputs must match the flat path to rounding.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hyena_dna_tpu.ops.fftconv  # noqa: F401
import hyena_dna_tpu.ops.pallas_fftconv_n3 as PO
from hyena_dna_tpu.ops.pallas_hyena import (
    _reference_fwd,
    fused_proj_conv_gate4,
)

F = sys.modules["hyena_dna_tpu.ops.fftconv"]

# plan: n1=4, r=8, m=128 -> fft 4096, rows_pad=16, lp=2048
PLAN = (4, 8, 128)
N = 4 * 8 * 128
L = 1536  # < lp, divisible by 512; tests the padded tail
D = 8
TILE = 512


def _front_inputs(seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(1, L, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(3, 3 * D)).astype(np.float32))
    bc = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1)
    return u, w, bp, wc, bc


def test_front4_forward_matches_flat_plus_pad():
    u, w, bp, wc, bc = _front_inputs()
    rows_pad, m = 16, 128
    lp = rows_pad * m
    vx4, x04 = fused_proj_conv_gate4(u, w, bp, wc, bc, rows_pad, m, TILE, True)
    assert vx4.shape == (1, D, rows_pad, m)
    vx_ref, x0_ref = _reference_fwd(u, w, bp, wc, bc)  # (1, D, L)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, lp - L))).reshape(
        1, D, rows_pad, m)
    np.testing.assert_allclose(np.asarray(vx4), np.asarray(pad(vx_ref)),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x04), np.asarray(pad(x0_ref)),
                               atol=1e-4, rtol=1e-4)


def test_front4_vjp_matches_autodiff():
    u, w, bp, wc, bc = _front_inputs(seed=2)
    rows_pad, m = 16, 128
    lp = rows_pad * m

    def loss4(u, w, bp, wc, bc):
        vx4, x04 = fused_proj_conv_gate4(u, w, bp, wc, bc, rows_pad, m,
                                         TILE, True)
        return jnp.sum(vx4**2) + jnp.sum(jnp.sin(x04))

    def loss_ref(u, w, bp, wc, bc):
        vx, x0 = _reference_fwd(u, w, bp, wc, bc)
        pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, lp - L)))
        return jnp.sum(pad(vx)**2) + jnp.sum(jnp.sin(pad(x0)))

    g4 = jax.grad(loss4, argnums=(0, 1, 2, 3, 4))(u, w, bp, wc, bc)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, w, bp, wc, bc)
    for a, b, name in zip(g4, gr, ["du", "dw", "dbp", "dwc", "dbc"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=name)


@pytest.fixture
def outer_plan(monkeypatch):
    monkeypatch.setattr(PO, "_STORE_DTYPE", jnp.float32)
    monkeypatch.setattr(PO, "_DOT_DTYPE", jnp.float32)
    monkeypatch.setitem(PO._OUTER_BY_N, N, PLAN)
    monkeypatch.setattr(F, "PALLAS_FFTCONV_INTERPRET", True)


def test_fftconv_outer_4d_matches_flat(outer_plan):
    n1, r, m = PLAN
    h1 = n1 // 2
    lp = h1 * r * m
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(1, 4, lp)).astype(np.float32))
    # decaying filter (as in test_fftconv_outer._data): a full-length random
    # filter makes the f32 conv itself ill-conditioned — the oracle's own
    # rounding would dominate the comparison
    k = jnp.asarray((rng.normal(size=(4, lp))
                     * np.exp(-np.arange(lp) / max(16, lp // 8))
                     ).astype(np.float32))
    Dv = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    u4 = u.reshape(1, 4, h1 * r, m)
    k4 = k.reshape(4, h1 * r, m)

    def f4(u4, k4, Dv):
        return jnp.sum(F.fftconv_outer_4d(u4, k4, Dv, n1, r, m) ** 2)

    def fflat(u, k, Dv):
        # jnp rfft oracle of the same conv (the flat kernel has no
        # differentiation rule of its own — its vjp lives in the dispatch)
        n = n1 * r * m
        uf = jnp.fft.rfft(u, n=n, axis=-1)
        kf = jnp.fft.rfft(k, n=n, axis=-1)
        y = jnp.fft.irfft(uf * kf[None], n=n, axis=-1)[..., :lp]
        y = y + u * Dv[None, :, None]
        return jnp.sum(y**2)

    v4, g4 = jax.value_and_grad(f4, argnums=(0, 1, 2))(u4, k4, Dv)
    vf, gf = jax.value_and_grad(fflat, argnums=(0, 1, 2))(u, k, Dv)
    np.testing.assert_allclose(float(v4), float(vf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g4[0]),
                               np.asarray(gf[0]).reshape(g4[0].shape),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g4[1]),
                               np.asarray(gf[1]).reshape(g4[1].shape),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g4[2]), np.asarray(gf[2]),
                               atol=1e-3, rtol=1e-3)


def test_hyena_operator_front4_route_parity(outer_plan, monkeypatch):
    """End-to-end: the 4-D route vs the flat route on the same params —
    forward and parameter grads."""
    from hyena_dna_tpu.models import HyenaOperator

    monkeypatch.setenv("HYENA_FRONT4", "1")
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (1, L, D), jnp.float32)
    kw = dict(d_model=D, l_max=L, filter_order=16, filter_cfg=dict(emb_dim=5))

    op = HyenaOperator(**kw, use_pallas_front=True, pallas_interpret=True)
    params = op.init(rng, u)["params"]
    y4 = op.apply({"params": params}, u)

    # flat oracle: same params, 4-D route disabled
    monkeypatch.setenv("HYENA_FRONT4", "0")
    y_flat = op.apply({"params": params}, u)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y_flat), atol=2e-4,
                               rtol=1e-3)

    def loss(p, front4):
        monkeypatch.setenv("HYENA_FRONT4", front4)
        return jnp.sum(op.apply({"params": p}, u) ** 2)

    g4 = jax.grad(lambda p: loss(p, "1"))(params)
    gf = jax.grad(lambda p: loss(p, "0"))(params)
    flat_f = {tuple(str(k) for k in path): v
              for path, v in jax.tree_util.tree_leaves_with_path(gf)}
    for path, v in jax.tree_util.tree_leaves_with_path(g4):
        key = tuple(str(k) for k in path)
        np.testing.assert_allclose(np.asarray(flat_f[key]), np.asarray(v),
                                   atol=5e-3, rtol=5e-3, err_msg=str(key))


def test_front4_route_requires_plan(monkeypatch):
    """Without an outer plan for the fft size the route must decline (the
    flat path handles it) — guards against mis-routing at 32k."""
    from hyena_dna_tpu.models import HyenaOperator

    monkeypatch.setenv("HYENA_FRONT4", "1")
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (1, 512, D), jnp.float32)
    op = HyenaOperator(d_model=D, l_max=512, filter_order=16,
                       filter_cfg=dict(emb_dim=5), use_pallas_front=True,
                       pallas_interpret=True)
    params = op.init(rng, u)["params"]
    bound = op.bind({"params": params})
    assert bound._try_front4(u, 512, 512, True) is None
