"""Long FFT convolution for Hyena on TPU.

Semantics match the reference implementation (`/root/reference/src/models/sequence/hyena.py:59-88`
`fftconv_ref` and `/root/reference/src/ops/fftconv.py:15-55`): causal (or
bidirectional) linear convolution of a length-L signal with a length-L implicit
filter, computed via a zero-padded length-2L real FFT, plus a per-channel skip
term ``u * D`` and optional GeLU.

TPU-first design notes:
  * XLA lowers `jnp.fft.rfft/irfft` to tuned TPU FFT HLOs; the elementwise
    epilogue (skip, gating, GeLU) is fused by XLA into the surrounding
    computation, so the jnp path is already "fused" in the sense the reference
    needed a CUDA kernel for.
  * FFTs always run in float32 regardless of activation dtype (bf16 FFT loses
    too much precision at long L); results are cast back.
  * A `jax.custom_vjp` implements the frequency-domain backward pass (mirrors
    `/root/reference/src/models/sequence/hyena.py:43-56`), recomputing the two
    forward FFTs instead of storing the (…, L+1) complex64 spectra — the right
    trade on HBM-bandwidth-bound TPUs at long L.

Filter broadcasting convention (as in the reference, `hyena.py:77-78`): for
inputs of rank > 3 the (C, L) filter gains ONE new axis at position 1, i.e.
(C, 1, L), so it broadcasts over trailing block dims and leading batch/head
dims of a (B, H, C, Z, L) input.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def next_fast_fft_size(n: int) -> int:
    """Round up to a power of two (>=16, like the reference's CUDA pad rule,
    `/root/reference/src/ops/fftconv.py:64-66`).

    Essential on TPU: XLA lowers non-power-of-2 FFTs to a dense DFT matmul —
    an O(N^2) matrix that at N=65540 would be a 17 GB buffer. Zero-padding
    beyond 2L-1 leaves the linear convolution unchanged."""
    return max(16, 1 << (n - 1).bit_length())


# On TPU, the MXU matmul-FFT (see fftconv_mxu below) beats the native VPU
# FFT (~1.7x measured at n=2^16..2^18 on v5e) but carries full-complex
# spectra (2x the rfft memory): gate by transform size AND by the working
# set (rows x n complex64 across ~4 live buffers) so the channel-chunked
# long-context path can still use the MXU with small chunks.
MATMUL_FFT_MIN = 1 << 16
# Memory-guard budgets below were tuned on the 16 GB v5e; they scale with
# the runtime device's HBM (see _hbm_scale) so a v5p (95 GB) isn't silently
# capped at v5e limits. Env overrides win. The CHUNK budget is different:
# it is a measured *scheduling* optimum, not a memory guard (bigger chunks
# ran slower on v5e) — it stays fixed unless overridden.
_TUNED_HBM_BYTES = 16 << 30
_MXU_FFT_BUDGET_BASE = 3 << 30  # ~3 GB working set on the 16 GB v5e


def _hbm_scale() -> float:
    """This device's HBM relative to the 16 GB v5e the memory-guard budgets
    were tuned on, clamped to [1, 8]. CPU/unknown devices -> 1 (the tuned
    guards are conservative everywhere)."""
    global _HBM_SCALE_CACHE
    if _HBM_SCALE_CACHE is None:
        scale = 1.0
        try:
            if jax.default_backend() == "tpu":
                stats = jax.devices()[0].memory_stats() or {}
                limit = stats.get("bytes_limit") or stats.get(
                    "bytes_reservable_limit") or 0
                if limit:
                    scale = min(8.0, max(1.0, limit / _TUNED_HBM_BYTES))
        except Exception:
            pass
        _HBM_SCALE_CACHE = scale
    return _HBM_SCALE_CACHE


_HBM_SCALE_CACHE: Optional[float] = None


def mxu_fft_budget_bytes() -> int:
    env = os.environ.get("HYENA_MXU_FFT_BUDGET")
    if env:
        return int(env)
    return int(_MXU_FFT_BUDGET_BASE * _hbm_scale())


def _use_mxu_fft(n: int, rows: int = 1) -> bool:
    try:
        return (
            n >= MATMUL_FFT_MIN
            and n & (n - 1) == 0  # matmul-FFT chains assume pow2 sizes
            and 4 * rows * n * 8 <= mxu_fft_budget_bytes()
            and jax.default_backend() == "tpu"
        )
    except Exception:
        return False


def _rows(shape) -> int:
    import numpy as _np

    return int(_np.prod(shape[:-1])) if len(shape) > 1 else 1


def _rfft(x: jax.Array, n: int) -> jax.Array:
    """rfft over the last axis, computed on a 2D view.

    XLA's CPU FFT thunk requires dim0-major layouts; under GSPMD sharding of a
    middle dim the cotangent buffers can violate that. Flattening the leading
    dims to one axis pins a canonical layout on every backend and is free on
    TPU (bitcast reshape)."""
    shape = x.shape
    y = jnp.fft.rfft(x.reshape(-1, shape[-1]), n=n)
    return y.reshape(*shape[:-1], n // 2 + 1)


def _irfft(x: jax.Array, n: int) -> jax.Array:
    """irfft over the last axis on a 2D view (see _rfft)."""
    shape = x.shape
    y = jnp.fft.irfft(x.reshape(-1, shape[-1]), n=n)
    return y.reshape(*shape[:-1], n)


def _expand_k(k_f: jax.Array, u_ndim: int) -> jax.Array:
    """Apply the reference's `k_f.unsqueeze(1)` rule for rank>3 inputs."""
    if u_ndim > 3 and k_f.ndim >= 2:
        return jnp.expand_dims(k_f, 1)
    return k_f


def _reduce_to_shape(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Sum-reduce x (a broadcasted gradient) back down to `shape`."""
    if x.shape == tuple(shape):
        return x
    nd = x.ndim
    offset = nd - len(shape)
    axes = []
    for ax in range(nd):
        rel = ax - offset
        if rel < 0 or (shape[rel] == 1 and x.shape[ax] != 1):
            axes.append(ax)
    x = jnp.sum(x, axis=tuple(axes), keepdims=False)
    return x.reshape(shape)


def fftconv_ref(
    u: jax.Array,
    k: jax.Array,
    D: Optional[jax.Array] = None,
    *,
    gelu: bool = False,
    k_rev: Optional[jax.Array] = None,
    bidirectional: bool = False,
    fft_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Reference (pure jnp) FFT convolution.

    Args:
      u: input signal, shape (..., C, L) — length along the last axis.
      k: filter, shape (C, L); broadcasts per the module convention above.
      D: optional per-channel skip weight; an L axis is appended internally,
         then numpy broadcasting applies (the reference passes shapes (C,) or
         (1, C, 1)).
      gelu: apply exact GeLU to the output.
      k_rev: optional reversed-time filter added as conj in frequency domain.
      bidirectional: center-pad the input (non-causal conv).

    Returns:
      Array with the shape/dtype of u.
    """
    seqlen = u.shape[-1]
    # Bidirectional parity note: the reference computes the two-sided conv on
    # an exactly-2L circular transform (`hyena.py:67-73`), so its result
    # depends on the 2L wraparound — padding further would change it. The
    # causal path has no wraparound and takes the fast power-of-2 size.
    fft_size = 2 * seqlen if bidirectional else next_fast_fft_size(2 * seqlen)

    # torch: k_f = rfft(k)/N then irfft(..., norm="forward") (no 1/N on the
    # inverse). Net effect == jax default normalization with no extra scaling:
    # a plain circular convolution on the zero-padded signal.
    k_f = _rfft(k.astype(fft_dtype), n=fft_size)
    if k_rev is not None:
        k_f = k_f + _rfft(k_rev.astype(fft_dtype), n=fft_size).conj()

    if bidirectional:
        # Pad L//2 zeros before the signal so the filter applies centered
        # (reference `hyena.py:67-73`).
        pad_before = seqlen // 2
        pad_widths = [(0, 0)] * (u.ndim - 1) + [(pad_before, 0)]
        u_in = jnp.pad(u.astype(fft_dtype), pad_widths)
    else:
        u_in = u.astype(fft_dtype)

    if not bidirectional and k_rev is None and _use_mxu_fft(fft_size, _rows(u.shape)):
        # MXU path: chained DFT-matmul transforms (digit-permuted order,
        # split real/imag so real-input and real-output passes drop matmuls)
        ur, ui = fft_chain_ri(u_in, fft_size)
        kr, ki = fft_chain_ri(k.astype(fft_dtype), fft_size)
        krb, kib = _expand_k(kr, u.ndim), _expand_k(ki, u.ndim)
        y = ifft_chain_real(ur * krb - ui * kib, ur * kib + ui * krb,
                            fft_size)[..., :seqlen]
    elif (
        fft_size >= TWO_STEP_FFT_MIN
        and not bidirectional
        and k_rev is None
    ):
        # beyond the monolithic TPU FFT: blocked two-step transform
        y = fftconv_long(u_in, k, None, fft_size)[..., :seqlen]
    else:
        u_f = _rfft(u_in, n=fft_size)
        y = _irfft(u_f * _expand_k(k_f, u.ndim), n=fft_size)[..., :seqlen]

    if D is not None:
        y = y + u.astype(fft_dtype) * jnp.asarray(D, fft_dtype)[..., None]
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(u.dtype)


# ---------------------------------------------------------------------------
# custom-vjp variant: frequency-domain backward with FFT recompute.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fftconv(u: jax.Array, k: jax.Array, D: jax.Array, gelu: bool = False,
            save_spectra: bool = True) -> jax.Array:
    """Causal FFT long conv with skip: y = gelu?(conv(u, k) + u*D).

    u: (..., C, L); k: (C, L); D broadcastable against u once an L axis is
    appended (e.g. (C,) or (1, C, 1)).
    """
    # primal == the VJP forward's routed computation (Pallas fused kernel /
    # MXU chain / two-step), so inference gets the fast path too
    return _fftconv_fwd(u, k, D, gelu, save_spectra)[0]


# Save forward spectra for the backward pass when below this size, sparing
# the backward its u/k forward-transform recompute. Measured no win twice:
# with complex64 spectra (227k tok/s era) and again with bf16 ri pairs
# (386.4k saved vs 388.9k recomputed at the 32k bench shape) — XLA
# overlaps the recompute well, so the residual traffic only adds memory
# pressure. Left disabled; when enabled, saving is suppressed inside the
# channel-chunk scan (`fftconv_chunked`), where per-chunk residuals would
# STACK across scan iterations (41 GB at 450k when first tried) — the
# chunk-scan body passes save_spectra=False explicitly.
SAVE_SPECTRA_MAX_BYTES = 0
def _spectrum_nbytes(shape, fft_size):
    import numpy as _np

    per = 8 if MXU_SPECTRUM_DTYPE is None else 4  # (re, im) pair bytes/bin
    return int(_np.prod(shape[:-1])) * fft_size * per


# Channel-pair packing halves matmul-FFT rows but pays two conjugate-bin
# GATHERS per unpack; measured net-negative on v5e (194k vs 227k tok/s at
# the bench shape) — disabled by default, kept as an experiment (a future
# Pallas unpack kernel could recover the win).
ENABLE_PACKED_MXU = False


def _packed_eligible(u, k, fft_size):
    return (
        ENABLE_PACKED_MXU
        and _use_mxu_fft(fft_size, _rows(u.shape))
        and u.ndim == 3
        and k.ndim == 2
        and u.shape[-2] == k.shape[-2]
        and u.shape[-2] % 2 == 0
    )


# Fully-fused Pallas conv kernel (ops/pallas_fftconv.py): the whole
# transform->multiply->inverse pipeline in VMEM, one HBM round trip.
# Engaged on TPU for 3D/no-gelu convs whose size has a 2-factor chain.
PALLAS_FFTCONV = True
# Max bytes of saved u-spectrum per conv call (bf16 ri pair): above this the
# backward recomputes u's transform instead (long-context paths are chunked
# and pass save_spectra=False anyway). Memory guard -> scales with HBM.
_PALLAS_SAVE_SPEC_BASE = 1 << 29


def pallas_save_spec_max_bytes() -> int:
    env = os.environ.get("HYENA_PALLAS_SAVE_SPEC_MAX")
    if env:
        return int(env)
    return int(_PALLAS_SAVE_SPEC_BASE * _hbm_scale())
PALLAS_FFTCONV_INTERPRET = False  # tests: run the kernel in interpret mode
# Batch-pair packing: two real batch rows per complex transform (linearity;
# no conjugate-symmetry unpack needed — see ops/pallas_fftconv.py). Engaged
# whenever the batch dim is even; ~1.8x fewer MXU FLOPs + 2x less VPU work
# in the fused conv.
PALLAS_PACK_BATCH = True


def _pallas_batch_packed(u):
    return PALLAS_PACK_BATCH and u.ndim == 3 and u.shape[0] % 2 == 0


def _pallas_conv_plan(u, k, fft_size, gelu):
    if not PALLAS_FFTCONV or gelu or u.ndim != 3 or k.ndim != 2:
        return None
    if k.shape[0] != u.shape[1]:
        return None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return None
    if not (on_tpu or PALLAS_FFTCONV_INTERPRET):
        return None
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    return _pf.plan(fft_size, u.shape[1], u.shape[-1], _nat_chain(fft_size))


# Outer-radix fused kernel (ops/pallas_fftconv_n3.py) for fft 2^20/2^21 —
# the 450k/1M headline regime. n = n1*(r*m): a small outer radix applied as
# compile-time scaled adds + n1 independent 2-factor sub-FFTs in the proven
# pure-2-D form; no transposes/relayouts anywhere. One HBM round trip per
# conv vs the chain's ~6. Gated by plan_outer's size table.
PALLAS_OUTER_FFTCONV = True


def _pallas_outer_plan(u, k, fft_size, gelu):
    if not (PALLAS_FFTCONV and PALLAS_OUTER_FFTCONV) or gelu:
        return None
    if u.ndim != 3 or k.ndim != 2 or k.shape[0] != u.shape[1]:
        return None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return None
    if not (on_tpu or PALLAS_FFTCONV_INTERPRET):
        return None
    from hyena_dna_tpu.ops import pallas_fftconv_n3 as _pfo

    return _pfo.plan_outer(fft_size, u.shape[1], u.shape[-1], u.shape[0])


def _outer_pad(u, k, lp):
    seqlen = u.shape[-1]
    u_in = (jnp.pad(u, [(0, 0), (0, 0), (0, lp - seqlen)])
            if seqlen < lp else u)
    k_in = (jnp.pad(k, [(0, 0), (0, lp - k.shape[-1])])
            if k.shape[-1] < lp else k)
    return u_in, k_in


def _pallas_outer_apply(u, k, D, plan, pre_padded=False):
    """pre_padded: u already lp-long (the fwd rule pads once and stores the
    PADDED u as the residual, so the backward never re-pads it)."""
    from hyena_dna_tpu.ops import pallas_fftconv_n3 as _pfo

    n1, r, m = plan
    seqlen = u.shape[-1]
    u_in, k_in = _outer_pad(u, k, (n1 // 2) * r * m)
    d_arr = (jnp.zeros((u.shape[1],), jnp.float32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                   (u.shape[1],)))
    y = _pfo.fftconv_outer_fwd(u_in, k_in, d_arr, n1, r, m,
                               interpret=PALLAS_FFTCONV_INTERPRET)
    if pre_padded:
        return y, u_in
    return y[..., :seqlen]


def _fftconv_bwd_pallas_outer(res, dy, plan):
    from hyena_dna_tpu.ops import pallas_fftconv_n3 as _pfo

    u, k, D, _, _ = res
    n1, r, m = plan
    # u may arrive PADDED (the outer fwd stores the padded u as residual);
    # the primal length is dy's
    seqlen = dy.shape[-1]
    lp = (n1 // 2) * r * m
    u_in, k_in = _outer_pad(u, k, lp)
    dy_in = (jnp.pad(dy, [(0, 0), (0, 0), (0, lp - seqlen)])
             if seqlen < lp else dy)
    d_arr = (jnp.zeros((u.shape[1],), jnp.float32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                   (u.shape[1],)))
    du, dk_t, dd_c = _pfo.fftconv_outer_bwd(
        u_in, dy_in, k_in, d_arr, n1, r, m,
        interpret=PALLAS_FFTCONV_INTERPRET)
    du = du[..., :seqlen]
    dk = dk_t[..., :k.shape[-1]].reshape(k.shape)
    if D is None:
        return du.astype(u.dtype), dk.astype(k.dtype), None
    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dd_c.reshape(1, k.shape[0], 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


# 3-pass fused kernel (ops/pallas_fftconv3.py) for fft sizes >= 2^19: the
# long-context range where the 2-pass kernel's factor matrices would blow
# past the MXU sweet spot and the XLA chain pays ~6 HBM round trips per
# transform. MEASURED AND REJECTED on v5e (2026-08-18): at its target size
# n=2^19 (C=16, B=1) the fused kernel runs 3.09 ms/conv-fwd vs the XLA
# chain's 2.81 ms — Mosaic's lowering of the middle-pass relayouts eats
# the saved HBM round trips — and its compile is pathological (24 min at
# 2^19; the AOT compile helper is OOM-killed at 2^20/2^21). Kept as a
# gated experiment with interpret-mode parity tests (tests/test_fftconv3.py);
# the long-context convs stay on the XLA chain-FFT path.
PALLAS3_FFTCONV = False


def _pallas3_plan(u, k, fft_size, gelu):
    if not (PALLAS_FFTCONV and PALLAS3_FFTCONV) or gelu:
        return None
    if u.ndim != 3 or k.ndim != 2 or k.shape[0] != u.shape[1]:
        return None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return None
    if not (on_tpu or PALLAS_FFTCONV_INTERPRET):
        return None
    from hyena_dna_tpu.ops import pallas_fftconv3 as _pf3

    return _pf3.plan3(fft_size, u.shape[1], u.shape[-1])


def _pallas3_apply(u, k, D, fft_size, plan):
    from hyena_dna_tpu.ops import pallas_fftconv3 as _pf3

    (f1, f2, f3), cb = plan
    seqlen = u.shape[-1]
    lp = (f1 // 2) * f2 * f3
    u_in = (jnp.pad(u, [(0, 0), (0, 0), (0, lp - seqlen)])
            if seqlen < lp else u)
    k_in = (jnp.pad(k, [(0, 0), (0, lp - k.shape[-1])])
            if k.shape[-1] < lp else k)
    d_arr = (jnp.zeros((u.shape[1],), jnp.float32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                   (u.shape[1],)))
    y = _pf3.fftconv3_fwd(u_in, k_in, d_arr, f1, f2, f3, cb,
                          interpret=PALLAS_FFTCONV_INTERPRET)
    return y[..., :seqlen]


def _fftconv_bwd_pallas3(res, dy, fft_size, plan):
    """Backward through the fused 3-pass kernel: du and dk (inverse
    included) come out of the kernel; dD is a caller-side XLA einsum
    (see `pallas_fftconv3.fftconv3_bwd`). Requires D (models always pass
    one; the fused path is never planned for D=None)."""
    from hyena_dna_tpu.ops import pallas_fftconv3 as _pf3

    u, k, D, _, _ = res
    (f1, f2, f3), cb = plan
    seqlen = u.shape[-1]
    lp = (f1 // 2) * f2 * f3
    pad = [(0, 0), (0, 0), (0, lp - seqlen)] if seqlen < lp else None
    u_in = jnp.pad(u, pad) if pad else u
    dy_in = jnp.pad(dy, pad) if pad else dy
    k_in = (jnp.pad(k, [(0, 0), (0, lp - k.shape[-1])])
            if k.shape[-1] < lp else k)
    assert D is not None, "pallas3 backward needs D (models always pass one)"
    d_arr = jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                             (u.shape[1],))
    du, dk_t, dD_c = _pf3.fftconv3_bwd(
        u_in, dy_in, k_in, d_arr, f1, f2, f3, cb,
        interpret=PALLAS_FFTCONV_INTERPRET)
    du = du[..., :seqlen]
    dk = dk_t[..., :k.shape[-1]].reshape(k.shape)
    c = k.shape[0]
    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dD_c.reshape(1, c, 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


def _pallas_conv_apply(u, k, D, fft_size, plan_rmc, conj_filter=False,
                       save_spectrum=False, packed=False, narrow=False):
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    r, m, cb = plan_rmc
    seqlen = u.shape[-1]
    lp = (r // 2) * m
    u_in = u
    k_in = k
    if seqlen < lp:
        u_in = jnp.pad(u, [(0, 0), (0, 0), (0, lp - seqlen)])
    if k.shape[-1] < lp:
        k_in = jnp.pad(k, [(0, 0), (0, lp - k.shape[-1])])
    if D is None:
        d_arr = jnp.zeros((u.shape[1],), jnp.float32)
    else:
        d_arr = jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                 (u.shape[1],))
    # kernel rounds dot inputs to bf16 internally; pass u's native dtype so
    # bf16 callers don't pay an f32 round trip on the step's largest tensor
    if narrow:
        y = _pf.fftconv_fused_fwd_narrow(u_in, k_in, d_arr, r, m, cb,
                                         interpret=PALLAS_FFTCONV_INTERPRET)
        return y[..., :seqlen]
    fwd = _pf.fftconv_fused_fwd_packed if packed else _pf.fftconv_fused_fwd
    out = fwd(u_in, k_in, d_arr, r, m, cb, conj_filter=conj_filter,
              interpret=PALLAS_FFTCONV_INTERPRET,
              save_spectrum=save_spectrum)
    if save_spectrum:
        y, ur_s, ui_s = out
        return y[..., :seqlen], ur_s, ui_s
    return out[..., :seqlen]


def _fftconv_fwd(u, k, D, gelu, save_spectra=True):
    seqlen = u.shape[-1]
    fft_size = next_fast_fft_size(2 * seqlen)
    save = save_spectra and (
        _spectrum_nbytes(u.shape, fft_size) + _spectrum_nbytes(k.shape, fft_size)
        <= SAVE_SPECTRA_MAX_BYTES
    )
    f32 = jnp.float32
    if _packed_eligible(u, k, fft_size):
        y = fftconv_mxu_packed(u, k, D, gelu)
        return y, (u, k, D, None, None)
    if not gelu:
        p3 = _pallas3_plan(u, k, fft_size, gelu)
        if p3 is not None:
            y = _pallas3_apply(u, k, D, fft_size, p3).astype(u.dtype)
            return y, (u, k, D, None, None)
    if not gelu:
        pouter = _pallas_outer_plan(u, k, fft_size, gelu)
        if pouter is not None:
            y, u_in = _pallas_outer_apply(u, k, D, pouter, pre_padded=True)
            # store the PADDED u: the backward's _outer_pad then no-ops on
            # it (one fewer full-length pad pass per conv backward); du is
            # sliced with dy's length instead
            return (y[..., :seqlen].astype(u.dtype),
                    (u_in, k, D, None, None))
    if not gelu:
        # narrow fused plans (fft >= 2^19) stream channel blocks through
        # VMEM and never build the XLA chain's HBM workspace, so they are
        # NOT gated on the mxu-fft row budget
        pnarrow = _pallas_conv_plan(u, k, fft_size, gelu)
        if pnarrow is not None and pnarrow[2] < 8:
            y = _pallas_conv_apply(u, k, D, fft_size, pnarrow,
                                   narrow=True).astype(u.dtype)
            return y, (u, k, D, None, None)
    if _use_mxu_fft(fft_size, _rows(u.shape)):
        pplan = _pallas_conv_plan(u, k, fft_size, gelu)
        if pplan is not None:
            from hyena_dna_tpu.ops import pallas_fftconv as _pf

            split = _pf.needs_split_bwd(fft_size)
            packed = _pallas_batch_packed(u) and not split
            spec_bytes = 2 * 2 * math.prod(u.shape[:-1]) * fft_size
            if packed:
                spec_bytes //= 2  # packed spectrum covers two rows
            can_save = save_spectra and spec_bytes <= pallas_save_spec_max_bytes()
            if can_save:
                # save u's permuted spectrum: the backward then transforms
                # only dy (one fwd transform instead of two) and gets dD
                # free via Parseval from the dk accumulator
                y, ur_s, ui_s = _pallas_conv_apply(
                    u, k, D, fft_size, pplan, save_spectrum=True,
                    packed=packed)
                return y.astype(u.dtype), (None, k, D, (ur_s, ui_s), None)
            if not split:
                y = _pallas_conv_apply(u, k, D, fft_size, pplan,
                                       packed=packed).astype(u.dtype)
                return y, (u, k, D, None, None)
            # split-backward sizes need the saved spectrum; without it the
            # conv stays on the XLA chain below
        ur, ui = fft_chain_ri(u.astype(f32), fft_size)
        kr, ki = fft_chain_ri(k.astype(f32), fft_size)
        krb, kib = _expand_k(kr, u.ndim), _expand_k(ki, u.ndim)
        y = ifft_chain_real(ur * krb - ui * kib, ur * kib + ui * krb,
                            fft_size)[..., :seqlen]
        u_f = (ur, ui) if save else None
        k_f = (kr, ki) if save else None
    elif fft_size >= TWO_STEP_FFT_MIN:
        u_f = fft_2step(u.astype(f32), fft_size)
        k_f = fft_2step(k.astype(f32), fft_size)
        y = ifft_2step(u_f * _expand_k(k_f, u.ndim), fft_size).real[..., :seqlen]
    else:
        u_f = _rfft(u.astype(f32), n=fft_size)
        k_f = _rfft(k.astype(f32), n=fft_size)
        y = _irfft(u_f * _expand_k(k_f, u.ndim), n=fft_size)[..., :seqlen]
    if D is not None:
        y = y + u.astype(f32) * jnp.asarray(D, f32)[..., None]
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    y = y.astype(u.dtype)
    res = (u, k, D, u_f if save else None, k_f if save else None)
    return y, res


def _fftconv_bwd(gelu, save_spectra, res, dy):
    u, k, D, u_f_saved, k_f_saved = res
    seqlen = dy.shape[-1]
    fft_size = next_fast_fft_size(2 * seqlen)
    f32 = jnp.float32

    if u is None:  # fused-Pallas forward saved u's spectrum
        pplan = _pallas_conv_plan(dy, k, fft_size, False)
        return _fftconv_bwd_pallas_spec(res, dy, fft_size, pplan)
    if not gelu:
        p3 = _pallas3_plan(u, k, fft_size, False)
        if p3 is not None:
            return _fftconv_bwd_pallas3(res, dy, fft_size, p3)
    if not gelu and _packed_eligible(u, k, fft_size):
        return _fftconv_bwd_packed(res, dy, fft_size)
    if not gelu:
        pouter = _pallas_outer_plan(u, k, fft_size, False)
        if pouter is not None:
            return _fftconv_bwd_pallas_outer(res, dy, pouter)
    if not gelu:
        pnarrow = _pallas_conv_plan(u, k, fft_size, False)
        if pnarrow is not None and pnarrow[2] < 8:
            return _fftconv_bwd_pallas_narrow(res, dy, fft_size, pnarrow)
    if _use_mxu_fft(fft_size, _rows(u.shape)) or fft_size >= TWO_STEP_FFT_MIN:
        return _fftconv_bwd_long(gelu, res, dy, fft_size)

    u_f = u_f_saved if u_f_saved is not None else _rfft(u.astype(f32), n=fft_size)
    k_f = k_f_saved if k_f_saved is not None else _rfft(k.astype(f32), n=fft_size)
    k_f_b = _expand_k(k_f, u.ndim)

    D_arr = jnp.asarray(D)
    D_full = D_arr.astype(f32)[..., None]

    dy = dy.astype(f32)
    if gelu:
        # Recompute pre-activation to differentiate through exact GeLU.
        pre = _irfft(u_f * k_f_b, n=fft_size)[..., :seqlen]
        pre = pre + u.astype(f32) * D_full
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        cdf = 0.5 * (1.0 + jax.lax.erf(pre * inv_sqrt2))
        pdf = jnp.exp(-0.5 * pre * pre) / math.sqrt(2.0 * math.pi)
        dy = dy * (cdf + pre * pdf)

    dy_f = _rfft(dy, n=fft_size)

    # dL/du: correlation with k == irfft(dy_f * conj(k_f)).
    du = _irfft(dy_f * k_f_b.conj(), n=fft_size)[..., :seqlen]
    du = du + dy * D_full

    # dL/dk: the batch reduction commutes with the (linear) inverse
    # transform — reduce the SPECTRUM first so the inverse runs over C rows
    # instead of B*C.
    k_b_shape = _expand_k(k, u.ndim).shape
    spec_shape = k_b_shape[:-1] + (fft_size // 2 + 1,)
    prod = _reduce_to_shape(dy_f * u_f.conj(), spec_shape)
    dk = _irfft(prod, n=fft_size)[..., :k.shape[-1]].reshape(k.shape)

    # dL/dD: dy * u reduced over dims broadcast against D (plus the L axis).
    dD = _reduce_to_shape(dy * u.astype(f32), D_arr.shape + (1,)).reshape(D_arr.shape)

    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


fftconv.defvjp(_fftconv_fwd, _fftconv_bwd)


def fftconv_h3(
    k: jax.Array,
    ssm_kernel: jax.Array,
    D: jax.Array,
    q: jax.Array,
    v: jax.Array,
    head_dim: int = 1,
    ssm_kernel_rev: Optional[jax.Array] = None,
) -> jax.Array:
    """H3-style gated FFT conv (reference `/root/reference/src/ops/fftconv.py:33-55`).

    kv = k ⊗ v (per head outer product), convolved with ssm_kernel plus D
    skip, then contracted with q.

    Shapes (matching the reference einsum layout):
      k, q, v: (B, H, L) with H = num_heads * head_dim
      ssm_kernel: (H, L); D: (H,)
    """
    seqlen = k.shape[-1]
    fft_size = next_fast_fft_size(2 * seqlen)
    f32 = jnp.float32

    kernel_f = _rfft(ssm_kernel.astype(f32), n=fft_size)  # (H, N/2+1)
    if ssm_kernel_rev is not None:
        kernel_f = kernel_f + _rfft(
            ssm_kernel_rev.astype(f32), n=fft_size
        ).conj()

    b = k.shape[0]
    kv = jnp.einsum(
        "bfhl,bghl->bfghl",
        k.reshape(b, -1, head_dim, seqlen).astype(f32),
        v.reshape(b, -1, head_dim, seqlen).astype(f32),
    )
    kv_f = _rfft(kv, n=fft_size) / fft_size
    h = ssm_kernel.shape[0]
    kernel_f_r = kernel_f.reshape(h // head_dim, head_dim, 1, fft_size // 2 + 1)
    # norm="forward" irfft == unnormalized inverse == default irfft * N
    y = (_irfft(kv_f * kernel_f_r, n=fft_size) * fft_size)[..., :seqlen]
    out = y + kv * jnp.asarray(D, f32).reshape(h // head_dim, head_dim, 1, 1)
    q_r = q.reshape(b, -1, head_dim, seqlen).astype(f32)
    out = jnp.einsum("bfghl,bfhl->bghl", out, q_r)
    return out.reshape(b, -1, seqlen).astype(v.dtype)


def fftconv_aliased(u: jax.Array, k: jax.Array, D: jax.Array) -> jax.Array:
    """FFT conv where the (C, Lk) kernel may be LONGER than the (..., C, L)
    signal: computed on an exactly-2L circular transform, so kernel taps in
    [L, 2L) alias into the output — matching the reference's behavior for
    num_blocks > 1 (`/root/reference/src/models/sequence/hyena.py:59-88`
    with torch.fft.rfft's crop-at-n semantics at `hyena.py:77`, where each
    sequence block sees the full-length filter through a 2*(L/z) FFT).

    Plain jnp autodiff (no custom VJP): this path only serves the exotic
    multi-block configuration at short block lengths.
    """
    seqlen = u.shape[-1]
    fft_size = 2 * seqlen  # reference-exact: aliasing depends on this size
    f32 = jnp.float32
    k_f = _rfft(k.astype(f32)[..., :fft_size], n=fft_size)
    u_f = _rfft(u.astype(f32), n=fft_size)
    y = _irfft(u_f * _expand_k(k_f, u.ndim), n=fft_size)[..., :seqlen]
    if D is not None:
        y = y + u.astype(f32) * jnp.asarray(D, f32)[..., None]
    return y.astype(u.dtype)


# ---------------------------------------------------------------------------
# channel-chunked variant for long-context memory control
# ---------------------------------------------------------------------------


# Per-chunk spectrum budget for the channel-chunked conv. Small chunks keep
# the FFT workspace resident and let XLA overlap the scan; measured on the
# 450k train step (16 GB v5e): 1<<28 (chunk 8) = 2.66 s/step, 1<<29
# (chunk 16) = 4.41 s/step, 1<<30 (chunk 32) never finished compiling
# through the tunnel. Bigger is NOT better here — this is a SCHEDULING
# optimum, not a memory guard, so unlike mxu_fft_budget_bytes() it does
# not scale with device HBM (re-tune via the env override on new parts).
FFTCONV_CHUNK_BUDGET = int(os.environ.get("HYENA_FFTCONV_CHUNK_BUDGET",
                                          1 << 28))


def fftconv_chunk_size(c: int, seqlen: int, budget_bytes: int | None = None) -> int:
    """Channels per chunk so one chunk's complex spectrum stays under
    ~budget_bytes. At 1M context the full-width (C=256) conv needs several
    GB of f32 FFT workspace (the 450k single-chip OOM); chunking trades a
    lax.scan over channel blocks for a bounded working set."""
    if budget_bytes is None:
        budget_bytes = FFTCONV_CHUNK_BUDGET
    fft_size = next_fast_fft_size(2 * seqlen)
    per_channel = (fft_size // 2 + 1) * 8  # complex64 spectrum bytes
    block = max(1, budget_bytes // (4 * per_channel))  # ~4 live buffers
    while c % block != 0:  # need an even split for scan
        block -= 1
    return block


def fftconv_chunked(
    u: jax.Array,
    k: jax.Array,
    D: jax.Array,
    gelu: bool = False,
    channel_block: Optional[int] = None,
) -> jax.Array:
    """Causal fftconv on (B, C, L) evaluated in channel chunks via lax.scan.

    Differentiating through the scan re-uses the custom frequency-domain
    VJP per chunk, so the backward pass is memory-bounded too."""
    assert u.ndim == 3, "chunked path expects (B, C, L)"
    b, c, l = u.shape
    block = channel_block or fftconv_chunk_size(c, l)
    if channel_block is None and block < c and not gelu:
        # the fused Pallas conv bounds its own VMEM working set via the
        # channel-block grid, so the HBM-workspace chunking is pure overhead
        # when it engages (32k bench: 2-chunk scan 206 ms/step -> unchunked
        # 183 ms); only chunk sizes the kernel can't take (no plan / rows
        # over the MXU budget).
        fft_size = next_fast_fft_size(2 * l)
        if ((_use_mxu_fft(fft_size, _rows(u.shape))
                and _pallas_conv_plan(u, k, fft_size, gelu) is not None)
                or _pallas3_plan(u, k, fft_size, gelu) is not None
                or _pallas_outer_plan(u, k, fft_size, gelu) is not None):
            block = c
    if block >= c:
        return fftconv(u, k, D, gelu)
    n = c // block
    u_c = jnp.moveaxis(u.reshape(b, n, block, l), 1, 0)  # (n, B, blk, L)
    # the filter may be SHORTER than the sequence (l > l_max generation /
    # ICL: only the filter is truncated) — chunk it at its own length
    k_c = k.reshape(n, block, k.shape[-1])
    D_c = jnp.asarray(D).reshape(n, block)

    def body(_, inp):
        uu, kk, dd = inp
        # save_spectra=False: per-chunk residuals would stack across the scan
        return None, fftconv(uu, kk, dd, gelu, False)

    _, y = jax.lax.scan(body, None, (u_c, k_c, D_c))
    return jnp.moveaxis(y, 0, 1).reshape(b, c, l)


# ---------------------------------------------------------------------------
# gated fftconv: y = (conv(u, k) + u*D) * x0 with the gate fused in-kernel
# ---------------------------------------------------------------------------
# The Hyena post-gate (reference `hyena.py:441`, fused in-kernel by
# `csrc/fftconv/fftconv_cuda.cu:336-519`) costs XLA an extra elementwise
# pass over the step's largest tensors when composed as fftconv(...) * x0:
# the conv output round-trips HBM just to be multiplied. The gated kernels
# (ops/pallas_fftconv.py) take x0 as one more input stream, write the gated
# output directly, and the backward recomputes the ungated conv output from
# u's spectrum IN-VMEM for dx0 = dy * v — v never exists in HBM in either
# direction.
# MEASURED AND REJECTED on v5e (2026-08-20, 32k bench shape B=4 C=256):
# all three gated variants lose to the composite (conv kernel + XLA gate):
#   conv+gate slice train: composite 6.45 ms, specv 7.21, spec 8.21;
#   model_train: composite 103.46 ms, specv 105.92.
# XLA's elementwise gate passes already run at full HBM bandwidth and fuse
# with their neighbors, while the kernel's extra input/output streams (x0
# in, v out) cost its pipeline more than the deleted round trips — the
# kernel is not bandwidth-bound at these shapes. Kept as a gated,
# parity-tested experiment (tests/test_fftconv_gated.py); enable with
# HYENA_GATED_CONV=1.
PALLAS_GATED_FFTCONV = os.environ.get("HYENA_GATED_CONV", "0") == "1"
# Backward strategy:
#   "specv":       fwd saves u's spectrum AND the ungated v; bwd transform
#                  count matches the ungated backward (dx0 = dy*v is VPU).
#   "spec":        fwd saves only the spectrum; bwd recomputes v with one
#                  extra in-kernel inverse (more MXU, less HBM).
#   "retransform": fwd saves nothing; bwd re-transforms u AND recomputes v
#                  (most MXU, least HBM).
PALLAS_GATED_MODE = os.environ.get("HYENA_GATED_MODE", "specv")
if PALLAS_GATED_MODE not in ("specv", "spec", "retransform"):
    raise ValueError(
        f"HYENA_GATED_MODE={PALLAS_GATED_MODE!r} is not one of "
        "'specv'/'spec'/'retransform'")


def _gated_plan(u, k, fft_size):
    """(r, m, cb) when the packed gated kernels cover this conv."""
    if not (PALLAS_FFTCONV and PALLAS_GATED_FFTCONV):
        return None
    if u.ndim != 3 or k.ndim != 2 or k.shape[0] != u.shape[1]:
        return None
    if u.shape[0] % 2:  # packed kernels pair batch rows
        return None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return None
    if not (on_tpu or PALLAS_FFTCONV_INTERPRET):
        return None
    if not _use_mxu_fft(fft_size, _rows(u.shape)):
        return None
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    if _pf.needs_split_bwd(fft_size):
        return None  # no gated split backward; composite fallback
    p = _pf.plan(fft_size, u.shape[1], u.shape[-1], _nat_chain(fft_size))
    if p is None or p[2] < 8:
        return None  # narrow plans have no gated variant
    return p


def _fftconv_gated_prim(u, x0, k, D):
    y, _ = _fftconv_gated_fwd(u, x0, k, D)
    return y


def _gated_pad(a, lp):
    seqlen = a.shape[-1]
    return (jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, lp - seqlen)])
            if seqlen < lp else a)


def _gated_d_arr(D, c):
    if D is None:
        return jnp.zeros((c,), jnp.float32)
    return jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1), (c,))


def _fftconv_gated_fwd(u, x0, k, D):
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    seqlen = u.shape[-1]
    fft_size = next_fast_fft_size(2 * seqlen)
    r, m, cb = _gated_plan(u, k, fft_size)
    lp = (r // 2) * m
    u_in = _gated_pad(u, lp)
    x0_in = _gated_pad(x0, lp)
    k_in = _gated_pad(k, lp)
    d_arr = _gated_d_arr(D, u.shape[1])
    spec_bytes = 2 * 2 * (u.shape[0] // 2) * u.shape[1] * fft_size
    mode = PALLAS_GATED_MODE
    if mode == "specv":
        # the saved ungated conv output v is part of the HBM residual
        # footprint too (same size as the padded u, bf16)
        spec_bytes += 2 * u.shape[0] * u.shape[1] * lp
    if spec_bytes > pallas_save_spec_max_bytes():
        mode = "retransform"
    if mode == "specv":
        y, v_s, ur_s, ui_s = _pf.fftconv_fused_fwd_packed_gated(
            u_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET, save_spectrum=True,
            save_v=True)
        res = (None, x0, k, D, (ur_s, ui_s, v_s))
    elif mode == "spec":
        y, ur_s, ui_s = _pf.fftconv_fused_fwd_packed_gated(
            u_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET, save_spectrum=True)
        res = (None, x0, k, D, (ur_s, ui_s))
    else:
        y = _pf.fftconv_fused_fwd_packed_gated(
            u_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
        res = (u, x0, k, D, None)
    return y[..., :seqlen].astype(u.dtype), res


def _fftconv_gated_bwd(res, dy):
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    u, x0, k, D, spec = res
    seqlen = dy.shape[-1]
    fft_size = next_fast_fft_size(2 * seqlen)
    plan = _gated_plan(x0, k, fft_size)
    if plan is None:
        raise RuntimeError(
            "fftconv_gated backward: _gated_plan no longer covers the "
            "shape it planned in forward (flag mutated between fwd and "
            "bwd?); cannot select a backward kernel")
    r, m, cb = plan
    lp = (r // 2) * m
    dy_in = _gated_pad(dy, lp)
    x0_in = _gated_pad(x0, lp)
    k_in = _gated_pad(k, lp)
    c = k.shape[0]
    d_arr = _gated_d_arr(D, c)
    if spec is not None and len(spec) == 3:
        ur_s, ui_s, v_s = spec
        du, dx0, dk_t, dd_c = _pf.fftconv_fused_bwd_specv_packed_gated(
            ur_s, ui_s, v_s, dy_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
        dk = dk_t[..., :k.shape[-1]].reshape(k.shape)
    elif spec is not None:
        ur_s, ui_s = spec
        du, dx0, dk_t, dd_c = _pf.fftconv_fused_bwd_spec_packed_gated(
            ur_s, ui_s, dy_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
        dk = dk_t[..., :k.shape[-1]].reshape(k.shape)
    else:
        u_in = _gated_pad(u, lp)
        du, dx0, pr, pi, dd_c = _pf.fftconv_fused_bwd_packed_gated(
            u_in, dy_in, x0_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
        back = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(c, r * m)
        dk = ifft_chain_real(back(pr), back(pi),
                             fft_size)[..., :k.shape[-1]].reshape(k.shape)
    du = du[..., :seqlen].astype(dy.dtype)
    dx0 = dx0[..., :seqlen].astype(x0.dtype)
    if D is None:
        return du, dx0, dk.astype(k.dtype), None
    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dd_c.reshape(1, c, 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du, dx0, dk.astype(k.dtype), dD.astype(D_arr.dtype)


_fftconv_gated_prim = jax.custom_vjp(_fftconv_gated_prim)
_fftconv_gated_prim.defvjp(_fftconv_gated_fwd, _fftconv_gated_bwd)


# Remat tag for long-conv outputs: LMBackbone's remat_save_conv policy
# (save_only_these_names) saves values tagged with this name across the
# per-block remat boundary, so the backward replay reuses the conv output
# instead of re-running the most expensive op in the layer. No-op under
# nothing_saveable.
CONV_OUT_TAG = "hyena_conv_out"
# Same idea for the implicit filter bank k: it depends only on parameters,
# so without a tag the remat replay re-runs the whole filter MLP +
# modulation per layer. bf16 (C, L) residency per layer when saved.
FILTER_K_TAG = "hyena_filter_k"


def tag_conv_out(y):
    return checkpoint_name(y, CONV_OUT_TAG)


def tag_filter_k(k):
    return checkpoint_name(k, FILTER_K_TAG)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fftconv_outer_4d(u4: jax.Array, k4: jax.Array, D: jax.Array,
                     n1: int, r: int, m: int) -> jax.Array:
    """causal_conv(u, k) + u*D on PRE-SHAPED (B, C, n1//2*r, m) operands.

    The 4-D layout is the outer-radix kernel's native view of the padded
    flat (B, C, Lp) array; on TPU the flat<->4-D reshape is a full-array
    tiling relayout (measured ~0.8 ms per 268 MB operand at fft 2^20), so
    producers that can emit this layout directly (the 4-D Pallas front
    end, the filter-bank builder in HyenaOperator) call this wrapper and
    the whole conv round trip carries no pad/copy ops. Grads mirror the
    flat custom_vjp (recompute-both-transforms backward in-kernel)."""
    from hyena_dna_tpu.ops import pallas_fftconv_n3 as _po

    return _po.fftconv_outer_fwd4(u4, k4, D, n1, r, m,
                                  interpret=PALLAS_FFTCONV_INTERPRET)


def _outer4_fwd(u4, k4, D, n1, r, m):
    return fftconv_outer_4d(u4, k4, D, n1, r, m), (u4, k4, D)


def _outer4_bwd(n1, r, m, res, dy4):
    from hyena_dna_tpu.ops import pallas_fftconv_n3 as _po

    u4, k4, D = res
    du4, dk4, dd = _po.fftconv_outer_bwd4(u4, dy4, k4, D, n1, r, m,
                                          interpret=PALLAS_FFTCONV_INTERPRET)
    D_arr = jnp.asarray(D)
    return (du4.astype(u4.dtype), dk4.astype(k4.dtype),
            dd.reshape(D_arr.shape).astype(D_arr.dtype))


fftconv_outer_4d.defvjp(_outer4_fwd, _outer4_bwd)


def fftconv_gated(u: jax.Array, x0: jax.Array, k: jax.Array,
                  D: jax.Array) -> jax.Array:
    """(causal_conv(u, k) + u*D) * x0 on (B, C, L).

    Routes to the gate-fused packed Pallas kernels when they cover the
    shape (fft 2^16/2^17, even B, C % 8 == 0); otherwise the composite
    fftconv_chunked(u, k, D) * x0 — identical math either way."""
    fft_size = next_fast_fft_size(2 * u.shape[-1])
    if _gated_plan(u, k, fft_size) is not None:
        return _fftconv_gated_prim(u, x0, k, D)
    # tag the UNGATED conv output: the gate's VJP consumes it, so under
    # the remat_save_conv policy saving it (not the gated product) is what
    # lets the backward replay skip the conv forward entirely
    v = tag_conv_out(fftconv_chunked(u, k, D, False))
    return (v * x0).astype(u.dtype)


# ---------------------------------------------------------------------------
# two-step (four-step / Bailey) FFT for very long transforms
# ---------------------------------------------------------------------------

# Above this size the monolithic XLA TPU FFT is either unsupported or slower
# than a blocked decomposition; 2-step splits an N-point FFT into R-point and
# M-point passes (N = R*M) with a twiddle multiply between.
TWO_STEP_FFT_MIN = 1 << 21


def _split_rm(n: int) -> tuple[int, int]:
    """Balanced power-of-2 split N = R*M with R <= M."""
    logn = n.bit_length() - 1
    r = 1 << (logn // 2)
    return r, n // r


def fft_2step(x: jax.Array, n: int) -> jax.Array:
    """Complex N-point FFT via the four-step algorithm, returning the
    spectrum in PERMUTED order X[q*R + p] laid out as (..., R(p), M(q)).

    For convolution the permutation is irrelevant as long as both operands
    use the same transform (multiply bin-wise, invert with ifft_2step).
    x: (..., L) with L <= n; zero-padded to n.
    """
    r, m = _split_rm(n)
    pad = n - x.shape[-1]
    if pad:
        x = jnp.pad(x.astype(jnp.complex64), [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        x = x.astype(jnp.complex64)
    # time index t = a*m + b -> (a, b), a in [0, R), b in [0, M)
    xg = x.reshape(*x.shape[:-1], r, m)
    # step 1: FFT over a (length R) for each b
    g = jnp.fft.fft(jnp.swapaxes(xg, -1, -2), axis=-1)  # (..., M(b), R(p))
    # step 2: twiddle W_N^{b p}
    b_idx = jnp.arange(m)[:, None]
    p_idx = jnp.arange(r)[None, :]
    tw = jnp.exp(-2j * jnp.pi * (b_idx * p_idx) / n).astype(jnp.complex64)
    g = g * tw
    # step 3: FFT over b (length M) for each p -> X[q*R+p] at (..., p, q)
    g = jnp.fft.fft(jnp.swapaxes(g, -1, -2), axis=-1)  # (..., R(p), M(q))
    return g.reshape(*x.shape[:-1], n)


def ifft_2step(xf: jax.Array, n: int) -> jax.Array:
    """Inverse of fft_2step (input in the same permuted order):
    ifft(x) = conj(fft(conj(x)))/N with the matching permutation."""
    r, m = _split_rm(n)
    xg = jnp.conj(xf).reshape(*xf.shape[:-1], r, m)
    # undo step 3
    g = jnp.fft.fft(xg, axis=-1)  # over q -> b'... same structure as forward
    b_idx = jnp.arange(m)[None, :]
    p_idx = jnp.arange(r)[:, None]
    tw = jnp.exp(-2j * jnp.pi * (b_idx * p_idx) / n).astype(jnp.complex64)
    g = g * tw
    g = jnp.fft.fft(jnp.swapaxes(g, -1, -2), axis=-1)  # over p
    # result is conj of time signal at layout (..., M(b), R(a))?? -> flatten
    out = jnp.conj(g) / n
    out = jnp.swapaxes(out.reshape(*xf.shape[:-1], m, r), -1, -2)
    return out.reshape(*xf.shape[:-1], n)


def fftconv_long(u: jax.Array, k: jax.Array, D: jax.Array, n: int) -> jax.Array:
    """Causal conv via the permuted-order two-step FFT (for n beyond the
    monolithic TPU FFT's reach). Same math as fftconv, complex transform."""
    seqlen = u.shape[-1]
    u_f = fft_2step(u.astype(jnp.float32), n)
    k_f = fft_2step(k.astype(jnp.float32), n)
    y = ifft_2step(u_f * k_f, n).real[..., :seqlen]
    if D is not None:
        y = y + u.astype(jnp.float32) * jnp.asarray(D, jnp.float32)[..., None]
    return y.astype(u.dtype)


def _fftconv_bwd_mxu_ri(gelu, res, dy, fft_size):
    """MXU backward on split real/imag chain transforms: conjugation and the
    batch reduction act bin-wise/linearly, so both work in the digit-permuted
    layout; all inverses keep only the real part (2 matmuls each)."""
    u, k, D, u_f_saved, k_f_saved = res
    seqlen = u.shape[-1]
    f32 = jnp.float32
    pplan = None if gelu else _pallas_conv_plan(u, k, fft_size, False)
    if pplan is not None:
        from hyena_dna_tpu.ops import pallas_fftconv as _pf

        if not _pf.needs_split_bwd(fft_size):
            return _fftconv_bwd_pallas(res, dy, fft_size, pplan)
        # split sizes (2^18) need the forward-saved spectrum: the monolith
        # backward blows the VMEM cap there (121.9 MB measured) — chain
    ur, ui = (u_f_saved if u_f_saved is not None
              else fft_chain_ri(u.astype(f32), fft_size))
    kr, ki = (k_f_saved if k_f_saved is not None
              else fft_chain_ri(k.astype(f32), fft_size))
    krb, kib = _expand_k(kr, u.ndim), _expand_k(ki, u.ndim)
    D_arr = jnp.asarray(D)
    D_full = D_arr.astype(f32)[..., None]

    dy = dy.astype(f32)
    if gelu:
        pre = ifft_chain_real(ur * krb - ui * kib, ur * kib + ui * krb,
                              fft_size)[..., :seqlen]
        pre = pre + u.astype(f32) * D_full
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        cdf = 0.5 * (1.0 + jax.lax.erf(pre * inv_sqrt2))
        pdf = jnp.exp(-0.5 * pre * pre) / math.sqrt(2.0 * math.pi)
        dy = dy * (cdf + pre * pdf)

    dr, di = fft_chain_ri(dy, fft_size)
    # dL/du = inv(dy_f * conj(k_f))
    du = ifft_chain_real(dr * krb + di * kib, di * krb - dr * kib,
                         fft_size)[..., :seqlen]
    du = du + dy * D_full
    # dL/dk = inv(sum_batch dy_f * conj(u_f)) — reduce spectra first
    k_b_shape = _expand_k(k, u.ndim).shape
    spec_shape = k_b_shape[:-1] + (fft_size,)
    pr = _reduce_to_shape(dr * ur + di * ui, spec_shape)
    pi = _reduce_to_shape(di * ur - dr * ui, spec_shape)
    dk = ifft_chain_real(pr, pi, fft_size)[..., :k.shape[-1]].reshape(k.shape)
    dD = _reduce_to_shape(dy * u.astype(f32), D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


def _fftconv_bwd_pallas(res, dy, fft_size, plan_rmc):
    """Backward through the fused kernel (no-gelu 3D case):
    du = the SAME fused conv with the conjugated filter spectrum (+ dy*D);
    dk = kernel-accumulated sum_b dy_f*conj(u_f) + a cheap C-row inverse."""
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    u, k, D, _, _ = res
    r, m, cb = plan_rmc
    seqlen = u.shape[-1]
    f32 = jnp.float32
    lp = (r // 2) * m
    # dy keeps its native dtype: the kernel rounds dot inputs to bf16 and
    # accumulates f32 regardless, so an f32 upcast only doubles HBM traffic

    pad = [(0, 0), (0, 0), (0, lp - seqlen)] if seqlen < lp else None
    u_in = jnp.pad(u, pad) if pad else u
    dy_in = jnp.pad(dy, pad) if pad else dy
    k_in = k  # native dtype: kernel dots round to bf16 regardless
    if k.shape[-1] < lp:
        k_in = jnp.pad(k_in, [(0, 0), (0, lp - k.shape[-1])])
    d_arr = (jnp.zeros((u.shape[1],), f32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, f32).reshape(-1),
                                   (u.shape[1],)))
    bwd = (_pf.fftconv_fused_bwd_packed if _pallas_batch_packed(u)
           else _pf.fftconv_fused_bwd)
    du, pr, pi, dD_full = bwd(
        u_in, dy_in, k_in, d_arr, r, m, cb,
        interpret=PALLAS_FFTCONV_INTERPRET)
    du = du[..., :seqlen]

    c = k.shape[0]
    back = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(c, r * m)
    dk = ifft_chain_real(back(pr), back(pi), fft_size)[..., :k.shape[-1]]
    dk = dk.reshape(k.shape)

    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dD_full.reshape(1, c, 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


def _fftconv_bwd_pallas_narrow(res, dy, fft_size, plan_rmc):
    """Backward through the narrow-cb fused kernel (fft >= 2^19): one
    recompute program emits du, dk (inverse included) and dD (Parseval)."""
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    u, k, D, _, _ = res
    r, m, cb = plan_rmc
    seqlen = u.shape[-1]
    lp = (r // 2) * m
    pad = [(0, 0), (0, 0), (0, lp - seqlen)] if seqlen < lp else None
    u_in = jnp.pad(u, pad) if pad else u
    dy_in = jnp.pad(dy, pad) if pad else dy
    k_in = (jnp.pad(k, [(0, 0), (0, lp - k.shape[-1])])
            if k.shape[-1] < lp else k)
    d_arr = (jnp.zeros((u.shape[1],), jnp.float32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                   (u.shape[1],)))
    du, dk_t, dD_c = _pf.fftconv_fused_bwd_narrow(
        u_in, dy_in, k_in, d_arr, r, m, cb,
        interpret=PALLAS_FFTCONV_INTERPRET)
    du = du[..., :seqlen]
    dk = dk_t[..., :k.shape[-1]].reshape(k.shape)
    if D is None:
        return du.astype(u.dtype), dk.astype(k.dtype), None
    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dD_c.reshape(1, k.shape[0], 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


def _fftconv_bwd_pallas_spec(res, dy, fft_size, plan_rmc):
    """Backward reusing u's spectrum saved by the fused-Pallas forward:
    one dy transform per program; dk (inverse included) and dD (Parseval)
    come straight out of the kernel."""
    from hyena_dna_tpu.ops import pallas_fftconv as _pf

    _, k, D, (ur_s, ui_s), _ = res
    r, m, cb = plan_rmc
    seqlen = dy.shape[-1]
    lp = (r // 2) * m
    dy_in = (jnp.pad(dy, [(0, 0), (0, 0), (0, lp - seqlen)])
             if seqlen < lp else dy)
    k_in = k
    if k.shape[-1] < lp:
        k_in = jnp.pad(k_in, [(0, 0), (0, lp - k.shape[-1])])
    d_arr = (jnp.zeros((dy.shape[1],), jnp.float32) if D is None
             else jnp.broadcast_to(jnp.asarray(D, jnp.float32).reshape(-1),
                                   (dy.shape[1],)))
    if _pf.needs_split_bwd(fft_size):
        # fft 2^18: two kernels, each inside the VMEM cap (see the split-
        # backward note in ops/pallas_fftconv.py)
        du, dr_s, di_s = _pf.fftconv_fused_bwd_du(
            dy_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
        dk_t, dD_c = _pf.fftconv_fused_dk_from_specs(
            ur_s, ui_s, dr_s, di_s, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
    else:
        # a packed forward saved the (B//2, r, C, m) spectrum of u0 + i*u1
        packed = ur_s.shape[0] * 2 == dy.shape[0]
        bwd = (_pf.fftconv_fused_bwd_spec_packed if packed
               else _pf.fftconv_fused_bwd_spec)
        du, dk_t, dD_c = bwd(
            ur_s, ui_s, dy_in, k_in, d_arr, r, m, cb,
            interpret=PALLAS_FFTCONV_INTERPRET)
    du = du[..., :seqlen]
    dk = dk_t[..., :k.shape[-1]].reshape(k.shape)

    c = k.shape[0]
    D_arr = jnp.asarray(D)
    dD = _reduce_to_shape(dD_c.reshape(1, c, 1),
                          D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(dy.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


def _fftconv_bwd_long(gelu, res, dy, fft_size):
    """Backward via a permuted-order blocked transform (conjugation works
    bin-wise in any consistent ordering): MXU matmul-FFT on TPU, two-step
    FFT otherwise."""
    if _use_mxu_fft(fft_size, _rows(res[0].shape)):
        return _fftconv_bwd_mxu_ri(gelu, res, dy, fft_size)
    u, k, D, u_f_saved, k_f_saved = res
    seqlen = u.shape[-1]
    f32 = jnp.float32
    fwd_t = fft_2step
    inv_t = ifft_2step
    u_f = u_f_saved if u_f_saved is not None else fwd_t(u.astype(f32), fft_size)
    k_f = k_f_saved if k_f_saved is not None else fwd_t(k.astype(f32), fft_size)
    k_f_b = _expand_k(k_f, u.ndim)
    D_arr = jnp.asarray(D)
    D_full = D_arr.astype(f32)[..., None]

    dy = dy.astype(f32)
    if gelu:
        pre = inv_t(u_f * k_f_b, fft_size).real[..., :seqlen]
        pre = pre + u.astype(f32) * D_full
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        cdf = 0.5 * (1.0 + jax.lax.erf(pre * inv_sqrt2))
        pdf = jnp.exp(-0.5 * pre * pre) / math.sqrt(2.0 * math.pi)
        dy = dy * (cdf + pre * pdf)

    dy_f = fwd_t(dy, fft_size)
    du = inv_t(dy_f * k_f_b.conj(), fft_size).real[..., :seqlen]
    du = du + dy * D_full
    # reduce the spectrum over batch dims before the (linear) inverse
    k_b_shape = _expand_k(k, u.ndim).shape
    spec_shape = k_b_shape[:-1] + (fft_size,)
    prod = _reduce_to_shape(dy_f * u_f.conj(), spec_shape)
    dk = inv_t(prod, fft_size).real[..., :k.shape[-1]].reshape(k.shape)
    dD = _reduce_to_shape(dy * u.astype(f32), D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


# ---------------------------------------------------------------------------
# MXU (matmul) FFT conv — FlashFFTConv-style decomposition for TPU
# ---------------------------------------------------------------------------
#
# Rationale (measured on v5e): XLA's native FFT runs on the VPU at ~1 TFLOP/s
# effective, while the MXU idles at 100-200 TFLOP/s. Decomposing the FFT as
# Cooley-Tukey with dense DFT-matrix multiplies (the FlashFFTConv idea,
# arXiv 2311.05908, adapted from tensor cores to the MXU) trades ~12x more
# FLOPs for a ~100x faster unit. The transform returns bins in the permuted
# order X[q*R + p]; convolution multiplies bin-wise so the order cancels
# between forward and inverse.


def _dft_mat(n: int) -> jnp.ndarray:
    a = jnp.arange(n)
    return jnp.exp(-2j * jnp.pi * a[:, None] * a[None, :] / n).astype(jnp.complex64)


def fft_matmul(x: jax.Array, n: int) -> jax.Array:
    """Complex n-point FFT via two DFT-matmul passes (permuted bin order).

    x: (..., L<=n) real or complex; returns (..., n) complex64 with bins
    ordered as (p, q) blocks (same layout as fft_2step).
    """
    r, m = _split_rm(n)
    pad = n - x.shape[-1]
    x = x.astype(jnp.complex64)
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xg = x.reshape(*x.shape[:-1], r, m)  # t = a*m + b -> [a, b]
    # pass 1: DFT over a (length r) for each b  -> G[p, b]
    Fr = _dft_mat(r)
    g = jnp.einsum("pa,...ab->...pb", Fr, xg)
    # twiddle W_N^{b p}
    tw = jnp.exp(
        -2j * jnp.pi * (jnp.arange(m)[None, :] * jnp.arange(r)[:, None]) / n
    ).astype(jnp.complex64)
    g = g * tw
    # pass 2: DFT over b (length m) for each p -> X[q*r + p] at [p, q]
    Fm = _dft_mat(m)
    g = jnp.einsum("qb,...pb->...pq", Fm, g)
    return g.reshape(*x.shape[:-1], n)


def ifft_matmul(xf: jax.Array, n: int) -> jax.Array:
    """Inverse of fft_matmul (permuted-order input), mirroring ifft_2step's
    structure with DFT matmuls."""
    r, m = _split_rm(n)
    xg = jnp.conj(xf).reshape(*xf.shape[:-1], r, m)  # (..., p, q)
    Fm = _dft_mat(m)
    Fr = _dft_mat(r)
    g = jnp.einsum("cq,...pq->...pc", Fm, xg)  # FFT over q (length m)
    tw = jnp.exp(
        -2j * jnp.pi * (jnp.arange(m)[None, :] * jnp.arange(r)[:, None]) / n
    ).astype(jnp.complex64)
    g = g * tw  # (r, m) broadcast over (..., p, b)
    g = jnp.swapaxes(g, -1, -2)  # (..., m(b), r(p))
    g = jnp.einsum("cp,...bp->...bc", Fr, g)  # FFT over p (length r)
    out = jnp.conj(g) / n  # (..., m(b), r(a))
    out = jnp.swapaxes(out, -1, -2)  # (..., r(a), m(b)): t = a*m + b
    return out.reshape(*xf.shape[:-1], n)


def fftconv_mxu(u: jax.Array, k: jax.Array, D, gelu: bool = False) -> jax.Array:
    """Causal FFT conv evaluated with MXU matmul-FFTs.

    Same semantics as `fftconv` (u (..., C, L), k (C, L), D skip); complex
    arithmetic decomposes into real matmuls on the MXU. Accuracy: f32
    matmul accumulation; relative error ~1e-5 at L=64k (tested).
    """
    seqlen = u.shape[-1]
    n = next_fast_fft_size(2 * seqlen)
    ur, ui = fft_chain_ri(u.astype(jnp.float32), n)
    kr, ki = fft_chain_ri(k.astype(jnp.float32), n)
    krb, kib = _expand_k(kr, u.ndim), _expand_k(ki, u.ndim)
    y = ifft_chain_real(ur * krb - ui * kib, ur * kib + ui * krb, n)[..., :seqlen]
    if D is not None:
        y = y + u.astype(jnp.float32) * jnp.asarray(D, jnp.float32)[..., None]
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(u.dtype)


# ---------------------------------------------------------------------------
# real-FFT channel packing for the MXU path: two real channels ride one
# complex transform (classic a+ib trick), halving matmul-FFT work.
# ---------------------------------------------------------------------------


def _conj_perm(n: int) -> jnp.ndarray:
    """Index array mapping each spectrum position (permuted layout) to the
    position holding bin (-nu mod n). Layout: position p*m+q stores bin
    nu = q*r + p (see fft_matmul)."""
    import numpy as _np

    r, m = _split_rm(n)
    p = _np.arange(r)[:, None]
    q = _np.arange(m)[None, :]
    # p > 0: -nu at (r-p, m-1-q); p == 0: -nu at (0, (m-q) % m)
    p2 = _np.where(p > 0, r - p, 0)
    q2 = _np.where(p > 0, m - 1 - q, (m - q) % m)
    return jnp.asarray((p2 * m + q2).reshape(-1))


def _unpack_pair(Z: jax.Array, perm: jnp.ndarray):
    """Spectrum of (a + i b) -> spectra of real a and b."""
    Zc = jnp.conj(jnp.take(Z, perm, axis=-1))
    A = 0.5 * (Z + Zc)
    Bv = -0.5j * (Z - Zc)
    return A, Bv


def fftconv_mxu_packed(u: jax.Array, k: jax.Array, D, gelu: bool = False) -> jax.Array:
    """Causal conv on the MXU with channel-pair packing (C must be even):
    1.5 C/2-row transforms instead of 3 C-row ones — ~2x less transform
    work on the dominant cost."""
    seqlen = u.shape[-1]
    c = u.shape[-2]
    assert c % 2 == 0, "packed path needs an even channel count"
    n = next_fast_fft_size(2 * seqlen)
    h = c // 2
    f32 = jnp.float32
    perm = _conj_perm(n)

    zu = u[..., :h, :].astype(f32) + 1j * u[..., h:, :].astype(f32)
    zk = k[..., :h, :].astype(f32) + 1j * k[..., h:, :].astype(f32)
    Zu = fft_matmul(zu, n)
    Zk = fft_matmul(zk, n)
    UA, UB = _unpack_pair(Zu, perm)
    KA, KB = _unpack_pair(Zk, perm)
    YA = UA * _expand_k(KA, u.ndim)
    YB = UB * _expand_k(KB, u.ndim)
    W = YA + 1j * YB
    yw = ifft_matmul(W, n)[..., :seqlen]
    y = jnp.concatenate([yw.real, yw.imag], axis=-2)
    if D is not None:
        y = y + u.astype(f32) * jnp.asarray(D, f32)[..., None]
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(u.dtype)


def _fftconv_bwd_packed(res, dy, fft_size):
    """Backward with channel-pair packing (no-gelu 3D case): 5 transforms of
    C/2 rows instead of 5 of C."""
    u, k, D, _, _ = res
    seqlen = u.shape[-1]
    c = u.shape[-2]
    h = c // 2
    f32 = jnp.float32
    perm = _conj_perm(fft_size)

    def pack(x):
        return x[..., :h, :].astype(f32) + 1j * x[..., h:, :].astype(f32)

    UA, UB = _unpack_pair(fft_matmul(pack(u), fft_size), perm)
    KA, KB = _unpack_pair(fft_matmul(pack(k), fft_size), perm)
    dy = dy.astype(f32)
    DA, DB = _unpack_pair(fft_matmul(pack(dy), fft_size), perm)

    D_arr = jnp.asarray(D)
    D_full = D_arr.astype(f32)[..., None]

    W_du = DA * jnp.conj(KA) + 1j * (DB * jnp.conj(KB))
    duw = ifft_matmul(W_du, fft_size)[..., :seqlen]
    du = jnp.concatenate([duw.real, duw.imag], axis=-2) + dy * D_full

    # batch-reduce in the frequency domain before the inverse (linearity)
    W_dk = DA * jnp.conj(UA) + 1j * (DB * jnp.conj(UB))
    W_dk = jnp.sum(W_dk, axis=0) if W_dk.ndim == 3 else W_dk
    dkw = ifft_matmul(W_dk, fft_size)[..., :seqlen]
    dk = jnp.concatenate([dkw.real, dkw.imag], axis=-2).reshape(k.shape)

    dD = _reduce_to_shape(dy * u.astype(f32), D_arr.shape + (1,)).reshape(D_arr.shape)
    return du.astype(u.dtype), dk.astype(k.dtype), dD.astype(D_arr.dtype)


# ---------------------------------------------------------------------------
# natural-order recursive matmul FFT: Cooley-Tukey where every level is a
# pair of DFT matmuls + twiddle, recursing until the dense base case. The
# output is in NATURAL bin order (each level's (p, q) block layout flattens
# to q*R+p after one swapaxes), so the inverse is simply the conjugation
# identity — no permutation bookkeeping, and FLOPs scale as N * sum(factors)
# instead of N * (r + m) of the single-level version (16x less at n=2^20).
# ---------------------------------------------------------------------------

MATMUL_DFT_BASE = 256  # dense DFT below this size


def fft_natural_matmul(x: jax.Array, n: int) -> jax.Array:
    """Natural-order complex FFT of length n via recursive DFT matmuls."""
    pad = n - x.shape[-1]
    x = x.astype(jnp.complex64)
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return _fft_nat(x, n)


def _fft_nat(x: jax.Array, n: int) -> jax.Array:
    if n <= MATMUL_DFT_BASE:
        return jnp.einsum("kt,...t->...k", _dft_mat(n), x)
    r, m = _split_rm(n)
    xg = x.reshape(*x.shape[:-1], r, m)  # t = a*m + b -> [a, b]
    # FFT_R over a for each b: bring 'a' minor
    g = _fft_nat(jnp.swapaxes(xg, -1, -2), r)  # (..., m(b), r(p))
    tw = jnp.exp(
        -2j * jnp.pi * (jnp.arange(m)[:, None] * jnp.arange(r)[None, :]) / n
    ).astype(jnp.complex64)
    g = g * tw
    # FFT_M over b for each p
    g = _fft_nat(jnp.swapaxes(g, -1, -2), m)  # (..., r(p), m(q))
    # natural bin k = q*r + p -> layout [q][p]
    return jnp.swapaxes(g, -1, -2).reshape(*x.shape[:-1], n)


def ifft_natural_matmul(xf: jax.Array, n: int) -> jax.Array:
    return jnp.conj(fft_natural_matmul(jnp.conj(xf), n)) / n


# ---------------------------------------------------------------------------
# chain (digit-permuted) matmul FFT: transpose-free Cooley-Tukey.
#
# The natural-order recursion above pays one (-1,-2) relayout per level to
# interleave bins back into natural order. Convolution never needs natural
# order — it multiplies bin-wise — so this pair keeps the spectrum in the
# digit-permuted layout the recursion produces, and the inverse consumes that
# same layout, eliminating every transpose in the round trip.
#
# Factor-chain rule, measured on v5e (conv = 3 transforms + bin multiply,
# ms at constant rows*n): pass count dominates — each extra pass costs a
# full spectrum read/write + twiddle — until the per-pass matmul K grows
# past ~512, where matmul time takes over. Balanced 2-factor chains win
# through n=2^18 (35-37 ms), balanced 3-factor chains win from n=2^20
# ((64,128,128): 77 vs 81 ms; (128,128,128) at 2^21: 95 vs 145 ms); the
# per-element cost of a p-pass chain is flat in n until its factors exceed
# ~512, putting the 3->4 pass crossover near 2^26. Small factors are placed
# FIRST so the minor (lane) dim of every intermediate stays >= 128.
# ---------------------------------------------------------------------------

CHAIN_OVERRIDE: dict[int, tuple[int, ...]] = {}  # per-n experiments


def _nat_chain(n: int) -> tuple[int, ...]:
    if n in CHAIN_OVERRIDE:
        return tuple(CHAIN_OVERRIDE[n])
    if n <= 1 << 10:
        return (n,)
    if n & (n - 1):
        raise ValueError(f"matmul-FFT chain needs a power-of-2 size, got {n}")
    e = n.bit_length() - 1
    parts = 2 if e <= 19 else 3 if e <= 25 else 4
    base, rem = divmod(e, parts)
    exps = [base] * (parts - rem) + [base + 1] * rem  # ascending
    return tuple(1 << x for x in exps)


def _twiddle(r: int, m: int, n: int) -> jnp.ndarray:
    return jnp.exp(
        -2j * jnp.pi * (jnp.arange(r)[:, None] * jnp.arange(m)[None, :]) / n
    ).astype(jnp.complex64)


def fft_chain_matmul(x: jax.Array, n: int) -> jax.Array:
    """Digit-permuted complex FFT of length n via chained DFT matmuls.

    Returns (..., n) complex64 with bins in the chain's digit-permuted
    order; pair ONLY with `ifft_chain_matmul` (bin-wise ops in between —
    conj, multiply, reductions over leading axes — are layout-safe)."""
    pad = n - x.shape[-1]
    x = x.astype(jnp.complex64)
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return _fft_chain(x, n, _nat_chain(n))


def _fft_chain(x: jax.Array, n: int, chain: tuple[int, ...]) -> jax.Array:
    # X[q*r + p] = DFT_m over b { W_n^{pb} * DFT_r over a { x[a*m+b] } }
    if len(chain) == 1:
        return jnp.einsum("kt,...t->...k", _dft_mat(n), x)
    r, m = chain[0], n // chain[0]
    xg = x.reshape(*x.shape[:-1], r, m)  # t = a*m + b
    g = jnp.einsum("pa,...ab->...pb", _dft_mat(r), xg)  # DFT over the major digit
    g = g * _twiddle(r, m, n)
    g = _fft_chain(g, m, chain[1:])  # m-point transform per p (permuted order)
    return g.reshape(*x.shape[:-1], n)


def ifft_chain_matmul(y: jax.Array, n: int) -> jax.Array:
    """Exact inverse of `fft_chain_matmul` (consumes its permuted layout,
    returns natural time order)."""
    return _ifft_chain(y.astype(jnp.complex64), n, _nat_chain(n))


def _ifft_chain(y: jax.Array, n: int, chain: tuple[int, ...]) -> jax.Array:
    if len(chain) == 1:
        return jnp.einsum("tk,...k->...t", jnp.conj(_dft_mat(n)), y) / n
    r, m = chain[0], n // chain[0]
    yg = y.reshape(*y.shape[:-1], r, m)  # (p, permuted-q)
    g = _ifft_chain(yg, m, chain[1:])  # undo the m-side -> (..., p, b)
    g = g * jnp.conj(_twiddle(r, m, n))
    x = jnp.einsum("ap,...pb->...ab", jnp.conj(_dft_mat(r)), g) / r
    return x.reshape(*y.shape[:-1], n)


# ---------------------------------------------------------------------------
# split real/imag chain transforms: the conv only ever feeds REAL signals in
# and needs only the REAL part out, and XLA's complex dot lowering can
# exploit neither. Carrying (re, im) as separate f32 arrays gives
#   * 2 real matmuls (not 4) on the first forward pass (imag input is zero),
#   * Karatsuba 3-matmul complex passes elsewhere (DFT matrices are
#     constants, so the (Br+Bi) combination folds at trace time),
#   * 2 real matmuls on the final inverse pass (only Re is kept),
# i.e. ~0.65x the matmul work of the complex64 formulation.
# ---------------------------------------------------------------------------


def _dft_mat_ri(n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    a = jnp.arange(n, dtype=jnp.float32)
    ang = (-2.0 * jnp.pi / n) * (a[:, None] * a[None, :])
    return jnp.cos(ang), jnp.sin(ang)


def _twiddle_ri(r: int, m: int, n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    ang = (-2.0 * jnp.pi / n) * (
        jnp.arange(r, dtype=jnp.float32)[:, None]
        * jnp.arange(m, dtype=jnp.float32)[None, :]
    )
    return jnp.cos(ang), jnp.sin(ang)


# Karatsuba (3-matmul complex product) saves 25% matmul work but adds an
# (ar+ai) elementwise pass; measured on v5e it wins when the contraction is
# MXU-saturating (K>=256: 25.7 vs 32.8 ms/conv at n=2^16) and loses when
# the pass is bandwidth-bound at small K (K=64..128 at n=2^20).
KARATSUBA_MIN_K = 256


def _cdot(s, ar, ai, br, bi):
    """einsum(s, B, A) for complex A=(ar, ai), constant complex B=(br, bi).
    Real input (ai=None): 2 real einsums; else 3 (Karatsuba) or 4."""
    if ai is None:
        return jnp.einsum(s, br, ar), jnp.einsum(s, bi, ar)
    if br.shape[0] >= KARATSUBA_MIN_K:
        m1 = jnp.einsum(s, br, ar)
        m2 = jnp.einsum(s, bi, ai)
        m3 = jnp.einsum(s, br + bi, ar + ai)
        return m1 - m2, m3 - m1 - m2
    re = jnp.einsum(s, br, ar) - jnp.einsum(s, bi, ai)
    im = jnp.einsum(s, br, ai) + jnp.einsum(s, bi, ar)
    return re, im


def _cdot_re(s, ar, ai, br, bi):
    """Real part only of einsum(s, B, A): 2 real einsums."""
    return jnp.einsum(s, br, ar) - jnp.einsum(s, bi, ai)


# Interior spectrum storage dtype. The DFT matmuls already run with
# bf16-rounded inputs (TPU DEFAULT matmul precision; f32 accumulation), so
# storing the interior passes in bf16 mostly halves HBM traffic — the
# binding resource. Measured at n=2^16 (rows=1024, v5e): 16.6 vs 62.0 ms
# per conv (3.7x) at max-rel conv error 6.7e-3 vs 4.3e-3 against the f32
# rfft reference — one extra rounding per stored pass, on top of the input
# rounding the MXU applies anyway. Set to None for f32 storage.
MXU_SPECTRUM_DTYPE = jnp.bfloat16


def _sd(x):
    return x if MXU_SPECTRUM_DTYPE is None else x.astype(MXU_SPECTRUM_DTYPE)


def fft_chain_ri(x: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Digit-permuted FFT of a REAL signal as an (re, im) pair."""
    pad = n - x.shape[-1]
    x = _sd(x.astype(jnp.float32))
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return _fft_chain_ri(x, None, n, _nat_chain(n))


def _fft_chain_ri(ar, ai, n, chain):
    if len(chain) == 1:
        return _cdot("kt,...t->...k", ar, ai, *map(_sd, _dft_mat_ri(n)))
    r, m = chain[0], n // chain[0]
    lead = ar.shape[:-1]
    arg = ar.reshape(*lead, r, m)
    aig = None if ai is None else ai.reshape(*lead, r, m)
    gr, gi = _cdot("pa,...ab->...pb", arg, aig, *map(_sd, _dft_mat_ri(r)))
    twr, twi = map(_sd, _twiddle_ri(r, m, n))
    gr, gi = gr * twr - gi * twi, gr * twi + gi * twr
    gr, gi = _fft_chain_ri(gr, gi, m, chain[1:])
    return gr.reshape(*lead, n), gi.reshape(*lead, n)


def ifft_chain_real(yr: jax.Array, yi: jax.Array, n: int) -> jax.Array:
    """Real part of the inverse of `fft_chain_ri` (natural time order,
    f32 output)."""
    out = _ifft_chain_ri(_sd(yr), _sd(yi), n, _nat_chain(n), real_out=True)[0]
    return out.astype(jnp.float32)


def _ifft_chain_ri(yr, yi, n, chain, real_out=False):
    if len(chain) == 1:
        fre, fim = _dft_mat_ri(n)
        cr, ci = _sd(fre / n), _sd(-fim / n)  # conj(F)/n
        if real_out:
            return _cdot_re("tk,...k->...t", yr, yi, cr, ci), None
        return _cdot("tk,...k->...t", yr, yi, cr, ci)
    r, m = chain[0], n // chain[0]
    lead = yr.shape[:-1]
    gr, gi = _ifft_chain_ri(
        yr.reshape(*lead, r, m), yi.reshape(*lead, r, m), m, chain[1:]
    )
    twr, twi = map(_sd, _twiddle_ri(r, m, n))  # conj: (twr, -twi)
    gr, gi = gr * twr + gi * twi, gi * twr - gr * twi
    fre, fim = _dft_mat_ri(r)
    cr, ci = _sd(fre / r), _sd(-fim / r)
    if real_out:
        xr = _cdot_re("ap,...pb->...ab", gr, gi, cr, ci)
        return xr.reshape(*lead, n), None
    xr, xi = _cdot("ap,...pb->...ab", gr, gi, cr, ci)
    return xr.reshape(*lead, n), xi.reshape(*lead, n)


# Conv-path MXU transform pair (complex API). NAT_ORDER=True falls back to
# the natural-order recursion (kept for A/B comparison and API use).
NAT_ORDER = False


def mxu_fft(x: jax.Array, n: int) -> jax.Array:
    return fft_natural_matmul(x, n) if NAT_ORDER else fft_chain_matmul(x, n)


def mxu_ifft(y: jax.Array, n: int) -> jax.Array:
    return ifft_natural_matmul(y, n) if NAT_ORDER else ifft_chain_matmul(y, n)
