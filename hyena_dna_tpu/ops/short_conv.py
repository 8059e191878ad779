"""Short depthwise causal convolution.

The Hyena operator applies a tiny (k=3 by default) depthwise Conv1d over the
projected channels before the long convolution
(`/root/reference/src/models/sequence/hyena.py:363-369,394`). The torch layer
uses `padding=k-1` and then truncates the output to the input length, i.e. a
causal convolution where output[t] depends on input[t-k+1..t].

TPU-first design: for k this small, a general conv is wasteful. We express the
op as k shifted elementwise multiply-adds, which XLA fuses into a single
VPU-bound pass over the data (one read of x, one write of y). This is the
speed-of-light formulation for an HBM-bandwidth-bound op; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def short_conv_1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Depthwise causal conv along the last axis.

    Args:
      x: (..., C, L) input.
      w: (C, K) depthwise taps; w[:, -1] multiplies x[t] (torch Conv1d layout:
         weight[c, 0, j] multiplies x[t - (K-1) + j] for causal padding K-1).
      b: optional (C,) bias.

    Returns:
      (..., C, L): y[..., c, t] = sum_j w[c, j] * x[..., c, t - (K-1) + j] + b[c].
    """
    k = w.shape[-1]
    l = x.shape[-1]
    acc = None
    for j in range(k):
        shift = (k - 1) - j  # how far back in time tap j reaches
        if shift == 0:
            term = x * w[..., j][:, None]
        else:
            pad_widths = [(0, 0)] * (x.ndim - 1) + [(shift, 0)]
            shifted = jnp.pad(x, pad_widths)[..., :l]
            term = shifted * w[..., j][:, None]
        acc = term if acc is None else acc + term
    if b is not None:
        acc = acc + b[:, None]
    return acc


def short_conv_1d_with_halo(
    x: jax.Array, w: jax.Array, b: jax.Array | None, halo: jax.Array
) -> jax.Array:
    """Variant used by sequence-sharded execution: `halo` supplies the K-1
    elements of signal immediately preceding this shard (from the left
    neighbor, via ppermute), instead of zero padding.

    x: (..., C, L_local); halo: (..., C, K-1).
    """
    k = w.shape[-1]
    ext = jnp.concatenate([halo, x], axis=-1)
    l = x.shape[-1]
    acc = None
    for j in range(k):
        # tap j multiplies ext[..., t + j] for output t (ext index offset k-1)
        term = jax.lax.dynamic_slice_in_dim(ext, j, l, axis=-1) * w[..., j][:, None]
        acc = term if acc is None else acc + term
    if b is not None:
        acc = acc + b[:, None]
    return acc
