"""Sequence-sharded (SP) kernels: distributed FFT long conv + halo short conv.

This is the capability the reference does NOT have (SURVEY §5.7: 1M-token
training there is single-GPU-per-replica with activation checkpointing;
flash-attn SP only shards norms/MLP). Here, activations are sharded along
the sequence axis of the mesh and the two convolutions become:

  * **Long FFT conv — channel-pencil decomposition.** A length-L FFT cannot
    run on an L-shard, but a multichannel conv factorizes perfectly over
    channels: `all_to_all` re-shards (B, C, L/S) -> (B, C/S, L), each device
    runs the EXACT single-device fftconv (bit-identical math => parity with
    the reference for free) on its channel pencil, and a second `all_to_all`
    restores L-sharding. Two all-to-alls of the real activation per conv —
    strictly less traffic than a transpose-FFT (whose two spectrum
    all-to-alls move complex data), and the FFT FLOPs divide by S.
    Collectives ride the mesh's "seq" axis = ICI neighbors.
  * **Short depthwise conv (k=3) — halo exchange.** Each shard needs the
    k-1 trailing elements of its left neighbor: one `ppermute`;
    the first shard's halo stays zero == the causal zero-pad.

Both are `shard_map`ped over the full mesh, so they compose with GSPMD
auto-sharding around them (projections, gating, norms) and with the custom
VJP of `fftconv` (the transpose of all_to_all is all_to_all).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hyena_dna_tpu.ops.fftconv import fftconv, fftconv_chunked
from hyena_dna_tpu.ops.short_conv import short_conv_1d_with_halo


def seq_fftconv(
    u: jax.Array,
    k: jax.Array,
    D: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: Optional[str] = "data",
) -> jax.Array:
    """Causal FFT conv with u (B, C, L) sharded (data, None, seq).

    k: (C, L) filter, replicated. D: (C,) skip, replicated.
    C must be divisible by the seq-axis size.
    """
    s = mesh.shape[seq_axis]
    if s == 1:
        return fftconv(u, k, D, False)
    assert u.ndim == 3, "seq_fftconv expects (B, C, L)"
    c = u.shape[1]
    assert c % s == 0, f"channels {c} not divisible by seq shards {s}"

    # drop the data axis from the spec when the batch doesn't divide it
    # (e.g. the batch-1 tracer used at parameter init)
    if data_axis is not None and u.shape[0] % mesh.shape[data_axis] != 0:
        data_axis = None
    uspec = P(data_axis, None, seq_axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(uspec, P(), P()),
        out_specs=uspec,
        check_vma=False,
    )
    def inner(u_loc, k_full, D_full):
        # (B_loc, C, L/S) -> (B_loc, C/S, L): split channels, gather length
        u_cs = lax.all_to_all(u_loc, seq_axis, split_axis=1, concat_axis=2, tiled=True)
        idx = lax.axis_index(seq_axis)
        c_blk = c // s
        k_blk = lax.dynamic_slice_in_dim(k_full, idx * c_blk, c_blk, axis=0)
        D_blk = lax.dynamic_slice_in_dim(D_full, idx * c_blk, c_blk, axis=0)
        y = fftconv_chunked(u_cs, k_blk, D_blk, False)
        # (B_loc, C/S, L) -> (B_loc, C, L/S)
        return lax.all_to_all(y, seq_axis, split_axis=2, concat_axis=1, tiled=True)

    return inner(u, k, D)


def seq_short_conv(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: Optional[str] = "data",
) -> jax.Array:
    """Depthwise causal conv with x (B, C, L) sharded (data, None, seq):
    ppermute the k-1 trailing columns rightward as the halo."""
    s = mesh.shape[seq_axis]
    if s == 1:
        from hyena_dna_tpu.ops.short_conv import short_conv_1d

        return short_conv_1d(x, w, b)
    khalo = w.shape[-1] - 1
    if data_axis is not None and x.shape[0] % mesh.shape[data_axis] != 0:
        data_axis = None
    xspec = P(data_axis, None, seq_axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(xspec, P(), P()),
        out_specs=xspec,
        check_vma=False,
    )
    def inner(x_loc, w_full, b_full):
        tail = x_loc[..., -khalo:]
        # send shard i's tail to shard i+1; shard 0 receives zeros (= causal pad)
        halo = lax.ppermute(tail, seq_axis, perm=[(i, i + 1) for i in range(s - 1)])
        return short_conv_1d_with_halo(x_loc, w_full, b_full, halo)

    return inner(x, w, b if b is not None else jnp.zeros(x.shape[1], x.dtype))
