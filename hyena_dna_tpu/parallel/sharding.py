"""Device mesh construction and GSPMD sharding rules.

The reference threads NCCL process groups through flash-attn layers for
TP/SP (`/root/reference/src/models/sequence/long_conv_lm.py:48-136,283-295`)
and uses Lightning DDP for data parallelism (`train.py:611-620`). The TPU
design replaces all of that with ONE mechanism: a `jax.sharding.Mesh` with
named axes and `NamedSharding`/PartitionSpecs on parameters and batches —
XLA's GSPMD partitioner inserts the all-gathers/reduce-scatters/psums that
flash-attn's ParallelMHA/ParallelMLP/ColumnParallelLinear do by hand.

Mesh axes:
  * "data"  — batch sharding (DDP equivalent; gradient psum inserted by XLA)
  * "seq"   — sequence (length) sharding for long-context training: the SP
    axis. Activations are (B, L, D) sharded (data, seq, model-or-none).
  * "model" — tensor parallelism for wide projections (TP equivalent of
    ColumnParallelLinear / ParallelMLP).

Parameter rules map flax param paths to PartitionSpecs, the analog of the
reference's `shard_state_dict_tp` checkpoint resharding
(`long_conv_lm.py:630-690`) — but applied at runtime by GSPMD, so a
checkpoint written under one mesh loads under any other.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    seq: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "seq", "model") mesh. data=-1 absorbs the remaining
    devices. Axis order puts "model" innermost so TP collectives ride the
    fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (seq * model) == 0, f"{n} devices not divisible by seq*model"
        data = n // (seq * model)
    want = data * seq * model
    assert want <= n, f"mesh {data}x{seq}x{model} needs {want} devices, have {n}"
    arr = np.array(devices[:want]).reshape(data, seq, model)
    return Mesh(arr, axis_names=("data", "seq", "model"))


# path-regex -> PartitionSpec. Matched against "/".join(path) of each param.
# Specs follow flax Dense kernels being (in, out) and embeddings (vocab, d).
PARAM_RULES: list[tuple[str, P]] = [
    # embeddings: shard vocab over model (ParallelGPT2Embeddings equivalent)
    (r"word_embeddings/embedding$", P("model", None)),
    (r"position_embeddings/embedding$", P(None, None)),
    # Hyena projections: in_proj column-parallel, out_proj row-parallel
    (r"in_proj/kernel$", P(None, "model")),
    (r"in_proj/bias$", P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"out_proj/bias$", P(None)),
    # depthwise short conv: channels over model
    (r"short_filter_weight$", P("model", None)),
    (r"short_filter_bias$", P("model")),
    # MLP: fc1 column-parallel, fc2 row-parallel (ParallelFusedMLP layout)
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc1/bias$", P("model")),
    (r"mlp/fc2/kernel$", P("model", None)),
    (r"mlp/fc2/bias$", P(None)),
    # attention mixers
    (r"Wqkv/kernel$", P(None, "model")),
    (r"Wqkv/bias$", P("model")),
    # filter MLP is tiny: replicate
]


def param_sharding_rules(path: tuple[str, ...]) -> P:
    joined = "/".join(path)
    for pattern, spec in PARAM_RULES:
        if re.search(pattern, joined):
            return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """device_put every param according to the rules (replicated over data/seq)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, value in flat.items():
        spec = param_sharding_rules(path)
        # drop specs that don't divide the dim evenly (tiny params)
        ok = all(
            s is None
            or (value.ndim > i and value.shape[i] % mesh.shape[s] == 0 and value.shape[i] >= mesh.shape[s])
            for i, s in enumerate(spec)
        )
        sharding = NamedSharding(mesh, spec if ok else P())
        out[path] = jax.device_put(value, sharding)
    return traverse_util.unflatten_dict(out)


def commit_state_to_mesh(state, mesh: Mesh):
    """Ensure every TrainState leaf is committed to the mesh's devices.

    Param-shaped optimizer moments created by `tx.init(sharded_params)`
    already inherit the param shardings (zeros_like preserves sharding);
    what's left are scalars (step, Adam counts) that would otherwise sit
    uncommitted on the default device — after a checkpoint restore those
    come back committed to ONE device and jit rejects the mixed device set.
    """
    mesh_devices = set(mesh.devices.flat)
    replicated = NamedSharding(mesh, P())

    def put(leaf):
        if not isinstance(leaf, jax.Array):
            return leaf
        if set(leaf.sharding.device_set) == mesh_devices:
            return leaf
        return jax.device_put(leaf, replicated)

    return jax.tree_util.tree_map(put, state)


def batch_spec(seq_sharded: bool = False) -> P:
    """(B, L) int token batches: batch over data, optionally length over seq."""
    return P("data", "seq" if seq_sharded else None)
