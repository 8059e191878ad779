"""Multi-host initialization and mesh-aware launch helpers.

Parity target: `/root/reference/src/utils/distributed.py:21-144` (NCCL/gloo
process-group init, env-var rendezvous, barrier/allreduce helpers) and PL's
one-process-per-GPU launch. The TPU-native story (SURVEY §5.8):

  * one process per HOST, `jax.distributed.initialize()` handles rendezvous
    from TPU metadata (or explicit coordinator env vars);
  * all cross-device communication is expressed by shardings; there is no
    backend object to manage — the helpers here only cover process-level
    concerns (init, host barrier via a tiny psum, rank-zero predicates).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops for single-process runs.

    On TPU pods the arguments are discovered from the environment; set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or pass
    explicitly) for CPU/GPU multi-process simulation."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # single host or TPU auto-discovery
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host barrier: a tiny fully-replicated psum forces every process
    to dispatch and complete one collective (the `torch.distributed.barrier`
    equivalent, `distributed.py:49-60`)."""
    if jax.process_count() == 1:
        return
    x = jax.numpy.ones(())
    out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
        np.ones((jax.local_device_count(),))
    )
    jax.block_until_ready(out)


def all_reduce_scalar(value: float, op: str = "sum") -> float:
    """Sum/mean a host-local python scalar across processes (the
    `distributed.py:63-144` allreduce helpers)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, np.float64))
    return float(arr.sum() if op == "sum" else arr.mean())
