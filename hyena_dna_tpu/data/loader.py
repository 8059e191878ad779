"""Host-side data pipeline: deterministic, fault-tolerant, mesh-aware.

Replaces torch `DataLoader` + the reference's fault-tolerant samplers
(`/root/reference/src/dataloaders/fault_tolerant_sampler.py:9-123`,
`src/dataloaders/genomics.py:166-215`) with a TPU-idiomatic design:

  * Every sample is a pure function of `(seed, epoch, index)` — the per-epoch
    permutation comes from `np.random.default_rng((seed, epoch))` and each
    item's augmentation RNG from `(seed, epoch, index)`. Resume therefore only
    needs `{epoch, batches_served}`; no RNG state blobs (the reference has to
    checkpoint and fast-forward torch generator state).
  * Multi-host: each process enumerates the same global permutation and takes
    the strided slice for its `process_index` — the DDP sampler equivalent.
  * A background thread prefetches batches so host tokenization overlaps with
    device compute; `shard_batch` turns per-host numpy batches into global
    jax.Arrays over a mesh via `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def _collate(samples):
    """Stack a list of per-sample pytrees (tuples of arrays / dicts)."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, dict):
        return {k: _collate([s[k] for s in samples]) for k in first}
    return np.stack(samples)


class DataLoader:
    """Deterministic shuffled batch iterator with O(1) resume state."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 0,  # accepted for config parity; prefetch is threaded
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.process_index = jax.process_index() if process_index is None else process_index
        self.process_count = jax.process_count() if process_count is None else process_count
        self.epoch = 0
        self.batches_served = 0  # within the current epoch
        self._resume_pending = False  # only fast-forward after load_state_dict

    # --- fault tolerance ---------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch, "batches_served": self.batches_served, "seed": self.seed}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.epoch = int(state["epoch"])
        self.batches_served = int(state["batches_served"])
        self.seed = int(state.get("seed", self.seed))
        self._resume_pending = self.batches_served > 0

    # --- iteration ---------------------------------------------------------
    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            order = np.arange(n)
        # strided split across hosts (same scheme as DistributedSampler,
        # without padding: drop the ragged tail so all hosts agree)
        if self.process_count > 1:
            per_host = n // self.process_count
            order = order[self.process_index::self.process_count][:per_host]
        return order

    def __len__(self) -> int:
        n = len(self._epoch_order())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_batch(self, order: np.ndarray, batch_idx: int):
        lo = batch_idx * self.batch_size
        idxs = order[lo : lo + self.batch_size]
        samples = []
        for i in idxs:
            rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            try:
                samples.append(self.dataset.__getitem__(int(i), rng=rng))
            except TypeError:
                samples.append(self.dataset[int(i)])
        return _collate(samples)

    def __iter__(self) -> Iterator:
        order = self._epoch_order()
        nbatches = len(self)
        # fast-forward ONLY on an explicit resume; an abandoned partial
        # iteration (e.g. a step-bounded tuning loop) restarts the epoch
        if self._resume_pending:
            start = self.batches_served
            self._resume_pending = False
        else:
            start = 0
        self.batches_served = start

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(start, nbatches):
                    if stop.is_set():
                        return
                    q.put(self._make_batch(order, b))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                self.batches_served += 1
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        # epoch finished
        self.epoch += 1
        self.batches_served = 0


def shard_batch(batch, mesh: jax.sharding.Mesh, axis: str = "data"):
    """Assemble per-host numpy arrays into global jax.Arrays sharded along the
    batch dim of the given mesh axis (replicated over the other axes)."""
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
