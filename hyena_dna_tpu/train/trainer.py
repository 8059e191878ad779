"""Trainer: config-driven orchestration of data, model, task, and steps.

Parity target: `SequenceLightningModule` + `create_trainer` + `train`
(`/root/reference/train.py:124-694`) without Lightning:

  * builds datamodule -> model -> task from `_name_` registries with
    attribute auto-wiring (vocab_size/d_output/l_output from the dataset,
    as the reference's encoder/decoder auto-wiring does,
    `src/tasks/encoders.py:295-358`, `decoders.py:293-341`);
  * classification runs DNAEmbeddingModel + SequenceDecoder head — assembled
    here as one flax module (the reference assembles encoder/model/decoder
    in `BaseTask.forward`, `src/tasks/tasks.py:163-181`);
  * epoch loop with jitted train/eval steps, per-epoch validation/test,
    callbacks, checkpoint best/last, exact epoch perplexity from
    sufficient stats, host metrics (mcc/f1/auc) from gathered logits;
  * fine-tuning: `train.pretrained_model_path` + `load_backbone` hook
    (`train.py:656-662`).

Logging goes to stdout + `<run_dir>/metrics.jsonl` (the reference uses
wandb, `train.py:72-121`; a wandb sink can be layered on the same stream).
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from hyena_dna_tpu.data.datamodules import DATASET_REGISTRY
from hyena_dna_tpu.data.loader import shard_batch
from hyena_dna_tpu.parallel.sharding import NamedSharding, P
from hyena_dna_tpu.models.heads import (NDDecoder, PackedDecoder,
                                        RetrievalDecoder, SequenceDecoder,
                                        StateDecoder, TokenDecoder)
from hyena_dna_tpu.parallel import commit_state_to_mesh, make_mesh, shard_params
from hyena_dna_tpu.tasks import TASK_REGISTRY
from hyena_dna_tpu.tasks import metrics as M
from hyena_dna_tpu.train.callbacks import CALLBACK_REGISTRY
from hyena_dna_tpu.train.checkpoint import (
    load_backbone_hook,
    restore_checkpoint,
    save_checkpoint,
)
from hyena_dna_tpu.train.optim import SCHEDULE_REGISTRY, build_optimizer
from hyena_dna_tpu.train.state import create_train_state
from hyena_dna_tpu.train.step import make_eval_step, make_train_step
from hyena_dna_tpu.utils.registry import MODEL_REGISTRY


class BackboneWithDecoder(fnn.Module):
    """DNAEmbeddingModel + head, equivalent to the reference's
    model+decoder chain for classification fine-tuning."""

    backbone: fnn.Module
    decoder: fnn.Module

    def __call__(self, x, deterministic: bool = True, mask=None):
        hidden, _ = self.backbone(x, deterministic=deterministic)
        if mask is not None:
            return self.decoder(hidden, mask=mask)
        return self.decoder(hidden)


DECODER_REGISTRY = {
    "sequence": SequenceDecoder,
    "token": TokenDecoder,
    "nd": NDDecoder,
    "retrieval": RetrievalDecoder,
    "state": StateDecoder,
    "pack": PackedDecoder,
    "id": None,
}


class Trainer:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.train_cfg = dict(config.get("train", {}))
        self.trainer_cfg = dict(config.get("trainer", {}))
        seed = int(self.train_cfg.get("seed", 0))
        self.rng = jax.random.PRNGKey(seed)
        self.seed = seed

        self.run_dir = str(self.train_cfg.get("run_dir", "runs/default"))
        Path(self.run_dir).mkdir(parents=True, exist_ok=True)
        self._metrics_file = open(Path(self.run_dir) / "metrics.jsonl", "a")
        # optional wandb sink (the reference's primary logger, train.py:72-121);
        # activates only when wandb is importable and config.wandb is set
        self._wandb = None
        wandb_cfg = config.get("wandb")
        if wandb_cfg:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_cfg.get("project", "hyena_dna_tpu"),
                    config=config, **{k: v for k, v in wandb_cfg.items()
                                      if k not in ("project",)},
                )
            except Exception:
                self._wandb = None

        # ---- mesh -------------------------------------------------------
        mesh_cfg = dict(config.get("mesh", {}))
        self.mesh = make_mesh(
            data=mesh_cfg.get("data", -1),
            seq=mesh_cfg.get("seq", 1),
            model=mesh_cfg.get("model", 1),
        )

        # ---- data -------------------------------------------------------
        ds_cfg = dict(config["dataset"])
        n_data = self.mesh.shape["data"]
        accum = int(self.trainer_cfg.get("accumulate_grad_batches", 1) or 1)
        global_rows = int(ds_cfg.get("batch_size", 32)) * accum
        if global_rows % n_data != 0:
            raise ValueError(
                f"batch_size*accumulate_grad_batches={global_rows} must be divisible "
                f"by the mesh data axis ({n_data}); set mesh.data or batch_size accordingly"
            )
        ds_name = ds_cfg.pop("_name_")
        ds_cfg.setdefault("seed", seed)
        loader_cfg = dict(config.get("loader", {}))
        ds_cfg.setdefault("num_workers", loader_cfg.get("num_workers", 0))
        self.datamodule = DATASET_REGISTRY[ds_name](**ds_cfg)
        self.datamodule.setup()

        # ---- task -------------------------------------------------------
        task_cfg = dict(config.get("task", {"_name_": "lm"}))
        task_name = task_cfg.pop("_name_", "lm")
        task_cfg.pop("torchmetrics", None)
        if task_name == "hg38":
            task_cfg.setdefault("seq_len", self.datamodule.max_length)
        self.task = TASK_REGISTRY[task_name](**task_cfg)
        self.task_name = task_name

        # ---- model ------------------------------------------------------
        self.model = self._build_model(dict(config["model"]), config.get("decoder"))

        # ---- optimizer --------------------------------------------------
        opt_cfg = dict(config.get("optimizer", {}))
        opt_name = opt_cfg.pop("_name_", "adamw")
        sched_cfg = dict(config.get("scheduler", {"_name_": "constant"}))
        layer_cfg = config["model"].get("layer", {}) or {}
        self.lr = float(opt_cfg.get("lr", 6e-4))
        betas = opt_cfg.get("betas", (0.9, 0.999))
        self.tx_kwargs = dict(
            lr=self.lr,
            weight_decay=float(opt_cfg.get("weight_decay", 0.0)),
            betas=tuple(betas),
            filter_lr=layer_cfg.get("lr", 1e-3),
            filter_wd=float(layer_cfg.get("wd", 0.0)),
            lr_pos_emb=float(layer_cfg.get("lr_pos_emb", 1e-5)),
            scheduler=sched_cfg,
            gradient_clip_val=self.trainer_cfg.get("gradient_clip_val", 1.0),
            optimizer_name=opt_name,
        )
        s_cfg = dict(sched_cfg)
        s_name = s_cfg.pop("_name_", "constant")
        s_cfg.pop("t_in_epochs", None)
        self.lr_fn = SCHEDULE_REGISTRY[s_name](self.lr, **s_cfg)

        # ---- state ------------------------------------------------------
        self.epoch = 0
        self.global_step = 0
        self._train_loader = None
        self.accumulate_grad_batches = int(
            self.trainer_cfg.get("accumulate_grad_batches", 1) or 1
        )
        self.state = self._init_state()
        self.frozen_labels = None
        self._maybe_load_pretrained()

        # optional EMA of the parameters (reference `train.ema` + EMA val
        # loaders, train.py:548-553): evaluated alongside the raw params
        self.ema_decay = float(self.train_cfg.get("ema", 0) or 0)
        self.ema_params = None
        if self.ema_decay:
            self.ema_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
            decay = self.ema_decay

            @jax.jit
            def ema_update(ema, params):
                return jax.tree_util.tree_map(
                    lambda e, p: decay * e + (1.0 - decay) * p, ema, params
                )

            self._ema_update = ema_update

        # ---- steps ------------------------------------------------------
        self.train_step = make_train_step(
            self.task, accumulate_grad_batches=self.accumulate_grad_batches
        )
        self.eval_step = make_eval_step(
            self.task, return_logits=bool(self.task.host_metric_names)
        )

        # ---- callbacks --------------------------------------------------
        self.callbacks = []
        for name, cb_cfg in (config.get("callbacks") or {}).items():
            if name not in CALLBACK_REGISTRY:
                continue
            self.callbacks.append(CALLBACK_REGISTRY[name](**(cb_cfg or {})))

    # ------------------------------------------------------------------
    def _build_model(self, model_cfg: dict, decoder_cfg) -> fnn.Module:
        name = model_cfg.pop("_name_", "lm")
        dm = self.datamodule
        model_cfg.setdefault("vocab_size", getattr(dm, "vocab_size", 12))
        dtype = jnp.float32
        precision = str(self.trainer_cfg.get("precision", "32"))
        if precision in ("16", "bf16", "bfloat16"):
            dtype = jnp.bfloat16
        model_cfg.setdefault("dtype", dtype)
        if self.mesh.shape.get("seq", 1) > 1 and name in ("lm", "dna_embedding", "lm_simple"):
            # sequence parallelism: route the conv chain through the
            # shard_map channel-pencil/halo kernels (ops/distributed.py)
            model_cfg.setdefault("mesh", self.mesh)
        layer = model_cfg.get("layer")
        if isinstance(layer, dict):
            model_cfg["layer"] = dict(layer)
        if isinstance(model_cfg.get("attn_layer_idx"), list):
            model_cfg["attn_layer_idx"] = tuple(model_cfg["attn_layer_idx"])
        backbone = MODEL_REGISTRY[name](**model_cfg)

        if name == "lm" or decoder_cfg is None:
            return backbone
        dec_cfg = dict(decoder_cfg) if isinstance(decoder_cfg, dict) else {"_name_": decoder_cfg}
        dec_name = dec_cfg.pop("_name_", "sequence")
        dec_cls = DECODER_REGISTRY[dec_name]
        if dec_cls is None:
            return backbone
        # auto-wire ctor args from model/dataset attributes per decoder, the
        # reference's decoders.py:293-311 model_attrs/dataset_attrs tables
        if dec_name == "retrieval":
            dec_cfg.setdefault("d_input", model_cfg["d_model"])
            dec_cfg.setdefault("n_classes", getattr(dm, "d_output", None))
        elif dec_name != "pack":
            dec_cfg.setdefault("d_model", model_cfg["d_model"])
            dec_cfg.setdefault("d_output", getattr(dm, "d_output", None))
        if dec_name == "sequence":
            dec_cfg.setdefault("l_output", getattr(dm, "l_output", None))
        decoder = dec_cls(**dec_cfg)
        return BackboneWithDecoder(backbone=backbone, decoder=decoder)

    def _sample_batch_shape(self):
        L = self.datamodule.max_length
        if self.task_name in ("lm", "hg38"):
            L = L - 1  # next-token pair drops one position
        return (1, L)

    def _init_state(self):
        rng, init_rng = jax.random.split(self.rng)
        self.rng = rng
        sample = jnp.zeros(self._sample_batch_shape(), jnp.int32)
        params = jax.jit(self.model.init)(init_rng, sample)["params"]
        params = shard_params(params, self.mesh)
        tx, _ = build_optimizer(params, **self.tx_kwargs)
        state = create_train_state(self.model, tx, init_rng, sample, params=params)
        return commit_state_to_mesh(state, self.mesh)

    def _maybe_load_pretrained(self):
        path = self.train_cfg.get("pretrained_model_path")
        if not path:
            return
        import os

        if str(path).endswith((".ckpt", ".pt")) or os.path.exists(
            os.path.join(str(path), "weights.ckpt")
        ):
            # torch / LongSafari checkpoint: run the key-surgery importer
            from hyena_dna_tpu.utils.torch_import import import_pretrained

            f = str(path)
            if os.path.isdir(f):
                f = os.path.join(f, "weights.ckpt")
            pretrained = import_pretrained(f)
        else:
            from hyena_dna_tpu.train.checkpoint import restore_params_only

            pretrained = restore_params_only(path)
        hook_cfg = self.train_cfg.get("pretrained_model_state_hook") or {}
        if (hook_cfg.get("_name_") or "load_backbone") == "load_backbone":
            params, info = load_backbone_hook(
                self.state.params, pretrained,
                freeze_backbone=bool(hook_cfg.get("freeze_backbone", False)),
            )
            self.frozen_labels = info.get("frozen")
            self.state = self.state.replace(params=params)
            if self.frozen_labels and any(
                v == "frozen" for v in self.frozen_labels.values()
            ):
                # the optimizer was built before the hook ran: rebuild it with
                # the frozen paths mapped to zero updates, else "frozen"
                # backbone params would keep receiving full AdamW steps
                tx, _ = build_optimizer(
                    self.state.params, frozen=self.frozen_labels, **self.tx_kwargs
                )
                sample = jnp.zeros(self._sample_batch_shape(), jnp.int32)
                state = create_train_state(
                    self.model, tx, self.rng, sample, params=self.state.params
                )
                self.state = commit_state_to_mesh(state, self.mesh)
            self.log({"pretrained/loaded_tensors": info["loaded"]})

    # ------------------------------------------------------------------
    def log(self, metrics: Dict[str, Any]):
        record = {"step": int(self.global_step), "epoch": self.epoch, **metrics}
        self._metrics_file.write(json.dumps(record, default=float) + "\n")
        self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=int(self.global_step))
        if jax.process_index() == 0:
            pretty = " ".join(
                f"{k}={v:.4g}" if isinstance(v, (int, float)) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(f"[step {self.global_step}] {pretty}", flush=True)

    def _shard(self, batch):
        batch = shard_batch(batch, self.mesh)
        if self.mesh.shape.get("seq", 1) > 1:
            spec = NamedSharding(self.mesh, P("data", "seq"))

            def put(a):
                return jax.device_put(a, spec) if a.ndim == 2 else a

            batch = jax.tree_util.tree_map(put, batch)
        return batch

    def loader_state(self):
        return self._train_loader.state_dict() if self._train_loader else {}

    def reset_dataloaders(self):
        self._train_loader = None

    # ------------------------------------------------------------------
    def fit(self):
        max_epochs = int(self.trainer_cfg.get("max_epochs", 1))
        log_every = int(self.trainer_cfg.get("log_every_n_steps", 50))
        limit_train_batches = self.trainer_cfg.get("limit_train_batches")
        val_loader = self.datamodule.val_dataloader()

        ckpt = self.train_cfg.get("ckpt")
        pending_loader_state = None
        if ckpt:
            self.state, loader_state, meta = restore_checkpoint(ckpt, self.state)
            self.epoch = int(meta.get("epoch", 0))
            self.global_step = int(self.state.step)
            pending_loader_state = loader_state or None
            self.log({"resumed_from": ckpt})

        for cb in self.callbacks:
            cb.on_fit_start(self)

        # test-only mode (`train.test: true`, reference hg38_fixed_test.yaml):
        # skip the epoch loop and run the test split — used with a pretrained
        # checkpoint for fixed-window perplexity evaluation
        test_only = bool(self.train_cfg.get("test") or
                         self.train_cfg.get("test_only"))

        ppl = M.Perplexity()
        while not test_only and self.epoch < max_epochs:
            for cb in self.callbacks:
                cb.on_epoch_start(self)
            if self._train_loader is None:
                # loader batch delivers accum*micro rows; the step scans them
                self._train_loader = self.datamodule.train_dataloader()
                self._train_loader.batch_size = (
                    self.datamodule.batch_size * self.accumulate_grad_batches
                )
                val_loader = self.datamodule.val_dataloader()
                if pending_loader_state:
                    # resume the data stream (O(1) fast-forward)
                    self._train_loader.load_state_dict(pending_loader_state)
                    pending_loader_state = None
            # trainer epoch is the source of truth for the data order: a
            # step-bounded (limit_train_batches) epoch abandons iteration
            # before the loader's own end-of-epoch increment runs, and a
            # checkpoint taken then carries a stale loader epoch — without
            # this sync every such epoch would replay permutation(seed, 0)
            tl = self._train_loader
            if tl.epoch != self.epoch:
                tl.epoch = self.epoch
                tl.batches_served = 0
                tl._resume_pending = False
            ppl.reset()
            epoch_t0 = time.perf_counter()
            tokens = 0
            for i, batch in enumerate(self._train_loader):
                if limit_train_batches and i >= limit_train_batches:
                    break
                batch = self._shard(batch)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(self.state, batch, step_rng)
                if self.ema_params is not None:
                    self.ema_params = self._ema_update(self.ema_params, self.state.params)
                self.global_step += 1
                if "token_count" in metrics:
                    ppl.update(metrics["nll_sum"], metrics["token_count"])
                    tokens += int(metrics["token_count"])
                if self.global_step % log_every == 0:
                    out = {
                        "train/loss": float(metrics["loss"]),
                        "train/grad_norm": float(metrics["grad_norm"]),
                    }
                    for cb in self.callbacks:
                        cb.on_step_end(self, out)
                    dt = time.perf_counter() - epoch_t0
                    if tokens:
                        out["train/tokens_per_sec"] = tokens / dt
                    self.log(out)
                else:
                    for cb in self.callbacks:
                        cb.on_step_end(self, metrics)
            epoch_metrics = {}
            if ppl.count:
                epoch_metrics["train/ppl"] = ppl.compute()
            if val_loader is not None and len(val_loader) > 0:
                epoch_metrics.update(self.evaluate(val_loader, "val"))
                if self.ema_params is not None:
                    ema_state = self.state.replace(params=self.ema_params)
                    epoch_metrics.update(
                        self.evaluate(val_loader, "val_ema", state=ema_state)
                    )
            if epoch_metrics:
                self.log(epoch_metrics)
            for cb in self.callbacks:
                cb.on_validation_end(self, epoch_metrics)
                cb.on_epoch_end(self)
            self.epoch += 1

        test_loader = self.datamodule.test_dataloader()
        final = {}
        if test_loader is not None and len(test_loader) > 0:
            final = self.evaluate(test_loader, "test")
            self.log(final)
        return final

    # ------------------------------------------------------------------
    def evaluate(self, loader, split: str = "val", state=None) -> Dict[str, float]:
        state = state if state is not None else self.state
        sums: Dict[str, float] = {}
        weights: Dict[str, float] = {}
        nll_sum = 0.0
        token_count = 0.0
        n_batches = 0
        # Host metrics stream through per-batch sufficient statistics
        # (confusion counts + score histograms, O(C² + bins·C) memory) —
        # gathering every logit to host would be gigabytes at chromatin-
        # profile scale (919 labels × ~450k DeepSEA eval windows).
        streamer = (M.StreamingHostMetrics(self.task.host_metric_names)
                    if self.task.host_metric_names else None)
        # `trainer.limit_val_batches` (PL parity, reference train.py config
        # surface): cap eval to the first N batches — smoke runs and the
        # virtual-mesh integration scripts use it to bound CPU wallclock.
        limit = self.trainer_cfg.get("limit_val_batches")
        for batch in loader:
            if limit and n_batches >= int(limit):
                break
            bsz = len(batch[0])
            batch = self._shard(batch)
            out = self.eval_step(state, batch)
            metrics, logits = out if isinstance(out, tuple) else (out, None)
            for k, v in metrics.items():
                if k in ("nll_sum", "token_count"):
                    continue
                v = np.asarray(v)
                if v.ndim == 0:
                    sums[k] = sums.get(k, 0.0) + float(v) * bsz
                    weights[k] = weights.get(k, 0.0) + bsz
                else:  # vector metrics (per_token_ppl)
                    sums[k] = sums.get(k, 0.0) + v * bsz
                    weights[k] = weights.get(k, 0.0) + bsz
            if "nll_sum" in metrics:
                nll_sum += float(metrics["nll_sum"])
                token_count += float(metrics["token_count"])
            if streamer is not None and logits is not None:
                streamer.update(np.asarray(jax.device_get(logits), np.float32),
                                np.asarray(jax.device_get(batch[1])))
            n_batches += 1
        result = {}
        for k in sums:
            v = sums[k] / weights[k]
            if isinstance(v, np.ndarray):
                for i, vi in enumerate(v):
                    result[f"{split}/{k}_{i}"] = float(vi)
            else:
                result[f"{split}/{k}"] = float(v)
        if token_count:
            result[f"{split}/ppl"] = math.exp(nll_sum / token_count)
        if streamer is not None and n_batches:
            for name, v in streamer.compute().items():
                result[f"{split}/{name}"] = v
            # confusion matrix for small-cardinality classification (the
            # reference logs it to wandb, callbacks/wandb.py:35-277)
            cm = streamer.confusion_matrix
            if cm is not None and cm.shape[0] <= 32:
                result[f"{split}/confusion_matrix"] = cm.tolist()
        return result
