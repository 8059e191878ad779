"""Task layer: glue between data, model, and loss/metrics.

Parity target: `/root/reference/src/tasks/tasks.py:21-388` — `BaseTask` builds
a loss from the metric registry and per-split metric collections; `LMTask`
flattens logits/targets for vocab cross-entropy (`tasks.py:162-181`);
`HG38Task` adds `last_k_ppl`/`per_token_ppl` (`tasks.py:244-329`);
`MultiClass` tracks per-class continual metrics (`tasks.py:184-241`).

Design difference from the reference: a task here is a *pure-function bundle*
(loss, device metrics, host metric names) consumed by the jitted train/eval
steps — no module state. Torchmetrics state becomes explicit sufficient
statistics returned from the step (see `tasks/metrics.py`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp

from hyena_dna_tpu.tasks import metrics as M


def _get_metric(name_or_cfg) -> tuple[str, Callable]:
    """Resolve a metric spec — either a name or {name: ..., **kwargs} — from
    the device registry (mirrors `instantiate(M.output_metric_fns, ...)`)."""
    if isinstance(name_or_cfg, str):
        name, kwargs = name_or_cfg, {}
    else:
        cfg = dict(name_or_cfg)
        name = cfg.pop("_name_")
        kwargs = cfg
    if name in M.METRIC_FNS:
        fn = M.METRIC_FNS[name]
        return name, (partial(fn, **kwargs) if kwargs else fn)
    raise KeyError(f"unknown device metric {name!r}")


class BaseTask:
    """loss/metrics bundle.

    Args:
      loss: metric name (or cfg dict) used as the training loss.
      loss_val: optional separate validation loss.
      metrics: device metric names computed every step.
      host_metrics: epoch-level host metrics (mcc/f1/auc) computed by the
        eval loop from gathered predictions.
    """

    def __init__(
        self,
        dataset=None,
        model=None,
        loss="cross_entropy",
        loss_val=None,
        metrics: Optional[Sequence] = None,
        host_metrics: Optional[Sequence[str]] = None,
        torchmetrics=None,  # accepted for config parity; ppl stats always on
    ):
        _, self.loss = _get_metric(loss)
        self.loss_name = loss if isinstance(loss, str) else loss.get("_name_")
        self.loss_val = _get_metric(loss_val)[1] if loss_val is not None else None
        self.metric_names = []
        self.metric_fns: Dict[str, Callable] = {}
        self.host_metric_names = list(host_metrics or [])
        for m in metrics or []:
            name = m if isinstance(m, str) else m.get("_name_")
            if name in M.STREAMING_HOST_METRICS:
                self.host_metric_names.append(name)
                continue
            if name in M.LOSS_METRIC_FNS:
                self.metric_fns[name] = partial(M.LOSS_METRIC_FNS[name], loss_fn=self.loss)
                self.metric_names.append(name)
                continue
            name, fn = _get_metric(m)
            self.metric_fns[name] = fn
            self.metric_names.append(name)

    # --- hooks used by the jitted step -------------------------------------
    def prepare(self, logits, y):
        """Reshape model output / targets before loss (identity here)."""
        return logits, y

    def compute_loss(self, logits, y, train: bool = True, **kw):
        logits, y = self.prepare(logits, y)
        fn = self.loss if (train or self.loss_val is None) else self.loss_val
        return fn(logits, y, **kw)

    def compute_metrics(self, logits, y, **kw) -> Dict[str, jnp.ndarray]:
        logits, y = self.prepare(logits, y)
        return {name: fn(logits, y) for name, fn in self.metric_fns.items()}

    def loss_stats(self, logits, y):
        """(Σ nll, Σ count) for exact epoch ppl; None for non-CE tasks."""
        return None


class LMTask(BaseTask):
    """Next-token LM: flatten (B, L, V) -> (B·L, V) (`tasks.py:162-181`).
    Registered `lm` in the reference (`tasks.py:382-388`)."""

    def prepare(self, logits, y):
        logits = logits.reshape(-1, logits.shape[-1])
        y = y.reshape(-1)
        return logits, y

    def loss_stats(self, logits, y):
        logits, y = self.prepare(logits, y)
        return M.cross_entropy_stats(logits, y)


class HG38Task(LMTask):
    """LMTask + genomics perplexity diagnostics (`tasks.py:244-329`):
    `last_k_ppl` and `per_token_ppl` configured with the dataset seq_len."""

    def __init__(self, *args, last_k_ppl: Optional[int] = None, per_token_ppl=None,
                 seq_len: int = 1024, **kwargs):
        super().__init__(*args, **kwargs)
        if last_k_ppl is not None:
            self.metric_fns["last_k_ppl"] = partial(
                M.last_k_ppl, seq_len=seq_len, k=last_k_ppl
            )
            self.metric_names.append("last_k_ppl")
        if per_token_ppl is not None:
            self.metric_fns["per_token_ppl"] = partial(
                M.per_token_ppl, seq_len=seq_len, ks=list(per_token_ppl)
            )
            self.metric_names.append("per_token_ppl")


class ICLTask(LMTask):
    """k-shot in-context-learning over label tokens: the batch is
    (prompt, 1-token target) — score the LM's LAST-position logits against
    the label token (`icl_genomics_dataset.py:153-177` emits exactly this
    pair). The reference ships an hg38_hyena_icl experiment wired to the
    plain LM task (`configs/experiment/hg38/hg38_hyena_icl.yaml:35`), which
    cannot consume the 1-token target (CE shape mismatch) — this task is
    the trainer-trainable completion of that config."""

    def prepare(self, logits, y):
        return logits[:, -1, :], y.reshape(-1)

    def loss_stats(self, logits, y):
        logits, y = self.prepare(logits, y)
        return M.cross_entropy_stats(logits, y)


class MulticlassTask(BaseTask):
    """Sequence-level classification (`tasks.py:184-241`). Targets arrive as
    (B,) or (B, 1); logits as (B, C)."""

    def prepare(self, logits, y):
        return logits, y.reshape(-1)


class AdaptiveLMTask(LMTask):
    """LM task over `adaptive_lm` models (`src/tasks/tasks.py:332-379`).

    The reference task owns the AdaptiveEmbedding encoder and the
    ProjectedAdaptiveLogSoftmax loss as parametered modules; here those live
    in `models.adaptive_softmax.AdaptiveLMModel` (flax params must sit in the
    model tree), which emits normalized log-probs — so the standard
    cross-entropy path is exact (log_softmax is idempotent) and this task is
    the plain LMTask under a distinct registry name. Encoder/loss hyper-args
    are accepted and ignored so reference-style task configs load unchanged
    (the model section carries them)."""

    def __init__(self, *args, div_val=None, cutoffs=None, tie_weights=None,
                 tie_projs=None, init_scale=None, bias_scale=None, dropemb=None,
                 dropsoft=None, **kwargs):
        super().__init__(*args, **kwargs)


TASK_REGISTRY: Dict[str, type] = {
    "base": BaseTask,
    "lm": LMTask,
    "hg38": HG38Task,
    "adaptive_lm": AdaptiveLMTask,
    "icl": ICLTask,
    "multiclass": MulticlassTask,
    "masked_multiclass": MulticlassTask,  # mask flows through kwargs
}
