from hyena_dna_tpu.tasks.metrics import (
    METRIC_FNS,
    HOST_METRIC_FNS,
    cross_entropy,
    accuracy,
)
from hyena_dna_tpu.tasks.tasks import BaseTask, LMTask, HG38Task, MulticlassTask, TASK_REGISTRY

__all__ = [
    "METRIC_FNS",
    "HOST_METRIC_FNS",
    "cross_entropy",
    "accuracy",
    "BaseTask",
    "LMTask",
    "HG38Task",
    "MulticlassTask",
    "TASK_REGISTRY",
]
