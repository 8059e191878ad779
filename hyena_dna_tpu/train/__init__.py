from hyena_dna_tpu.train.optim import (
    build_optimizer,
    label_params,
    SCHEDULE_REGISTRY,
)
from hyena_dna_tpu.train.state import TrainState, create_train_state

__all__ = [
    "build_optimizer",
    "label_params",
    "SCHEDULE_REGISTRY",
    "TrainState",
    "create_train_state",
]
