from mofanerf_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    train_step,
    lr_at,
)

from mofanerf_tpu.train.distill import DistillConfig, StudentState, distill

__all__ = [
    "TrainState", "create_train_state", "make_optimizer", "train_step",
    "lr_at", "DistillConfig", "StudentState", "distill",
]
