from mofanerf_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    train_step,
    lr_at,
)

__all__ = ["TrainState", "create_train_state", "make_optimizer", "train_step", "lr_at"]
