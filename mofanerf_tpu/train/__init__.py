from mofanerf_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    train_step,
    lr_at,
)

from mofanerf_tpu.train.distill import (
    DistillConfig,
    StudentState,
    avatar_code,
    distill,
    distill_avatars,
    distill_conditioned,
    distill_expressions,
    load_student,
    save_student,
    student_code,
)

__all__ = [
    "TrainState", "create_train_state", "make_optimizer", "train_step",
    "lr_at", "DistillConfig", "StudentState", "distill",
    "distill_conditioned", "distill_expressions", "distill_avatars",
    "student_code", "avatar_code", "save_student", "load_student",
]
