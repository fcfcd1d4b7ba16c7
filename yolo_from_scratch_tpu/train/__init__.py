from yolo_from_scratch_tpu.train.schedule import get_lr_lambda, lr_at_epoch
from yolo_from_scratch_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    set_learning_rate,
)

__all__ = [
    "get_lr_lambda",
    "lr_at_epoch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "set_learning_rate",
]
