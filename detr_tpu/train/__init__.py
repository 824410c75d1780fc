from detr_tpu.train.schedule import make_lr_schedule
from detr_tpu.train.optimizer import build_optimizer, backbone_label_fn
from detr_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_lr_schedule",
    "build_optimizer",
    "backbone_label_fn",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
