from detr_tpu.train.schedule import make_epoch_lr_schedule, make_lr_schedule
from detr_tpu.train.optimizer import (
    backbone_label_fn,
    build_optimizer,
    get_learning_rates,
    set_learning_rates,
)
from detr_tpu.train.train_step import (
    TrainState,
    create_train_state,
    create_train_state_abstract,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_lr_schedule",
    "make_epoch_lr_schedule",
    "build_optimizer",
    "backbone_label_fn",
    "set_learning_rates",
    "get_learning_rates",
    "TrainState",
    "create_train_state",
    "create_train_state_abstract",
    "make_train_step",
    "make_eval_step",
]
