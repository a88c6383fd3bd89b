from gcc_tpu.training.pretrain import (
    PretrainState,
    create_pretrain_state,
    make_train_step,
)
from gcc_tpu.training.schedules import make_lr_schedule, warmup_linear

__all__ = [
    "PretrainState",
    "create_pretrain_state",
    "make_train_step",
    "make_lr_schedule",
    "warmup_linear",
]
