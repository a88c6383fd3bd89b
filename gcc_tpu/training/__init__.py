from gcc_tpu.training.packed import make_packed_multi_step, make_state_packer
from gcc_tpu.training.pretrain import (
    PretrainState,
    create_pretrain_state,
    make_train_multi_step,
    make_train_step,
    stack_batches,
)
from gcc_tpu.training.schedules import make_lr_schedule, warmup_linear

__all__ = [
    "PretrainState",
    "create_pretrain_state",
    "make_train_step",
    "make_train_multi_step",
    "make_packed_multi_step",
    "make_state_packer",
    "stack_batches",
    "make_lr_schedule",
    "warmup_linear",
]
