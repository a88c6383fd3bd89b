from gcc_tpu.contrastive.moco import MoCoQueue, init_queue, moco_logits, enqueue
from gcc_tpu.contrastive.losses import nce_softmax_loss, e2e_logits

__all__ = [
    "MoCoQueue",
    "init_queue",
    "moco_logits",
    "enqueue",
    "nce_softmax_loss",
    "e2e_logits",
]
