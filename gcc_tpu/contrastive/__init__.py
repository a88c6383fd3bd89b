from gcc_tpu.contrastive.moco import MoCoQueue, init_queue, moco_logits, enqueue
from gcc_tpu.contrastive.losses import (
    e2e_logits,
    legacy_nce_probs,
    nce_softmax_loss,
)

__all__ = [
    "MoCoQueue",
    "init_queue",
    "moco_logits",
    "enqueue",
    "nce_softmax_loss",
    "e2e_logits",
    "legacy_nce_probs",
]
