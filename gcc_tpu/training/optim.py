"""Optimizer construction (reference train.py:659-681).

torch Adam's `weight_decay` is L2-into-gradient (not decoupled AdamW),
applied after gradient clipping — reproduced as
clip → add_decayed_weights → adam moments → lr scaling.
"""

from __future__ import annotations

from typing import Callable

import optax

from gcc_tpu.config import OptimConfig


def build_optimizer(
    cfg: OptimConfig,
    lr_schedule: Callable,
    clip_mode: str = "norm",
) -> optax.GradientTransformation:
    """clip_mode: "norm" (pretrain, clip_grad_norm 1.0 at train.py:409) or
    "value" (finetune, clip_grad_value_ 1 at train.py:227-228)."""
    parts = []
    if clip_mode == "norm" and cfg.clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_norm))
    elif clip_mode == "value":
        parts.append(optax.clip(1.0))
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.optimizer == "adam":
        parts.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2))
    elif cfg.optimizer == "sgd":
        if cfg.momentum:
            parts.append(optax.trace(decay=cfg.momentum))
    elif cfg.optimizer == "adagrad":
        parts.append(optax.scale_by_rss())
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer}")
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    # Flatten the whole chain onto ONE concatenated vector: per-leaf
    # transforms emit ~2 tiny HLOs per leaf per step (the device trace
    # showed global-norm clip + Adam + EMA as ~137 us/step of ~275
    # per-leaf ops — dwarfing the encoder itself, docs/PERF.md); on the
    # flat vector the same math is ~10 ops. Elementwise updates are
    # bit-identical; the global-norm reduction changes only fp summation
    # order. Checkpointed opt_state stores the flat moments.
    return optax.flatten(optax.chain(*parts))
