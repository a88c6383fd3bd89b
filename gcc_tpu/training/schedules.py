"""LR schedules (reference gcc/utils/misc.py:5-20)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_linear(progress, warmup: float = 0.1):
    """Triangular schedule: linear 0→1 over the first `warmup` fraction of
    training, then linear 1→0 (reference warmup_linear, used at
    train.py:412-414 with warmup=0.1)."""
    progress = jnp.asarray(progress, jnp.float32)
    up = progress / warmup
    down = jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0)
    return jnp.where(progress < warmup, up, down)


def make_lr_schedule(base_lr: float, total_steps: int, warmup: float = 0.1):
    def schedule(step):
        return base_lr * warmup_linear(step / total_steps, warmup)

    return schedule
