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


def make_lr_schedule(base_lr: float, total_steps: int, warmup: float = 0.1,
                     steps_per_epoch: int | None = None,
                     lr_decay_epochs: tuple[int, ...] = (),
                     lr_decay_rate: float = 0.0):
    """Triangular warmup-linear schedule, optionally combined with the
    reference's per-epoch step decay (misc.py:13-20: multiply by
    lr_decay_rate per decay boundary passed; inert when lr_decay_rate is
    0 below the first boundary, as with reference defaults)."""

    def schedule(step):
        lr = base_lr * warmup_linear(step / total_steps, warmup)
        if steps_per_epoch and lr_decay_epochs and lr_decay_rate:
            epoch = step // steps_per_epoch + 1
            boundaries = jnp.asarray(lr_decay_epochs)
            n_decays = (epoch > boundaries).sum()
            lr = lr * (lr_decay_rate ** n_decays)
        return lr

    return schedule
