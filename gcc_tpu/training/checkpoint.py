"""Checkpoint save/restore via Orbax.

The reference checkpoints {opt, model, contrast(queue+ptr), optimizer,
epoch[, model_ema]} every epoch (train.py:747-786) but silently drops the
optimizer state on resume (train.py:684-694). Here the full PretrainState
— params, BN buffers, EMA copies, queue+index, optimizer state, step —
round-trips, with the TrainConfig stored as a JSON sidecar (the
reference pickles its argparse namespace inside the checkpoint; a JSON
sidecar is inspectable and framework-agnostic).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from gcc_tpu.config import TrainConfig

CONFIG_FILE = "config.json"


def save_checkpoint(path: str, state: Any, cfg: TrainConfig,
                    step: int | None = None) -> str:
    """Write state under `path/ckpt_<step>` (or `path/current`)."""
    os.makedirs(path, exist_ok=True)
    name = f"ckpt_{step}" if step is not None else "current"
    target = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(target, jax.device_get(state), force=True)
    with open(os.path.join(path, CONFIG_FILE), "w") as f:
        f.write(cfg.to_json())
    return target


def load_checkpoint(target: str, abstract_state: Any | None = None) -> Any:
    """Restore a state pytree. Pass the current state (or a matching
    abstract pytree) to restore with correct dtypes/structure."""
    ckptr = ocp.PyTreeCheckpointer()
    if abstract_state is not None:
        return ckptr.restore(os.path.abspath(target), item=abstract_state)
    return ckptr.restore(os.path.abspath(target))


def load_config(path: str) -> TrainConfig:
    with open(os.path.join(path, CONFIG_FILE)) as f:
        return TrainConfig.from_json(f.read())
