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

# Bumped whenever the checkpointed state pytree structure changes (e.g.
# the optax.flatten move in training/optim.py changed opt_state from a
# per-leaf tree to flat vectors). Recorded in the config sidecar so a
# restore against an older layout fails with a readable message instead
# of an opaque orbax structure mismatch.
CKPT_FORMAT_VERSION = 3  # v3: PretrainState gained nce_z (legacy NCE Z)


def save_checkpoint(path: str, state: Any, cfg: TrainConfig,
                    step: int | None = None) -> str:
    """Write state under `path/ckpt_<step>` (or `path/current`)."""
    os.makedirs(path, exist_ok=True)
    name = f"ckpt_{step}" if step is not None else "current"
    target = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.PyTreeCheckpointer()
    # Multi-process: save() is a collective (Orbax barriers internally
    # and writes from the primary process) — EVERY process must call it
    # (training/loop.py does); only process 0 writes the sidecar.
    ckptr.save(target, jax.device_get(state), force=True)
    if jax.process_index() == 0:
        import json

        sidecar = json.loads(cfg.to_json())
        sidecar["ckpt_format_version"] = CKPT_FORMAT_VERSION
        with open(os.path.join(path, CONFIG_FILE), "w") as f:
            f.write(json.dumps(sidecar, indent=2))
    return target


def load_checkpoint(target: str, abstract_state: Any | None = None) -> Any:
    """Restore a state pytree. Pass the current state (or a matching
    abstract pytree) to restore with correct dtypes/structure.

    v2→v3 compatibility: v3 added the single scalar leaf ``nce_z``
    (legacy-NCE normalizer, default -1.0 = "uninitialized"). A v2
    checkpoint restored against a v3 abstract state gets that leaf
    filled with the default instead of being rejected — the only
    structural difference is the one well-defined scalar."""
    ckptr = ocp.PyTreeCheckpointer()
    try:
        if abstract_state is not None:
            try:
                return ckptr.restore(os.path.abspath(target),
                                     item=abstract_state)
            except (ValueError, KeyError):
                if not (isinstance(abstract_state, dict)
                        and "nce_z" in abstract_state):
                    raise
                import jax.numpy as jnp

                legacy = dict(abstract_state)
                legacy.pop("nce_z")
                restored = ckptr.restore(os.path.abspath(target), item=legacy)
                restored["nce_z"] = jnp.full((), -1.0, jnp.float32)
                return restored
        return ckptr.restore(os.path.abspath(target))
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint at {target} does not match the current state "
            f"structure (current format version {CKPT_FORMAT_VERSION}; "
            "checkpoints written before the flattened-optimizer change "
            "have a per-leaf opt_state and cannot be restored — re-run "
            "pretraining, or check ckpt_format_version in the config.json "
            f"sidecar). Underlying error: {e}"
        ) from e


def load_config(path: str) -> TrainConfig:
    with open(os.path.join(path, CONFIG_FILE)) as f:
        return TrainConfig.from_json(f.read())
