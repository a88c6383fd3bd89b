"""Device-mesh helpers.

The workload's scale axes (SURVEY.md §2c): "data" for batch parallelism
and "part" for edge-partitioned giant-graph aggregation (the reference
has neither — it is single-GPU). Tensor/pipeline/expert parallelism are
structurally N/A for a 64-hidden GNN and intentionally absent.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, part: int = 1,
              devices=None) -> Mesh:
    """Mesh over ("data", "part"). Defaults to all devices on "data"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // part
    devices = devices[: data * part]
    return Mesh(devices.reshape(data, part), ("data", "part"))
