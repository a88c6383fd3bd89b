"""On-device batch featurization.

Derives everything the reference stores as DGL ``ndata`` — Laplacian PE,
subgraph in-degree, seed flag (reference graph_encoder.py:152-165) — from
the raw padded edge list in one jitted function, sharing the dense
adjacency between the PE and the encoder's aggregation layers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gcc_tpu.graph.batch import PaddedSubgraphBatch
from gcc_tpu.ops.aggregate import build_dense_adjacency, node_degrees
from gcc_tpu.features.positional import laplacian_positional_embedding


class BatchFeatures(NamedTuple):
    """Device-side derived features for one padded batch."""

    pos: jax.Array       # (B, N, pos_size) float32 Laplacian PE
    degrees: jax.Array   # (B, N) int32 in-degree (multiplicity counted)
    seed_flag: jax.Array  # (B, N) float32
    node_mask: jax.Array  # (B, N) float32
    adj: jax.Array       # (B, N, N) float32 weighted adjacency (reused by
    #                       the dense aggregation path)


def featurize_batch(
    batch: PaddedSubgraphBatch, pos_size: int, pe_method: str = "eigh"
) -> BatchFeatures:
    adj = build_dense_adjacency(batch)
    pos = laplacian_positional_embedding(batch, pos_size, adj=adj,
                                         method=pe_method)
    deg = node_degrees(batch, adj).astype(jnp.int32)
    return BatchFeatures(
        pos=pos,
        degrees=deg,
        seed_flag=batch.seed_flag,
        node_mask=batch.node_mask,
        adj=adj,
    )
