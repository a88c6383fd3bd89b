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
    batch: PaddedSubgraphBatch, pos_size: int, pe_method: str = "eigh",
    profile: str = "train",
) -> BatchFeatures:
    """profile selects the subspace-PE guard default ("train" → 0,
    "eval" → 16 — positional._pe_guards); eigh ignores it."""
    adj = build_dense_adjacency(batch)
    pos = laplacian_positional_embedding(batch, pos_size, adj=adj,
                                         method=pe_method, profile=profile)
    deg = node_degrees(batch, adj).astype(jnp.int32)
    return BatchFeatures(
        pos=pos,
        degrees=deg,
        seed_flag=batch.seed_flag,
        node_mask=batch.node_mask,
        adj=adj,
    )


class _MaskBatch(NamedTuple):
    """Node-mask view consumed by the PE solver (it never touches edges —
    the adjacency is always passed in explicitly on this path)."""

    node_mask: jax.Array
    n_nodes: jax.Array


def _fused_featurize_mode() -> str:
    """One-pass Pallas featurize builder (ops/featurize_pallas.py —
    docs/PERF.md lever 7b): GCC_TPU_FUSED_FEATURIZE "1" (compiled, on
    TPU backends), "interpret", or "0" (default: the XLA scatter
    chain)."""
    import os

    import jax as _jax

    flag = os.environ.get("GCC_TPU_FUSED_FEATURIZE", "0")
    if flag == "interpret":
        return "interpret"
    if flag == "1" and _jax.default_backend() == "tpu":
        return "compiled"
    return ""


def featurize_compact(
    edges: jax.Array, meta: jax.Array, n_max: int, id_bits: int,
    pos_size: int, pe_method: str = "eigh", e_cap: int | None = None,
    profile: str = "train", allow_fused: bool = True,
) -> BatchFeatures:
    """Featurize stacked compact wire segments without padded expansion.

    Same outputs as expanding each segment with
    :func:`gcc_tpu.graph.batch.expand_compact` and calling
    :func:`featurize_batch` on the concatenation (equivalence pinned in
    tests/test_ops_features.py), but the adjacency comes straight from
    the packed edge buffer via one scatter-add — skipping the padded
    (B, E_max) edge materialization and the one-hot contraction whose
    slots are ~94% padding at the canonical config (docs/PERF.md).

    Args:
      edges: (S, E_tot) packed edges (S wire segments of B graphs each).
      meta:  (S, 3, B) int32 — rows n_nodes, n_edges, seed_pos.
    Returns: BatchFeatures with (S*B, ...) leaves.
    """
    from gcc_tpu.ops.aggregate import build_dense_adjacency_compact

    s, _, b = meta.shape
    n_nodes = meta[:, 0, :].reshape(s * b)
    seed_pos = meta[:, 2, :].reshape(s * b)
    iota = jnp.arange(n_max, dtype=jnp.int32)[None, :]
    node_mask = (iota < n_nodes[:, None]).astype(jnp.float32)
    seed_flag = (iota == seed_pos[:, None]).astype(jnp.float32) * node_mask
    mb = _MaskBatch(node_mask=node_mask, n_nodes=n_nodes)
    fused = _fused_featurize_mode()
    if (fused and allow_fused and pe_method == "subspace" and n_max <= 128
            and id_bits == 8 and e_cap is not None):
        # One-pass kernel: adjacency + shifted PE operator + degrees,
        # each written once (replaces the serial scatter + the
        # normalize/shift HBM passes — ops/featurize_pallas.py).
        from gcc_tpu.ops.featurize_pallas import fused_adjacency_featurize

        adj, m_shift, deg_f = fused_adjacency_featurize(
            edges, meta, node_mask, n_max, e_cap,
            interpret=(fused == "interpret"))
        pos = laplacian_positional_embedding(mb, pos_size, adj=adj,
                                             method=pe_method,
                                             m_shift=m_shift,
                                             profile=profile)
        deg = deg_f.astype(jnp.int32)
    else:
        adj = build_dense_adjacency_compact(edges, meta[:, 1, :], n_max,
                                            id_bits)
        pos = laplacian_positional_embedding(mb, pos_size, adj=adj,
                                             method=pe_method,
                                             profile=profile)
        deg = adj.sum(axis=2).astype(jnp.int32)
    return BatchFeatures(
        pos=pos,
        degrees=deg,
        seed_flag=seed_flag,
        node_mask=node_mask,
        adj=adj,
    )
