"""Neighborhood aggregation and readout ops over padded subgraph batches.

TPU-native replacements for the DGL SpMM / segment ops that back GINConv
and graph pooling in the reference (SURVEY.md §2b N6-N8; reference call
sites gcc/models/gin.py:178-231).

Two device strategies with identical semantics:

* ``aggregate_sum_segment`` — XLA scatter-add over the flat padded edge
  list. Shape-generic; the correctness oracle and fallback.
* ``aggregate_sum_dense`` — materialize the batch's weighted adjacency as
  (B, N, N) once per step and aggregate every layer with a batched
  matmul. For RWR subgraphs (N ≤ ~1k) this is the fast path on TPU: the
  MXU runs dense matmuls at speed-of-light while scatter-adds serialize
  through the VPU. The adjacency build cost is amortized over the 4 GIN
  layers (+ their backward passes, where A^T is reused).

Edges carry float weights (0.0 padding / 1.0 real, summed multiplicities
in dense form), so no masking is needed downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcc_tpu.graph.batch import PaddedSubgraphBatch


def adj_dtype():
    """Storage dtype for the dense (B, N, N) adjacency chain.

    GCC_TPU_ADJ_DTYPE=bf16 halves the HBM bytes of the largest arrays
    in the train step (the adjacency + its normalized/shifted PE
    operator — docs/PERF.md "Roofline": the step executes at 94% of its
    HBM demand, so bytes ARE the wall). Exactness: bf16 has an 8-bit
    mantissa, so integer edge multiplicities ≤ 256 are represented
    exactly and the scatter-add builder below stays exact (RWR induced
    subgraphs carry per-pair multiplicities far below that); the
    normalized Laplacian entries and aggregation activations round to
    ~0.4% relative, gated by the PE ARPACK oracle and the v2 downstream
    benchmark (docs/PERF.md "bf16 adjacency A/B"). Default f32."""
    import os

    return (jnp.bfloat16 if os.environ.get("GCC_TPU_ADJ_DTYPE") == "bf16"
            else jnp.float32)


def aggregate_sum_segment(
    h: jax.Array, batch: PaddedSubgraphBatch
) -> jax.Array:
    """Sum of in-neighbor features per node via scatter-add.

    Args:
      h: (B, N_max, F) node features.
    Returns:
      (B, N_max, F): out[v] = Σ_{(u→v) edges} w_e * h[u].
    """
    b, n, f = h.shape
    flat = h.reshape(b * n, f)
    msgs = flat[batch.edges_src] * batch.edge_weight[:, None]
    agg = jax.ops.segment_sum(msgs, batch.edges_dst, num_segments=b * n)
    return agg.reshape(b, n, f)


def build_dense_adjacency(batch: PaddedSubgraphBatch) -> jax.Array:
    """(B, N, N) weighted adjacency A[b, v, u] = Σ multiplicity of u→v.

    Built once per step as a one-hot MXU contraction: XLA scatter-add
    serializes through the VPU (~1.7 ms at the canonical bucket), while
    A = onehot(dst)ᵀ·diag(w)·onehot(src) runs as a batched bf16 matmul
    with f32 accumulation — exact for integer multiplicities (bf16
    represents 0/1 exactly; accumulation is f32). Every GIN layer (and
    its VJP) then aggregates via batched matmul on the MXU.
    """
    b, n = batch.node_mask.shape
    e = batch.edges_src.shape[0] // b
    src_local = (batch.edges_src % n).reshape(b, e)
    dst_local = (batch.edges_dst % n).reshape(b, e)
    w = batch.edge_weight.reshape(b, e)
    iota = jnp.arange(n, dtype=jnp.int32)
    # Padding edges carry w=0, so their one-hot rows vanish. int8
    # operands run the MXU at 2x the bf16 rate; exact for the 0/1
    # weights every in-repo producer emits (fractional edge weights
    # would truncate — such graphs must use the segment path).
    oh_dst = (dst_local[:, :, None] == iota).astype(jnp.int8)
    oh_src = (src_local[:, :, None] == iota).astype(jnp.int8)
    oh_src = oh_src * w[:, :, None].astype(jnp.int8)
    # Contract (src, dst) and transpose back: identical values (A =
    # (Aᵀ)ᵀ, no symmetry assumed), but XLA then lays the dot output out
    # so downstream consumers read it without the physical (B, N, N)
    # relayout copy the (dst, src) order incurred (~3% of featurize,
    # docs/PERF.md trace).
    counts_t = jax.lax.dot_general(
        oh_src, oh_dst,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    return jnp.swapaxes(counts_t, 1, 2).astype(adj_dtype())


def build_dense_adjacency_compact(
    edges: jax.Array, n_edges: jax.Array, n_max: int, id_bits: int
) -> jax.Array:
    """(S·B, N, N) adjacency directly from compact wire edges.

    The padded-batch builder above pays its cost generating (B, E_max, N)
    one-hot tiles on the VPU, and ~94% of E_max slots are padding at the
    canonical config (docs/PERF.md lever #2). The compact wire layout
    (graph/batch.py CompactWireBatch) already holds only the real edges —
    one packed integer each — so the adjacency is ONE scatter-add of
    E_tot elements (~13 ns/element on the VPU), skipping both the padded
    (B, E_max) expansion scatter and the one-hot contraction.

    Args:
      edges: (S, E_tot) packed ``src | dst << id_bits`` (uint16/int32),
        per-graph runs concatenated; stale bytes past each segment's
        edge total are masked out via the counts.
      n_edges: (S, B) int32 real edge count per graph.
      n_max: padded node count N of the target bucket.
    Returns:
      (S*B, N, N) float32 weighted adjacency A[g, dst, src].
    """
    s, e_tot = edges.shape
    b = n_edges.shape[1]
    cum = jnp.cumsum(n_edges, axis=1)  # (S, B)
    e_iota = jnp.arange(e_tot, dtype=jnp.int32)
    # Per-segment graph id via a fused comparison grid (vectorized
    # searchsorted — jnp.searchsorted lowers to a while loop on TPU,
    # graph/batch.py expand_compact).
    gid = jnp.minimum(
        jnp.sum(
            (e_iota[None, :, None] >= cum[:, None, :]).astype(jnp.int32),
            axis=2,
        ),
        b - 1,
    )  # (S, E_tot)
    live = e_iota[None, :] < cum[:, -1:]
    packed = edges.astype(jnp.int32)
    mask_bits = (1 << id_bits) - 1
    src = packed & mask_bits
    dst = (packed >> id_bits) & mask_bits
    ggid = jnp.arange(s, dtype=jnp.int32)[:, None] * b + gid
    flat = ggid * (n_max * n_max) + dst * n_max + src
    oob = s * b * n_max * n_max
    tgt = jnp.where(live, flat, oob)  # OOB -> dropped
    # Scatter directly into the storage dtype: bf16 increments are exact
    # for counts ≤ 256 (see adj_dtype), and a separate f32 build + cast
    # would pay an extra full pass over the (S·B, N, N) block.
    dt = adj_dtype()
    adj = (
        jnp.zeros(s * b * n_max * n_max, dt)
        .at[tgt.reshape(-1)]
        .add(jnp.ones((), dt), mode="drop")
    )
    return adj.reshape(s * b, n_max, n_max)


def build_dense_adjacency_scatter(batch: PaddedSubgraphBatch) -> jax.Array:
    """Scatter-add reference implementation of
    :func:`build_dense_adjacency` (correctness oracle; slower on TPU)."""
    b, n = batch.node_mask.shape
    # Flat (B*N*N) scatter: index = dst * N + (src % N) within each graph.
    src_local = batch.edges_src % n
    flat_idx = batch.edges_dst * n + src_local
    adj = jax.ops.segment_sum(
        batch.edge_weight, flat_idx, num_segments=b * n * n
    )
    return adj.reshape(b, n, n)


def aggregate_sum_dense(h: jax.Array, adj: jax.Array) -> jax.Array:
    """Batched A @ h on the MXU. adj from :func:`build_dense_adjacency`.

    With a bf16 adjacency (adj_dtype), h is fed to the dot in bf16 as
    well — the MXU multiplies in bf16 regardless, so the only change is
    the activations' storage rounding; accumulation stays f32."""
    if adj.dtype == jnp.bfloat16:
        h = h.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        adj,
        h,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def graph_pool_sum(h: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Per-graph sum readout (DGL SumPooling, reference gin.py:204-211).

    Args:
      h: (B, N_max, F); node_mask: (B, N_max).
    Returns: (B, F).
    """
    return jnp.einsum("bnf,bn->bf", h, node_mask)


def graph_pool_mean(h: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Per-graph masked mean readout (DGL AvgPooling)."""
    total = graph_pool_sum(h, node_mask)
    counts = jnp.maximum(node_mask.sum(axis=1, keepdims=True), 1.0)
    return total / counts


def graph_pool_max(h: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Per-graph masked max readout (DGL MaxPooling)."""
    neg = jnp.where(node_mask[..., None] > 0, h, -jnp.inf)
    out = neg.max(axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def node_degrees(
    batch: PaddedSubgraphBatch, adj: jax.Array | None = None
) -> jax.Array:
    """(B, N_max) in-degree within each subgraph, counting multiplicity.

    This is the reference's ``subg.in_degrees()`` used both for the
    Laplacian normalization (data_util.py:273-277) and the degree
    embedding feature (graph_encoder.py:152-165) — computed on device
    from the edge list instead of shipped from host.

    When the dense adjacency is already materialized, pass it: a row-sum
    is bandwidth-only, while the edge scatter-add serializes on the VPU.
    """
    if adj is not None:
        # f32 accumulation: bf16 partial sums would round integer
        # degrees past 256 (spacing 2 at [256, 512)); the convert fuses
        # into the reduce, so the read still moves adj-dtype bytes.
        return adj.sum(axis=2, dtype=jnp.float32)  # in-degree of v
    b, n = batch.node_mask.shape
    deg = jax.ops.segment_sum(
        batch.edge_weight, batch.edges_dst, num_segments=b * n
    )
    return deg.reshape(b, n)
