"""Giant-graph GIN encoding over a partitioned device mesh.

The dense per-subgraph path (gcc_tpu/models/gin.py) is bounded by the
RWR budget; whole-graph encodings of corpus-scale graphs (millions of
nodes) do not fit one chip's dense adjacency. This module runs the same
GIN encoder semantics over a graph whose edges are partitioned across
the "part" mesh axis and whose node features are row-sharded:
aggregation via :func:`partitioned_aggregate` (all-gather + local
segment-sum + psum-scatter on ICI), the latency-hiding ring schedule of
:func:`partitioned_aggregate_ring` (ppermute overlapped with local
segment-sums, no reduce-scatter) when given a
:class:`RingPartitionedGraph`, or — measured-preferred on chip
(docs/PERF.md "Partitioned aggregation": 2-5x over the segment path) —
the shard-local dense MXU block of :func:`partitioned_aggregate_dense`
when given a :class:`DensePartitionedGraph`; MLPs/BN applied
shard-locally, a global masked-sum readout per layer.

Parameters are the standard GraphEncoder/UnsupervisedGIN params — a
checkpoint pretrained on the subgraph path evaluates on giant graphs
without conversion (same pytree paths, verified by test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcc_tpu.models.layers import bn_eval_apply as _bn_eval
from gcc_tpu.models.layers import linear_apply as _linear
from gcc_tpu.parallel.partitioned import (
    DensePartitionedGraph,
    PartitionedGraph,
    RingPartitionedGraph,
    partitioned_aggregate,
    partitioned_aggregate_dense,
    partitioned_aggregate_ring,
)

# The affine/BN math here is the SAME functions the Flax modules apply
# (models/layers.py linear_apply / bn_eval_apply) — the giant path cannot
# drift from the subgraph encoder; params compatibility is additionally
# pinned by tests/test_parallel.py.


def giant_gin_encode(
    params: dict,
    batch_stats: dict,
    pg: PartitionedGraph,
    node_feat: jax.Array,
    node_mask: jax.Array,
    mesh,
    num_layers: int = 5,
) -> jax.Array:
    """Eval-mode GIN forward over a partitioned graph.

    params/batch_stats: the GraphEncoder variables subtree
    ``UnsupervisedGIN_0`` (plus heads). node_feat: (N, F_in) sharded over
    "part"; node_mask: (N,) 1.0 for real nodes. Returns the graph-level
    embedding (output_dim,), L2-normalized like the subgraph path.
    """
    if isinstance(pg, RingPartitionedGraph):
        aggregate = partitioned_aggregate_ring
    elif isinstance(pg, DensePartitionedGraph):
        # Shard-local dense MXU form: no reduce-scatter, and measured
        # 1.4-2.6x faster END-TO-END when density >= ~0.4% or N <= ~4k;
        # in the very-sparse giant regime (N >= 8k, deg <~ 8) the
        # segment/ring schedules win instead — the MLP/BN layers evict
        # the big adjacency between aggregations (docs/PERF.md
        # "Partitioned aggregation", diag_giant.py). The caller picks
        # the schedule by the partition type it builds.
        aggregate = partitioned_aggregate_dense
    else:
        aggregate = partitioned_aggregate
    gin_p = params["UnsupervisedGIN_0"]
    gin_s = batch_stats["UnsupervisedGIN_0"]
    h = node_feat * node_mask[:, None]
    hidden_rep = [h]
    for layer in range(num_layers - 1):
        agg = h + aggregate(pg, h, mesh)
        mlp_p = gin_p[f"GINMLP_{layer}"]
        mlp_s = gin_s[f"GINMLP_{layer}"]
        z = _linear(mlp_p["Linear_0"], agg)
        z = _bn_eval(mlp_p["MaskedBatchNorm_0"], mlp_s["MaskedBatchNorm_0"], z)
        z = jax.nn.relu(z)
        z = _linear(mlp_p["Linear_1"], z)
        z = _bn_eval(gin_p[f"MaskedBatchNorm_{2 * layer}"],
                     gin_s[f"MaskedBatchNorm_{2 * layer}"], z)
        z = jax.nn.relu(z)
        z = _bn_eval(gin_p[f"MaskedBatchNorm_{2 * layer + 1}"],
                     gin_s[f"MaskedBatchNorm_{2 * layer + 1}"], z)
        h = jax.nn.relu(z)
        hidden_rep.append(h)

    score = 0.0
    for i, rep in enumerate(hidden_rep):
        pooled = (rep * node_mask[:, None]).sum(axis=0)
        score = score + _linear(gin_p[f"Linear_{i}"], pooled)
    norm = jnp.linalg.norm(score)
    return score / jnp.maximum(norm, 1e-5)
