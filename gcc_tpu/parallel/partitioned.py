"""Edge-partitioned aggregation over a device mesh — the framework's
context-parallel analog (SURVEY.md §2c: "partition subgraph edges across
chips, partial segment-sums combined by collectives").

For graphs too large for one chip's padded-dense path (the pretraining
corpus graphs themselves, whole-graph encodings of huge graphs), the
node feature matrix is sharded over the "part" mesh axis and every
device owns a static-shape slice of the edge list. One aggregation step:

    1. all_gather the sharded node features over ICI → full (N, F)
    2. gather message sources + local segment-sum into a full-size
       partial accumulator (each device only sums its own edges)
    3. reduce_scatter the partials back onto the node sharding

XLA overlaps the all-gather with the local gather/sum where profitable;
a Pallas latency-hiding variant is the upgrade path. Edges are padded to
equal per-device counts with zero-weight self-loops, keeping every shard
shape static.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PartitionedGraph(NamedTuple):
    """Static-shape edge partition of one giant graph.

    src/dst: (D, E_per) int32 global node ids (padded with 0→0 loops).
    weight: (D, E_per) float32, 0.0 on padding.
    num_nodes: padded node count (multiple of D).
    """

    src: np.ndarray
    dst: np.ndarray
    weight: np.ndarray
    num_nodes: int


def partition_edges(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                    num_devices: int) -> PartitionedGraph:
    """Round-robin edges into `num_devices` equal static shards.

    Round-robin keeps shards load-balanced regardless of graph ordering
    (the reference's greedy per-worker graph partition,
    graph_dataset.py:63-76, balances whole graphs; here we balance edges
    of a single giant graph)."""
    e = len(src)
    per = -(-e // num_devices)
    n_pad = -(-num_nodes // num_devices) * num_devices
    s = np.zeros((num_devices, per), np.int32)
    d = np.zeros((num_devices, per), np.int32)
    w = np.zeros((num_devices, per), np.float32)
    for dev in range(num_devices):
        sl = slice(dev, e, num_devices)
        cnt = len(range(dev, e, num_devices))
        s[dev, :cnt] = src[sl]
        d[dev, :cnt] = dst[sl]
        w[dev, :cnt] = 1.0
    return PartitionedGraph(src=s, dst=d, weight=w, num_nodes=n_pad)


def partitioned_aggregate(pg: PartitionedGraph, h: jax.Array, mesh: Mesh,
                          axis: str = "part") -> jax.Array:
    """out[v] = Σ_{(u→v)} w · h[u] with h sharded over `axis` on dim 0.

    h: (num_nodes, F) — returns the same sharding."""

    def local(src, dst, w, h_shard):
        hg = jax.lax.all_gather(h_shard, axis, tiled=True)   # (N, F)
        msgs = hg[src[0]] * w[0][:, None]                    # (E_per, F)
        partial = jax.ops.segment_sum(msgs, dst[0], num_segments=pg.num_nodes)
        # Sum partials across devices and scatter rows back to shards.
        return jax.lax.psum_scatter(partial, axis, scatter_dimension=0,
                                    tiled=True)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(jnp.asarray(pg.src), jnp.asarray(pg.dst), jnp.asarray(pg.weight), h)


def giant_graph_embedding_oracle(pg: PartitionedGraph,
                                 h: np.ndarray) -> np.ndarray:
    """Single-host numpy oracle for tests."""
    out = np.zeros_like(h)
    for dev in range(pg.src.shape[0]):
        np.add.at(out, pg.dst[dev],
                  h[pg.src[dev]] * pg.weight[dev][:, None])
    return out
