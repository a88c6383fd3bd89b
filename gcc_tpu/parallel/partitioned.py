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

Two schedules are provided:

* :func:`partitioned_aggregate` — one all_gather, local segment-sum,
  psum_scatter. Simple; XLA overlaps where profitable.
* :func:`partitioned_aggregate_ring` — the latency-hiding schedule
  (SURVEY.md §7 hard part (f)): edges live on their destination's owner,
  bucketed by source owner; feature blocks rotate around the ring with
  async `ppermute` while each hop's bucket is gathered and
  segment-summed locally. Hop t+1's transfer has no data dependence on
  hop t's compute, so the ICI permute hides behind the local work, and
  the accumulator is already the output shard — the trailing
  reduce-scatter disappears.

Edges are padded to equal per-device (or per-bucket) counts with
zero-weight 0→0 loops, keeping every shard shape static.
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
                    num_devices: int,
                    weight: np.ndarray | None = None) -> PartitionedGraph:
    """Round-robin edges into `num_devices` equal static shards.

    Round-robin keeps shards load-balanced regardless of graph ordering
    (the reference's greedy per-worker graph partition,
    graph_dataset.py:63-76, balances whole graphs; here we balance edges
    of a single giant graph). An optional per-edge `weight` (e.g. the
    D^-1/2 A D^-1/2 normalization for the giant-PE matvec,
    parallel/giant_features.py) rides along; padding stays 0."""
    e = len(src)
    per = -(-e // num_devices)
    n_pad = -(-num_nodes // num_devices) * num_devices
    win = (np.ones(e, np.float32) if weight is None
           else np.asarray(weight, np.float32))
    s = np.zeros((num_devices, per), np.int32)
    d = np.zeros((num_devices, per), np.int32)
    w = np.zeros((num_devices, per), np.float32)
    for dev in range(num_devices):
        sl = slice(dev, e, num_devices)
        cnt = len(range(dev, e, num_devices))
        s[dev, :cnt] = src[sl]
        d[dev, :cnt] = dst[sl]
        w[dev, :cnt] = win[sl]
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


def partitioned_aggregate_batched(pg: PartitionedGraph, h: jax.Array,
                                  mesh: Mesh, data_axis: str = "data",
                                  part_axis: str = "part") -> jax.Array:
    """Batched giant-graph aggregation on the COMBINED (data, part) mesh.

    out[b, v] = Σ_{(u→v)} w · h[b, u] for a batch of node-feature views
    of ONE shared partitioned graph: h is (B, N, F) with the batch dim
    sharded over ``data_axis`` and the node dim over ``part_axis``
    (SURVEY.md §7 stage 7 — the {data, partition} axes composing in one
    program). Each data-replica group aggregates its own views; the edge
    shards are replicated across data. This is the building block for
    giant-graph encoding under data parallelism (B independent feature
    views — e.g. per-seed indicator features or augmentation draws — of
    a corpus-scale graph).

    Returns (B, N, F) with the same (data, part) sharding."""

    def local(src, dst, w, h_shard):
        # h_shard: (B_loc, N/p, F) → gather full rows per view.
        hg = jax.lax.all_gather(h_shard, part_axis, axis=1, tiled=True)
        msgs = hg[:, src[0]] * w[0][None, :, None]      # (B_loc, E_per, F)
        partial = jax.vmap(
            lambda m: jax.ops.segment_sum(m, dst[0],
                                          num_segments=pg.num_nodes)
        )(msgs)
        return jax.lax.psum_scatter(partial, part_axis,
                                    scatter_dimension=1, tiled=True)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(part_axis), P(part_axis), P(part_axis),
                  P(data_axis, part_axis)),
        out_specs=P(data_axis, part_axis),
    )(jnp.asarray(pg.src), jnp.asarray(pg.dst), jnp.asarray(pg.weight), h)


def giant_graph_embedding_oracle(pg: PartitionedGraph,
                                 h: np.ndarray) -> np.ndarray:
    """Single-host numpy oracle for tests."""
    out = np.zeros_like(h)
    for dev in range(pg.src.shape[0]):
        np.add.at(out, pg.dst[dev],
                  h[pg.src[dev]] * pg.weight[dev][:, None])
    return out


class DensePartitionedGraph(NamedTuple):
    """Row-block DENSE partition of one giant graph's adjacency.

    On-chip measurement (docs/PERF.md "Partitioned aggregation") shows
    the dense MXU product beats the gather/segment-sum path at every
    point up to n=8192 (163M vs 71M edge-msgs/s at deg=32; the segment
    path is serial-VPU-bound) — so once shards carry a padded block
    adjacency, the shard-local work should be a matmul. Each device owns
    the (rows_per, N) block of adjacency rows for the output rows it
    owns; aggregation is then ONE all_gather + ONE MXU matmul and needs
    no reduce-scatter at all (a row block covers every incoming edge of
    its rows). Memory: N²/D f32 per device — the partitioned path's
    operating regime (N ≈ 8-64k) fits comfortably where the single-chip
    dense path (N² on one chip) does not.

    adj: (D, rows_per, N) float32 — adj[d, v_local, u] = Σ w(u→v).
    num_nodes: padded node count (multiple of D).
    """

    adj: np.ndarray
    num_nodes: int


def partition_dense(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                    num_devices: int,
                    weight: np.ndarray | None = None
                    ) -> DensePartitionedGraph:
    """Build the row-block dense partition (multi-edges accumulate).

    Builds the full (D, rows_per, N) block stack in host memory — at
    the giant-graph operating points (N ≈ 8-64k) that is 0.25-16 GB, so
    at the large end build on the host that owns the corpus and place
    with :func:`shard_dense_partition` BEFORE any jit (per-shard
    streaming construction is the obvious extension if host RAM ever
    binds before device HBM does)."""
    d_cnt = num_devices
    n_pad = -(-num_nodes // d_cnt) * d_cnt
    rows_per = n_pad // d_cnt
    w = (np.ones(len(src), np.float32) if weight is None
         else np.asarray(weight, np.float32))
    adj = np.zeros((d_cnt, rows_per, n_pad), np.float32)
    dst = np.asarray(dst, np.int64)
    np.add.at(adj, (dst // rows_per, dst % rows_per, np.asarray(src)), w)
    return DensePartitionedGraph(adj=adj, num_nodes=n_pad)


def shard_dense_partition(pg: DensePartitionedGraph, mesh: Mesh,
                          axis: str = "part") -> DensePartitionedGraph:
    """Place pg.adj sharded over `axis` (dim 0, one block per device).

    Call OUTSIDE jit before training/encoding at scale: a numpy adj
    closed over by a jitted caller would otherwise land on one device
    (or bake an N² constant into the program — against the repo
    convention). The aggregate below accepts either form; only the
    pre-placed one is safe past toy sizes."""
    if pg.adj.shape[0] != mesh.shape[axis]:
        raise ValueError(
            f"dense partition built for {pg.adj.shape[0]} devices but "
            f"mesh axis {axis!r} has {mesh.shape[axis]} — rebuild with "
            f"partition_dense(..., num_devices={mesh.shape[axis]})"
        )
    placed = jax.device_put(np.asarray(pg.adj),
                            NamedSharding(mesh, P(axis)))
    return pg._replace(adj=placed)


def partitioned_aggregate_dense(pg: DensePartitionedGraph, h: jax.Array,
                                mesh: Mesh, axis: str = "part"
                                ) -> jax.Array:
    """out[v] = Σ_{(u→v)} w · h[u] via the shard-local dense MXU block.

    h: (num_nodes, F) sharded over `axis` on dim 0 — returns the same
    sharding. One all_gather over ICI, one (rows_per, N) x (N, F)
    matmul; the accumulator IS the output shard (no reduce-scatter).
    At scale, pass a pg placed by :func:`shard_dense_partition`."""
    if pg.adj.shape[0] != mesh.shape[axis]:
        # The shard-local body reads adj[0]; a partition built for a
        # different device count would silently drop adjacency blocks.
        raise ValueError(
            f"dense partition has {pg.adj.shape[0]} row blocks but mesh "
            f"axis {axis!r} has {mesh.shape[axis]} devices"
        )

    def local(adj, h_shard):
        hg = jax.lax.all_gather(h_shard, axis, tiled=True)   # (N, F)
        return jax.lax.dot_general(
            adj[0], hg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )(jnp.asarray(pg.adj), h)


class RingPartitionedGraph(NamedTuple):
    """Owner-bucketed edge partition for the ring (latency-hiding) path.

    Edges live on the device that owns their *destination* row, bucketed
    by the *source* row's owner, so one aggregation needs only the ring
    rotation of feature blocks — the accumulator IS the local output
    shard and no reduce-scatter happens at all (the plain
    :class:`PartitionedGraph` path pays all_gather + psum_scatter).

    src_local:  (D, D, E_b) int32 — src id local to its owner's block;
                [d, o] holds the edges destined to shard d whose source
                lives on shard o.
    dst_local:  (D, D, E_b) int32 — dst id local to shard d.
    weight:     (D, D, E_b) float32, 0.0 on padding.
    num_nodes:  padded node count (multiple of D).
    """

    src_local: np.ndarray
    dst_local: np.ndarray
    weight: np.ndarray
    num_nodes: int


def partition_edges_ring(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                         num_devices: int,
                         weight: np.ndarray | None = None
                         ) -> RingPartitionedGraph:
    """Bucket edges by (dst owner, src owner) with contiguous row shards.

    Row o of the feature matrix belongs to device ``o // rows_per``. Each
    (d, o) bucket is zero-padded to the global max bucket size so every
    shard shape is static (padding edges are 0→0 with weight 0)."""
    d_cnt = num_devices
    n_pad = -(-num_nodes // d_cnt) * d_cnt
    rows_per = n_pad // d_cnt
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = (np.ones(len(src), np.float32) if weight is None
         else np.asarray(weight, np.float32))
    d_owner = dst // rows_per
    s_owner = src // rows_per
    buckets = [[None] * d_cnt for _ in range(d_cnt)]
    e_b = 1
    for dd in range(d_cnt):
        on_d = d_owner == dd
        for oo in range(d_cnt):
            sel = on_d & (s_owner == oo)
            buckets[dd][oo] = sel
            e_b = max(e_b, int(sel.sum()))
    sl = np.zeros((d_cnt, d_cnt, e_b), np.int32)
    dl = np.zeros((d_cnt, d_cnt, e_b), np.int32)
    wb = np.zeros((d_cnt, d_cnt, e_b), np.float32)
    for dd in range(d_cnt):
        for oo in range(d_cnt):
            sel = buckets[dd][oo]
            cnt = int(sel.sum())
            sl[dd, oo, :cnt] = (src[sel] - oo * rows_per).astype(np.int32)
            dl[dd, oo, :cnt] = (dst[sel] - dd * rows_per).astype(np.int32)
            wb[dd, oo, :cnt] = w[sel]
    return RingPartitionedGraph(src_local=sl, dst_local=dl, weight=wb,
                                num_nodes=n_pad)


def partitioned_aggregate_ring(pg: RingPartitionedGraph, h: jax.Array,
                               mesh: Mesh, axis: str = "part") -> jax.Array:
    """out[v] = Σ_{(u→v)} w · h[u], ring-overlapped.

    Feature blocks rotate around the ring with `ppermute`; at hop t every
    device gathers/segment-sums the bucket of its edges sourced from the
    block it currently holds. The permute of hop t+1's block and the
    compute on hop t's block have no data dependence, so XLA's async
    collective-permute hides the ICI transfer behind the local
    segment-sum (SURVEY.md §7 hard part (f)). D-1 permutes move the same
    bytes as the all_gather in :func:`partitioned_aggregate`, and the
    trailing psum_scatter disappears entirely.

    h: (num_nodes, F) sharded over `axis` on dim 0 — returns the same
    sharding."""
    d_cnt = pg.src_local.shape[0]
    rows_per = pg.num_nodes // d_cnt
    perm = [(i, (i + 1) % d_cnt) for i in range(d_cnt)]

    def local(srcb, dstb, wb, h_shard):
        me = jax.lax.axis_index(axis)
        srcb, dstb, wb = srcb[0], dstb[0], wb[0]  # (D, E_b)

        def consume(t, blk, acc):
            owner = jax.lax.rem(me - t + d_cnt, d_cnt)
            s = jax.lax.dynamic_index_in_dim(srcb, owner, keepdims=False)
            d = jax.lax.dynamic_index_in_dim(dstb, owner, keepdims=False)
            w = jax.lax.dynamic_index_in_dim(wb, owner, keepdims=False)
            msgs = blk[s] * w[:, None]
            return acc + jax.ops.segment_sum(msgs, d, num_segments=rows_per)

        def hop(t, carry):
            blk, acc = carry
            # The permute has no data dependence on the segment-sum, so
            # XLA's async collective-permute runs it concurrently.
            return jax.lax.ppermute(blk, axis, perm), consume(t, blk, acc)

        acc0 = jax.lax.pcast(
            jnp.zeros((rows_per, h_shard.shape[1]), h_shard.dtype),
            (axis,), to="varying",
        )
        blk, acc = jax.lax.fori_loop(0, d_cnt - 1, hop, (h_shard, acc0))
        # Final hop consumes without a trailing (dead) permute.
        return consume(d_cnt - 1, blk, acc)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(jnp.asarray(pg.src_local), jnp.asarray(pg.dst_local),
      jnp.asarray(pg.weight), h)
