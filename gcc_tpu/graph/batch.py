"""Static-shape padded subgraph batches — the core TPU design decision.

The reference batches subgraphs as a disjoint union with dynamic shapes
(``dgl.batch``, reference ``gcc/datasets/data_util.py:26-41``). Dynamic
shapes force recompilation or host-side graph objects; instead we fix a
small set of (N_max, E_max) *buckets* and pad every batch into one of
them, so XLA compiles one program per bucket and every step is a single
device launch.

Layout: the B subgraphs live in a flat node space of size ``B * N_max``
(graph ``b``'s node ``i`` at flat index ``b * N_max + i``). Edges are a
flat padded list of (src, dst) pairs into that space with a float weight
that is 1.0 for real edges and 0.0 for padding — so scatter/segment
aggregation of padding contributes exactly zero and no boolean masking is
needed in the hot loop. Everything the reference stores as DGL ``ndata``
(positional embedding, degree, seed flag) is *derived on device* from
this batch (see ``gcc_tpu/features``): the host only ships integer edge
lists, which also minimizes host→device transfer bytes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedSubgraphBatch:
    """A batch of B subgraphs padded to static (N_max, E_max).

    Attributes:
      edges_src: (B * E_max,) int32 — flat source node index per edge.
      edges_dst: (B * E_max,) int32 — flat destination node index.
      edge_weight: (B * E_max,) float32 — 1.0 real / 0.0 padding.
      node_mask: (B, N_max) float32 — 1.0 real node / 0.0 padding.
      seed_flag: (B, N_max) float32 — one-hot seed indicator (the
        reference's ``ndata["seed"]``, data_util.py:232-239).
      n_nodes: (B,) int32 — real node count per subgraph.
    """

    edges_src: jax.Array
    edges_dst: jax.Array
    edge_weight: jax.Array
    node_mask: jax.Array
    seed_flag: jax.Array
    n_nodes: jax.Array

    @property
    def batch_size(self) -> int:
        return self.node_mask.shape[0]

    @property
    def n_max(self) -> int:
        return self.node_mask.shape[1]

    @property
    def e_max(self) -> int:
        return self.edges_src.shape[0] // self.node_mask.shape[0]


# Bucket ladders. Powers of two keep the number of compiled programs small
# while bounding padding waste at <2x.
NODE_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096)
EDGE_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def pick_bucket(max_nodes: int, max_edges_per_graph: int) -> tuple[int, int]:
    """Smallest (N_max, E_max) bucket that fits the given per-graph sizes."""
    n_max = next((b for b in NODE_BUCKETS if b >= max_nodes), None)
    e_max = next((b for b in EDGE_BUCKETS if b >= max(1, max_edges_per_graph)), None)
    if n_max is None or e_max is None:
        raise ValueError(
            f"subgraph too large for bucket ladder: nodes={max_nodes}, "
            f"edges={max_edges_per_graph}"
        )
    return n_max, e_max


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WireBatch:
    """Compact host→device wire form of a padded batch.

    Ships only what the host must produce — int16 local edge endpoints
    and three small per-graph vectors — and derives everything else
    (edge weights, flat indices, node mask, seed one-hot) on device via
    :func:`expand_wire`. At the canonical config this is ~6x fewer bytes
    than shipping the expanded batch, which matters because remote-TPU
    relays are transfer-latency-bound.

    src/dst: (B, E_max) int16 local node ids (padding entries arbitrary).
    n_nodes/n_edges/seed_pos: (B,) int32.
    """

    src: jax.Array
    dst: jax.Array
    n_nodes: jax.Array
    n_edges: jax.Array
    seed_pos: jax.Array

    @property
    def batch_size(self) -> int:
        return self.src.shape[0]


@dataclasses.dataclass(frozen=True)
class CompactWireBatch:
    """Flat-edge wire form: per-graph edge runs concatenated into one
    packed (E_tot,) buffer instead of a padded (B, E_max) int16 grid.

    Why: the remote-relay tunnel rate-shapes sustained host→device
    traffic to ~10 MB/s, so under continuous training the wire BYTE rate
    is the throughput ceiling (docs/PERF.md). The mean subgraph has ~200
    edges while the no-truncation bucket needs E_max = 2048, so padded
    rows ship ~10x dead bytes; this layout bounds the batch at ``e_tot``
    edge slots (host-side truncation by ``gcc_compact_rows`` if a
    pathological batch overflows — counts stay exact) and packs both
    endpoints of an edge into ONE integer:

      edges: (E_tot,) — uint16 ``src | dst << 8`` when the bucket's
        local ids fit a byte (e_max trades 2 bytes/edge), else int32
        ``src | dst << 16``.
      meta:  (3, B) int32 — rows n_nodes, n_edges, seed_pos.

    Exactly two array leaves (dispatch pays ~0.5 ms per transferred
    leaf). ``e_max`` / ``id_bits`` are static pytree metadata; expansion
    back to the padded layout is one device-side scatter of E_tot
    elements (:func:`expand_compact`) — element-indexed ops are the
    expensive part on TPU, and E_tot ≈ E_max·B/4 keeps them few.
    """

    edges: jax.Array
    meta: jax.Array
    e_max: int = dataclasses.field(metadata=dict(static=True), default=2048)
    id_bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    # Optional size-bucket tag (0 = unrouted): the node bucket this batch
    # was routed into (pipeline.py emit="routed"). Static pytree metadata,
    # so batches of different buckets hit different jit cache entries of
    # the SAME train-step callable — no per-bucket program plumbing in
    # consumers; featurization reads it to size the padded node dim.
    n_max: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def src(self) -> jax.Array:
        return (self.edges & ((1 << self.id_bits) - 1)).astype(jnp_int32())

    @property
    def dst(self) -> jax.Array:
        return (self.edges.astype(jnp_int32()) >> self.id_bits) & (
            (1 << self.id_bits) - 1
        )

    @property
    def n_nodes(self) -> jax.Array:
        return self.meta[0]

    @property
    def n_edges(self) -> jax.Array:
        return self.meta[1]

    @property
    def seed_pos(self) -> jax.Array:
        return self.meta[2]

    @property
    def batch_size(self) -> int:
        return self.meta.shape[1]


def jnp_int32():
    import jax.numpy as jnp

    return jnp.int32


def pack_edge_ids(src, dst, n_max: int):
    """Host-side packing of compact local edge ids into one integer per
    edge: uint16 (8+8 bits) when n_max <= 256, else int32 (16+16)."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    if n_max <= 256:
        return (src.astype(np.uint16) & 0xFF) | (
            (dst.astype(np.uint16) & 0xFF) << 8
        ), 8
    return (src.astype(np.int32) & 0xFFFF) | (
        (dst.astype(np.int32) & 0xFFFF) << 16
    ), 16


jax.tree_util.register_dataclass(
    CompactWireBatch,
    data_fields=["edges", "meta"],
    meta_fields=["e_max", "id_bits", "n_max"],
)


def _padded_from_locals(src_local, dst_local, valid, n_nodes, seed_pos,
                        n_max: int) -> PaddedSubgraphBatch:
    """Assemble a PaddedSubgraphBatch from (B, E_max) local edge ids."""
    import jax.numpy as jnp

    b = n_nodes.shape[0]
    base = (jnp.arange(b, dtype=jnp.int32) * n_max)[:, None]
    node_iota = jnp.arange(n_max, dtype=jnp.int32)[None, :]
    node_mask = (node_iota < n_nodes[:, None]).astype(jnp.float32)
    seed_flag = (node_iota == seed_pos[:, None]).astype(jnp.float32)
    return PaddedSubgraphBatch(
        edges_src=(src_local + base).reshape(-1),
        edges_dst=(dst_local + base).reshape(-1),
        edge_weight=valid.astype(jnp.float32).reshape(-1),
        node_mask=node_mask,
        seed_flag=seed_flag * node_mask,
        n_nodes=n_nodes,
    )


def expand_wire(wire: WireBatch, n_max: int) -> PaddedSubgraphBatch:
    """Device-side expansion of a WireBatch (jit-friendly, all vector ops)."""
    import jax.numpy as jnp

    b, e_max = wire.src.shape
    valid = (
        jnp.arange(e_max, dtype=jnp.int32)[None, :]
        < wire.n_edges[:, None]
    )
    src_local = jnp.where(valid, wire.src.astype(jnp.int32), 0)
    dst_local = jnp.where(valid, wire.dst.astype(jnp.int32), 0)
    return _padded_from_locals(src_local, dst_local, valid, wire.n_nodes,
                               wire.seed_pos, n_max)


def expand_compact(wire: CompactWireBatch, n_max: int) -> PaddedSubgraphBatch:
    """Device-side expansion of a CompactWireBatch into the padded
    (B, E_max) layout via ONE scatter of the E_tot packed edges.

    Element-indexed ops dominate this path's cost on TPU; scattering the
    E_tot ≈ B·E_max/4 compact elements beats gathering B·E_max slots
    ~2.5x, and both endpoints ride in one packed integer so there is a
    single indexed op, unpacked afterwards with shifts (VPU-cheap)."""
    import jax.numpy as jnp

    b = wire.meta.shape[1]
    e_tot = wire.edges.shape[0]
    e_max = wire.e_max
    n_edges = wire.n_edges
    cum = jnp.cumsum(n_edges)
    e_iota = jnp.arange(e_tot, dtype=jnp.int32)
    # gid = searchsorted(cum, e_iota, "right"), vectorized: jnp's
    # searchsorted lowers to a while loop on TPU (~0.14 ms each; 16 of
    # them per 8-step dispatch was 18% of the step, docs/PERF.md). The
    # (E_tot, B) comparison grid is one fused reduce instead.
    gid = jnp.minimum(
        jnp.sum((e_iota[:, None] >= cum[None, :]).astype(jnp.int32),
                axis=1),
        b - 1,
    )
    off = jnp.concatenate([jnp.zeros(1, cum.dtype), cum[:-1]])
    pos = e_iota - off[gid]
    live = e_iota < cum[b - 1]
    tgt = jnp.where(live, gid * e_max + pos, b * e_max)  # OOB -> dropped
    padded = (
        jnp.zeros(b * e_max, jnp.int32)
        .at[tgt]
        .set(wire.edges.astype(jnp.int32), mode="drop", unique_indices=True)
        .reshape(b, e_max)
    )
    mask_bits = (1 << wire.id_bits) - 1
    src_local = padded & mask_bits
    dst_local = (padded >> wire.id_bits) & mask_bits
    valid = (
        jnp.arange(e_max, dtype=jnp.int32)[None, :] < n_edges[:, None]
    )
    return _padded_from_locals(src_local, dst_local, valid, wire.n_nodes,
                               wire.seed_pos, n_max)


def wire_from_arrays(
    src: np.ndarray, dst: np.ndarray, n: np.ndarray, e: np.ndarray,
    seed_pos: np.ndarray | None = None, e_max: int | None = None,
) -> WireBatch:
    """Host-side WireBatch from the native sampler's padded outputs
    ((S, e_cap) int32 src/dst + per-seed counts) — a dtype cast and an
    optional column slice, no per-graph Python loop."""
    s, e_cap = src.shape
    if e_max is not None and e_max < e_cap:
        src, dst = src[:, :e_max], dst[:, :e_max]
        e = np.minimum(e, e_max)
    # int16 wire ids: local node ids must fit, or the cast silently
    # wraps negative and corrupts the on-device adjacency.
    if np.asarray(n).max(initial=0) > np.iinfo(np.int16).max:
        raise ValueError(
            f"wire format holds local node ids as int16; a subgraph has "
            f"{int(np.asarray(n).max())} nodes (max {np.iinfo(np.int16).max}). "
            f"Use a smaller n_max bucket or the partitioned giant-graph path."
        )
    return WireBatch(
        src=np.ascontiguousarray(src, np.int16),
        dst=np.ascontiguousarray(dst, np.int16),
        n_nodes=np.ascontiguousarray(n, np.int32),
        n_edges=np.ascontiguousarray(e, np.int32),
        seed_pos=(np.zeros(s, np.int32) if seed_pos is None
                  else np.ascontiguousarray(seed_pos, np.int32)),
    )


def concat_padded(b1: PaddedSubgraphBatch,
                  b2: PaddedSubgraphBatch) -> PaddedSubgraphBatch:
    """Stack two same-bucket padded batches into one (2B, ...) batch.

    Lets the train step featurize query and key views in a single fused
    program — halves the count of small featurization kernels, which are
    launch-overhead-bound on TPU."""
    import jax.numpy as jnp

    return concat_padded_many([b1, b2])


def concat_padded_many(
    batches: "Sequence[PaddedSubgraphBatch]",
) -> PaddedSubgraphBatch:
    """Stack same-bucket padded batches into one (ΣB_i, ...) batch.

    One concatenate per field regardless of the number of inputs — used
    to featurize a whole multi-step dispatch (K steps × query+key) in a
    single batched program (see training/pretrain.py)."""
    import jax.numpy as jnp

    n = batches[0].node_mask.shape[1]
    offs, total = [], 0
    for b in batches:
        offs.append(total)
        total += b.node_mask.shape[0] * n
    return PaddedSubgraphBatch(
        edges_src=jnp.concatenate(
            [b.edges_src + o for b, o in zip(batches, offs)]),
        edges_dst=jnp.concatenate(
            [b.edges_dst + o for b, o in zip(batches, offs)]),
        edge_weight=jnp.concatenate([b.edge_weight for b in batches]),
        node_mask=jnp.concatenate([b.node_mask for b in batches]),
        seed_flag=jnp.concatenate([b.seed_flag for b in batches]),
        n_nodes=jnp.concatenate([b.n_nodes for b in batches]),
    )


@dataclasses.dataclass(frozen=True)
class Subgraph:
    """Host-side subgraph: relabeled edge list + node count + seed position."""

    src: np.ndarray  # (E,) int32, local ids
    dst: np.ndarray  # (E,) int32, local ids
    num_nodes: int
    seed: int = 0  # local id of the walk seed (0 except entire-graph mode)


def batch_subgraphs(
    graphs: Sequence[Subgraph],
    n_max: int | None = None,
    e_max: int | None = None,
) -> PaddedSubgraphBatch:
    """Pack host subgraphs into one padded batch (numpy; device put by caller).

    Padding edges are self-loops on each graph's node 0 with weight 0, so
    they never contribute to aggregation and always index valid memory.
    """
    bsz = len(graphs)
    if n_max is None or e_max is None:
        auto_n, auto_e = pick_bucket(
            max(g.num_nodes for g in graphs), max(len(g.src) for g in graphs)
        )
        n_max = n_max or auto_n
        e_max = e_max or auto_e

    edges_src = np.zeros((bsz, e_max), dtype=np.int32)
    edges_dst = np.zeros((bsz, e_max), dtype=np.int32)
    edge_weight = np.zeros((bsz, e_max), dtype=np.float32)
    node_mask = np.zeros((bsz, n_max), dtype=np.float32)
    seed_flag = np.zeros((bsz, n_max), dtype=np.float32)
    n_nodes = np.zeros((bsz,), dtype=np.int32)

    for b, g in enumerate(graphs):
        n, e = g.num_nodes, len(g.src)
        if n > n_max or e > e_max:
            raise ValueError(f"subgraph {b} ({n} nodes / {e} edges) exceeds bucket "
                             f"({n_max}, {e_max})")
        base = b * n_max
        edges_src[b, :e] = g.src + base
        edges_dst[b, :e] = g.dst + base
        # Padding edges already point at `base + 0` (zeros + base below).
        edges_src[b, e:] = base
        edges_dst[b, e:] = base
        edge_weight[b, :e] = 1.0
        node_mask[b, :n] = 1.0
        seed_flag[b, g.seed] = 1.0
        n_nodes[b] = n

    return PaddedSubgraphBatch(
        edges_src=edges_src.reshape(-1),
        edges_dst=edges_dst.reshape(-1),
        edge_weight=edge_weight.reshape(-1),
        node_mask=node_mask,
        seed_flag=seed_flag,
        n_nodes=n_nodes,
    )
