"""Giant-graph featurization: whole-graph Laplacian PE + degree
embedding + seed flag over the partitioned device mesh.

The reference's entire-graph mode encodes whole graphs end-to-end,
including the Laplacian positional embedding of the WHOLE graph
(gcc/datasets/graph_dataset.py:327-361 -> data_util.py:242-263, ARPACK
eigsh on the full normalized adjacency). Its scale ceiling is the host
ARPACK solve. Here the same PE is computed on the device mesh: the
subspace iteration of features/positional.py with the partitioned
aggregation of parallel/partitioned.py as its matvec — every schedule
(all_gather+segment-sum, ring, dense row-block) computes
out[v] = Σ_{u→v} w·h[u], which with w(u→v) = 1/sqrt(d_u·d_v) IS one
power step of M = D^-1/2 A D^-1/2. Orthonormalization runs as global
(k, k)-Gram CholeskyQR under GSPMD (XLA inserts the psum over shards),
and the Rayleigh-Ritz finish reuses ops/jacobi.py. This makes the
flagship scale path (parallel/giant.py) reachable end-to-end: degree
embedding + seed flag + PE all computed at whole-graph scale, beyond
what the reference's per-graph ARPACK can touch.

PE semantics mirror features/positional.py exactly (same documented
deviations from the reference: descending eigenvalue order,
max-|entry| sign canonicalization): guard columns + generalized
Rayleigh-Ritz whitening with the relative floor, column cutoff
k_b = min(n-2, pos_size), row-L2 normalization, zero padding rows.
Oracle-tested against exact dense eigh (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from gcc_tpu.parallel.giant import giant_gin_encode
from gcc_tpu.parallel.partitioned import (
    DensePartitionedGraph,
    PartitionedGraph,
    RingPartitionedGraph,
    partition_dense,
    partition_edges,
    partition_edges_ring,
    partitioned_aggregate,
    partitioned_aggregate_dense,
    partitioned_aggregate_ring,
    shard_dense_partition,
)


def _aggregate_for(pg):
    if isinstance(pg, RingPartitionedGraph):
        return partitioned_aggregate_ring
    if isinstance(pg, DensePartitionedGraph):
        return partitioned_aggregate_dense
    return partitioned_aggregate


def pg_arrays(pg):
    """Split a partition into (array leaves, static fields) for the
    jit-argument convention: partition arrays closed over as constants
    bake into the serialized program and blow the remote-compile relay's
    request cap (HTTP 413 at a 64 MB adjacency — CLAUDE.md hazard)."""
    return {f: jnp.asarray(getattr(pg, f)) for f in pg._fields
            if f != "num_nodes"}


def pg_rebuild(template, arrays):
    """Rebuild the partition NamedTuple inside jit with the static
    num_nodes from `template` and traced array leaves."""
    return type(template)(num_nodes=template.num_nodes, **arrays)


def dense_schedule_wins(num_edges, num_nodes, num_devices,
                        dense_budget_bytes=512 << 20) -> bool:
    """The measured dense/ring policy, in ONE place (docs/PERF.md
    "Partitioned aggregation" + end-to-end encode): dense row-block
    whenever N <= ~4k or density >= ~0.4% (the MXU streams the dense
    product >2x faster than the serial-VPU segment path), PROVIDED the
    per-device (N/D, N) f32 block fits the HBM budget; otherwise the
    ring schedule (latency-hiding segment sums — wins end-to-end in the
    very-sparse giant regime where MLP layers evict the big adjacency
    between aggregations). Used by both :func:`choose_partition` and
    :func:`giant_graph_embedding`'s shape-bucketing decision so the two
    cannot diverge."""
    density = num_edges / max(1, num_nodes) ** 2
    n_pad = -(-num_nodes // num_devices) * num_devices
    dense_bytes = n_pad * (n_pad // num_devices) * 4
    return ((num_nodes <= 4096 or density >= 0.004)
            and dense_bytes <= dense_budget_bytes)


def choose_partition(src, dst, num_nodes, num_devices, weight=None,
                     dense_budget_bytes=512 << 20):
    """Pick the measured-best schedule for one giant graph
    (:func:`dense_schedule_wins`)."""
    if dense_schedule_wins(len(src), num_nodes, num_devices,
                           dense_budget_bytes):
        return partition_dense(src, dst, num_nodes, num_devices,
                               weight=weight)
    return partition_edges_ring(src, dst, num_nodes, num_devices,
                                weight=weight)


def normalized_edge_weights(src, dst, degrees):
    """w(u→v) = 1/sqrt(d_u · d_v) with degree clipped at 1 — the entries
    of M = D^-1/2 A D^-1/2 (reference data_util.py:273-277)."""
    inv_sqrt = 1.0 / np.sqrt(np.maximum(degrees.astype(np.float64), 1.0))
    return (inv_sqrt[src] * inv_sqrt[dst]).astype(np.float32)


def giant_laplacian_pe(
    pg,
    q0: jax.Array,
    node_mask: jax.Array,
    mesh,
    num_real_nodes: int,
    pos_size: int = 32,
    iters: int = 64,
    orth_every: int = 8,
):
    """Top-`pos_size` eigenvectors of M for one partitioned giant graph.

    Jittable (call under jax.jit with pg leaves as traced arguments via
    :func:`pg_arrays`/:func:`pg_rebuild`). pg must carry the NORMALIZED
    edge weights (:func:`normalized_edge_weights`), so one aggregation
    is one power step M @ q.

    q0: (N_pad, k) deterministic start basis (see :func:`giant_pe_basis`;
    the guard-column count is fully encoded in its width k — guarded
    whitening engages whenever k exceeds pos_size) with padding rows
    zeroed; node_mask: (N_pad,) 1.0 on real rows.
    Returns (N_pad, pos_size) f32 — descending eigenvalue order,
    sign-canonicalized, row-L2-normalized, zero on padding — matching
    features/positional.py's conventions column for column.
    """
    aggregate = _aggregate_for(pg)
    k_keep = min(pos_size, max(1, num_real_nodes))
    k = q0.shape[1]

    def matvec(q):
        # One power step of the SHIFTED operator M + I: orthogonal
        # iteration converges in |λ| order; the shift moves spec(M) ⊆
        # [-1, 1] to [0, 2] so modulus order equals algebraic order
        # (features/positional.py _subspace_topk). Padding rows have no
        # edges and zero q, so they stay exactly zero.
        return aggregate(pg, q, mesh) + q

    eye_k = jnp.eye(k, dtype=jnp.float32)

    def orth_chol(q):
        # CholeskyQR on the global (k, k) Gram: the einsum over the
        # row-sharded q psums across shards under GSPMD. Exact (k is
        # 32-48; the N-row triangular solve is one pass) — this is the
        # eval path, so exactness beats the train path's NS steps.
        norm = jnp.linalg.norm(q, axis=0, keepdims=True)
        q = q / jnp.maximum(norm, 1e-20)
        gram = jnp.einsum("ni,nj->ij", q, q)
        r = jnp.linalg.cholesky(gram + 1e-6 * eye_k)
        q = jax.lax.linalg.triangular_solve(
            r, q, left_side=False, lower=True, transpose_a=True
        )
        return jnp.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)

    q = orth_chol(q0)
    for i in range(iters):
        q = matvec(q)
        if (i + 1) % orth_every == 0 and i != iters - 1:
            q = orth_chol(q)
    q = orth_chol(q)

    from gcc_tpu.ops.jacobi import jacobi_eigh

    if k > k_keep:
        # Generalized Rayleigh-Ritz whitening for the guarded basis —
        # same scheme as positional.py _subspace_topk: eigendecompose
        # the Gram, whiten with V·s^{-1/2}, RELATIVE floor 0.1·s_max
        # that DROPS collapsed directions instead of amplifying f32
        # noise into Ritz vectors.
        s_g = jnp.einsum("ni,nj->ij", q, q)
        s_g = 0.5 * (s_g + s_g.T) + 1e-6 * eye_k
        sv, v = jacobi_eigh(s_g[None], descending=True)
        sv, v = sv[0], v[0]
        floor = 0.1 * sv[:1]
        keep = (sv > floor).astype(q.dtype)
        w = v * (jax.lax.rsqrt(jnp.maximum(sv, floor)) * keep)[None, :]
        q = q @ w

    # Rayleigh-Ritz: rotate the converged subspace onto Ritz vectors of
    # M + I (the shift changes neither eigenvectors nor their order).
    mq = matvec(q)
    t = jnp.einsum("ni,nj->ij", q, mq)
    t = 0.5 * (t + t.T)
    if t.shape[-1] % 2 == 0:
        _, u = jacobi_eigh(t[None], descending=True)
        u = u[0]
    else:
        _, u = jnp.linalg.eigh(t)
        u = u[:, ::-1]
    top = q @ u[:, :k_keep]
    if k_keep < pos_size:
        top = jnp.pad(top, ((0, 0), (0, pos_size - k_keep)))

    # Sign canonicalization: max-|entry| component positive (gather-free
    # rule of positional.py; exact-tie fallback +).
    mx = jnp.max(jnp.abs(top), axis=0, keepdims=True)
    ref = jnp.sum(jnp.where(jnp.abs(top) == mx, top, 0.0), axis=0,
                  keepdims=True)
    top = top * jnp.sign(jnp.where(ref == 0, 1.0, ref))

    # Column cutoff k_b = min(n - 2, pos_size) (data_util.py:245-246).
    k_b = max(0, min(num_real_nodes - 2, pos_size))
    top = top * (jnp.arange(pos_size) < k_b)

    # Row-L2 normalize (zero rows stay zero), zero padding rows.
    norm = jnp.linalg.norm(top, axis=-1, keepdims=True)
    top = top / jnp.where(norm == 0, 1.0, norm)
    return top * node_mask[:, None]


def giant_pe_basis(n_pad: int, num_real_nodes: int, pos_size: int = 32,
                   guards: int = 16) -> np.ndarray:
    """Deterministic (N_pad, k) start basis: the same fixed-seed numpy
    draw as positional.py's q0 (PE must be a pure function of the
    graph), zero on padding rows; k = pos_size + guards rounded even
    for the paired Jacobi finish."""
    k = pos_size + max(0, guards)
    k += k % 2
    q0 = np.random.default_rng(2).standard_normal((n_pad, k))
    q0[num_real_nodes:] = 0.0
    return np.ascontiguousarray(q0, np.float32)


def giant_graph_embedding(
    encoder_cfg,
    params: dict,
    batch_stats: dict,
    g,
    mesh,
    iters: int = 64,
    guards: int | None = None,
    dense_budget_bytes: int = 512 << 20,
) -> np.ndarray:
    """End-to-end entire-graph embedding for a graph beyond the dense
    envelope: partition → whole-graph PE → degree embedding + seed flag
    → :func:`~gcc_tpu.parallel.giant.giant_gin_encode`.

    The user-facing door onto the giant path (generate.py routes here
    when g.num_nodes exceeds the dense bucket; reference entire-graph
    mode graph_dataset.py:327-361). Features match the subgraph
    featurizer: [PE(pos_size), degree-embedding(deg_size), seed flag]
    with seed = max-degree node (sampler.entire_graph_subgraph).
    Returns the (output_dim,) L2-normalized embedding as numpy."""
    from gcc_tpu.features.positional import _pe_guards

    if guards is None:
        guards = _pe_guards("eval")
    n = g.num_nodes
    d_cnt = mesh.shape["part"]
    deg = np.diff(g.indptr).astype(np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = np.asarray(g.indices, np.int64)

    # Shape bucketing for the ring path: round the padded node count to
    # a multiple of 256·D and the ring bucket width to a power of two,
    # so graphs of similar size REUSE one compiled program (each jit
    # compile costs ~20s through a remote-compile relay; padded rows and
    # weight-0 edges are masked throughout, so the extra compute is a
    # few % — worth it for any multi-graph dataset). The dense partition
    # stays exact: its memory is N²-proportional and the partition
    # itself dominates program size. The dense/ring decision is the
    # shared policy (dense_schedule_wins) choose_partition also applies.
    n_pad_hint = n
    if not dense_schedule_wins(len(src), n, d_cnt, dense_budget_bytes):
        step = 256 * d_cnt
        n_pad_hint = -(-n // step) * step

    w_pe = normalized_edge_weights(src, dst, deg)
    pg_pe = choose_partition(src, dst, n_pad_hint, d_cnt, weight=w_pe,
                             dense_budget_bytes=dense_budget_bytes)
    pg_enc = choose_partition(src, dst, n_pad_hint, d_cnt,
                              dense_budget_bytes=dense_budget_bytes)
    if isinstance(pg_pe, RingPartitionedGraph):
        pg_pe = _bucket_ring(pg_pe)
        pg_enc = _bucket_ring(pg_enc)
    if isinstance(pg_pe, DensePartitionedGraph):
        pg_pe = shard_dense_partition(pg_pe, mesh)
        pg_enc = shard_dense_partition(pg_enc, mesh)
    n_pad = pg_pe.num_nodes

    pos_size = encoder_cfg.positional_embedding_size
    q0 = giant_pe_basis(n_pad, n, pos_size, guards)
    mask = np.zeros(n_pad, np.float32)
    mask[:n] = 1.0

    from jax.sharding import NamedSharding, PartitionSpec as P

    row_sharded = NamedSharding(mesh, P("part"))
    q0_d = jax.device_put(q0, row_sharded)
    mask_d = jax.device_put(mask, row_sharded)
    pe_args = pg_arrays(pg_pe)

    # k_b / k_keep depend on num_real_nodes only below pos_size + 2;
    # collapsing the key above that lets every giant graph share the
    # cached program (_giant_pe_fn).
    n_key = min(n, pos_size + 2)
    pe = np.asarray(_giant_pe_fn(
        type(pg_pe), n_pad, mesh, n_key, pos_size, iters
    )(pe_args, q0_d, mask_d))

    # Degree embedding + seed flag on host (once per graph, eval path):
    # table lookup with the reference's clamp (graph_encoder.py:158-161).
    table = np.asarray(params["DegreeEmbedding_0"]["embedding"])
    idx = np.clip(deg, 0, table.shape[0] - 1)
    feats = np.zeros((n_pad, pos_size + table.shape[1] + 1), np.float32)
    feats[:n, :pos_size] = pe[:n]
    feats[:n, pos_size:pos_size + table.shape[1]] = table[idx]
    feats[int(np.argmax(deg)) if n else 0, -1] = 1.0  # seed flag

    enc_args = pg_arrays(pg_enc)
    feats_d = jax.device_put(feats, row_sharded)

    emb = _giant_enc_fn(type(pg_enc), n_pad, mesh,
                        encoder_cfg.num_layers)(
        params, batch_stats, enc_args, feats_d, mask_d)
    return np.asarray(emb)


def _bucket_ring(pg: RingPartitionedGraph) -> RingPartitionedGraph:
    """Pad the ring bucket width to the next power of two (0→0 loops of
    weight 0), so similar graphs hit the same compiled shape."""
    e_b = pg.src_local.shape[-1]
    e_pow = 1 << (e_b - 1).bit_length()
    if e_pow == e_b:
        return pg
    pad = ((0, 0), (0, 0), (0, e_pow - e_b))
    return pg._replace(
        src_local=np.pad(pg.src_local, pad),
        dst_local=np.pad(pg.dst_local, pad),
        weight=np.pad(pg.weight, pad),
    )


@lru_cache(maxsize=64)
def _giant_pe_fn(pg_type, num_nodes, mesh, n_key, pos_size, iters):
    """Memoized jitted PE program per (partition type, padded shape,
    mesh, static PE config) — a fresh closure per call would retrace
    and recompile every graph (~20 s each through a remote relay)."""
    @jax.jit
    def run(pa, q0, m):
        pg = pg_type(num_nodes=num_nodes, **pa)
        return giant_laplacian_pe(pg, q0, m, mesh, num_real_nodes=n_key,
                                  pos_size=pos_size, iters=iters)

    return run


@lru_cache(maxsize=64)
def _giant_enc_fn(pg_type, num_nodes, mesh, num_layers):
    """Memoized jitted giant-encode program (see _giant_pe_fn)."""

    @jax.jit
    def run(p, bs, pa, f, m):
        pg = pg_type(num_nodes=num_nodes, **pa)
        return giant_gin_encode(p, bs, pg, f, m, mesh,
                                num_layers=num_layers)

    return run
