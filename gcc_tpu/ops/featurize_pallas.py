"""Fused one-pass Pallas featurize builder (docs/PERF.md lever 7b).

The XLA compact featurize chain (ops/aggregate.py
build_dense_adjacency_compact -> features/positional.py
normalized_adjacency -> m_shift) costs ~121 us/step at the canonical
routed config, dominated by the flat scatter-add that builds the
adjacency: ~13 ns/element of SERIAL VPU work over every real edge
(~6 ms per 64-step dispatch), plus 3-4 HBM passes over the
(B_eff, N, N) chain. This kernel replaces both:

  * the scatter becomes in-VMEM one-hot MXU contractions — the same
    one-hot contraction the padded path (build_dense_adjacency) pays
    for, EXCEPT the one-hots live only in VMEM per 512-edge chunk, never
    in HBM (the padded path materializes (B, E_max, N) tiles in HBM,
    which is why the scatter won round 1);
  * normalize + pad-diagonal + (+I) shift fuse behind the contraction
    in-register, so adjacency, m_shift and degrees are each written to
    HBM exactly once.

Edge-validity trick: the XLA-side window gather pads every slot past a
graph's edge count with the sentinel 0xFFFF, which decodes to
src = dst = 255 >= n_max — the one-hot comparisons simply never match,
so the kernel needs no count masks at all. This limits the fused path
to id_bits == 8 and n_max <= 128 (the routed small bucket — ~99% of
production dispatches); the large bucket keeps the XLA chain.

Chunks are predicated with pl.when on the per-block max edge count
(scalar-prefetched), so a block of ~112-edge graphs runs 1 of the
W/512 chunks instead of all of them.

Semantics pinned against the XLA chain in
tests/test_ops_features.py::test_fused_featurize_matches_xla_chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512
_SENTINEL = 0xFFFF


def _fused_kernel(nchunks_ref, edges_ref, mask_ref, adj_ref, ms_ref,
                  deg_ref, *, n_max: int, chunks: int, chunk: int):
    """One grid step = GPB graphs: edges (G, W) int32 (sentinel-padded),
    mask (G, N) f32 node mask. Outputs adj / m_shift (G, N, N) f32 and
    deg (G, N) f32."""
    g = edges_ref.shape[0]
    adj_ref[...] = jnp.zeros_like(adj_ref)
    nmax_chunks = nchunks_ref[pl.program_id(0)]

    for c in range(chunks):
        @pl.when(c < nmax_chunks)
        def _():
            e = edges_ref[:, c * chunk:(c + 1) * chunk]   # (G, C) int32
            src = e & 0xFF
            dst = (e >> 8) & 0xFF
            node = jax.lax.broadcasted_iota(jnp.int32, (g, n_max, chunk), 1)
            oh_s = (src[:, None, :] == node).astype(jnp.bfloat16)
            oh_d = (dst[:, None, :] == node).astype(jnp.bfloat16)
            # adj[d, s] += sum_e ohD[d, e] * ohS[s, e]: batched NT
            # contraction (same dimension_numbers as pe_pallas bgram).
            adj_ref[...] += jax.lax.dot_general(
                oh_d, oh_s, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

    adj = adj_ref[...]
    # IN-degrees on BOTH normalization sides — exactly node_degrees +
    # normalized_adjacency semantics (reference subg.in_degrees(),
    # data_util.py:273-277). Production graphs are symmetric (the
    # sampler inserts both directions) but parity must hold regardless.
    deg_r = jnp.sum(adj, axis=2)                      # (G, N) in-degree
    deg_ref[...] = deg_r
    inv = jax.lax.rsqrt(jnp.maximum(deg_r, 1.0))
    m = adj * inv[:, :, None] * inv[:, None, :]
    # m_shift = D^-1/2 A D^-1/2 + I on real rows, 0 on the padding
    # diagonal (normalized_adjacency's -2 pin and _subspace_topk's
    # +pad+I cancel there — features/positional.py).
    row = jax.lax.broadcasted_iota(jnp.int32, (g, n_max, n_max), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, n_max, n_max), 2)
    eye_real = jnp.where(row == col, 1.0, 0.0) * mask_ref[...][:, :, None]
    ms_ref[...] = m + eye_real


@functools.partial(jax.jit, static_argnames=("n_max", "e_cap", "interpret"))
def fused_adjacency_featurize(edges: jax.Array, meta: jax.Array,
                              node_mask: jax.Array, n_max: int,
                              e_cap: int, interpret: bool = False):
    """Fused adjacency + m_shift + degree build from compact wire.

    Args:
      edges: (S, E_tot) packed ``src | dst << 8`` uint16/int32 segments.
      meta: (S, 3, B) int32 (n_nodes, n_edges, seed_pos).
      node_mask: (S*B, n_max) f32.
      n_max: bucket node count, <= 128 (id_bits == 8 assumed).
      e_cap: per-graph edge cap (CompactWireBatch.e_max) — the static
        window width W.
    Returns (adj, m_shift, deg): (S*B, n_max, n_max) f32 x2, (S*B, n_max)
    f32 in-degrees. adj matches build_dense_adjacency_compact; m_shift
    matches normalized_adjacency + _subspace_topk's shift.
    """
    assert n_max <= 128, n_max
    s, e_tot = edges.shape
    b = meta.shape[2]
    counts = meta[:, 1, :]                               # (S, B)
    cum = jnp.cumsum(counts, axis=1)
    starts = (cum - counts).reshape(s * b)               # within-segment
    counts_f = counts.reshape(s * b)
    base = (jnp.arange(s, dtype=jnp.int32) * e_tot)[:, None]
    offs = (base + (cum - counts)).reshape(s * b)        # flat offsets
    flat = edges.reshape(-1).astype(jnp.int32) & 0xFFFF  # uint16 -> u16 bits
    # Pad the window width to a whole number of chunks: the kernel's ref
    # slice would otherwise clamp the last chunk narrower than the iota
    # one-hots (shape mismatch for any e_cap > _CHUNK not a multiple of
    # it). Padding slots are sentinel-filled, so they cost only VMEM.
    w = int(e_cap)
    if w > _CHUNK and w % _CHUNK:
        w += _CHUNK - w % _CHUNK
    idx = offs[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    live = jnp.arange(w, dtype=jnp.int32)[None, :] < counts_f[:, None]
    # Windows also must not cross their own segment's end: slots past
    # count are sentinel regardless of what the clipped gather reads.
    windows = jnp.where(
        live, jnp.take(flat, jnp.minimum(idx, flat.shape[0] - 1), axis=0),
        _SENTINEL,
    )
    del starts

    g_tot = s * b
    chunk = min(_CHUNK, w)
    chunks = -(-w // chunk)
    # Fatter blocks amortize per-grid-step overhead; ~2MB VMEM of
    # windows + outputs per program.
    gpb = max(1, min(g_tot, (2 << 20) // (w * 4 + n_max * n_max * 8)))
    while g_tot % gpb:
        gpb -= 1
    # Per-block chunk bound for pl.when predication.
    nchunks = -(-counts_f.reshape(g_tot // gpb, gpb).max(axis=1) // chunk)
    nchunks = jnp.maximum(nchunks, 1).astype(jnp.int32)

    kernel = functools.partial(_fused_kernel, n_max=n_max, chunks=chunks,
                               chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_tot // gpb,),
        in_specs=[
            pl.BlockSpec((gpb, w), lambda i, *_: (i, 0)),
            pl.BlockSpec((gpb, n_max), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gpb, n_max, n_max), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((gpb, n_max, n_max), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((gpb, n_max), lambda i, *_: (i, 0)),
        ],
    )
    adj, ms, deg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_tot, n_max, n_max), jnp.float32),
            jax.ShapeDtypeStruct((g_tot, n_max, n_max), jnp.float32),
            jax.ShapeDtypeStruct((g_tot, n_max), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=g_tot * chunks * 2 * n_max * n_max * chunk,
            bytes_accessed=g_tot * (w * 4 + n_max * n_max * 8 + n_max * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nchunks, windows, node_mask)
    return adj, ms, deg
