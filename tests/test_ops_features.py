"""Ops + featurization tests vs dense numpy/scipy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
from gcc_tpu.ops.aggregate import (
    aggregate_sum_dense,
    aggregate_sum_segment,
    build_dense_adjacency,
    graph_pool_max,
    graph_pool_mean,
    graph_pool_sum,
    node_degrees,
)
from gcc_tpu.features import featurize_batch, laplacian_positional_embedding


def make_batch(graphs_edges, n_max=8, e_max=16, seeds=None):
    subs = []
    for i, (src, dst, n) in enumerate(graphs_edges):
        subs.append(
            Subgraph(
                src=np.asarray(src, np.int32),
                dst=np.asarray(dst, np.int32),
                num_nodes=n,
                seed=0 if seeds is None else seeds[i],
            )
        )
    return batch_subgraphs(subs, n_max=n_max, e_max=e_max)


TOY = [
    ([0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2], 3),  # triangle
    ([0, 1, 0, 1], [1, 0, 1, 0], 2),              # double edge (multiplicity)
    ([], [], 1),                                   # isolated node
]


def test_dense_adjacency_matches_edges():
    batch = make_batch(TOY)
    adj = np.asarray(build_dense_adjacency(batch))
    # Triangle: symmetric 0/1
    expect0 = np.zeros((8, 8))
    for s, d in zip(*TOY[0][:2]):
        expect0[d, s] += 1
    np.testing.assert_array_equal(adj[0], expect0)
    # Multiplicity 2 kept.
    assert adj[1][1, 0] == 2 and adj[1][0, 1] == 2
    # Isolated: all zero.
    assert adj[2].sum() == 0


def test_aggregate_dense_equals_segment():
    rng = np.random.default_rng(0)
    batch = make_batch(TOY)
    h = jnp.asarray(rng.normal(size=(3, 8, 5)).astype(np.float32))
    seg = aggregate_sum_segment(h, batch)
    dense = aggregate_sum_dense(h, build_dense_adjacency(batch))
    np.testing.assert_allclose(np.asarray(seg), np.asarray(dense), atol=1e-5)


def test_aggregate_oracle():
    # Hand-check triangle: out[v] = sum of neighbors.
    batch = make_batch([TOY[0]], n_max=4, e_max=8)
    h = jnp.asarray(
        np.array([[[1, 0], [0, 1], [2, 2], [9, 9]]], dtype=np.float32)
    )
    out = np.asarray(aggregate_sum_segment(h, batch))
    np.testing.assert_allclose(out[0, 0], [2, 3])  # nbrs 1,2
    np.testing.assert_allclose(out[0, 1], [3, 2])  # nbrs 0,2
    np.testing.assert_allclose(out[0, 2], [1, 1])  # nbrs 0,1
    np.testing.assert_allclose(out[0, 3], [0, 0])  # padding untouched


def test_node_degrees():
    batch = make_batch(TOY)
    deg = np.asarray(node_degrees(batch))
    np.testing.assert_array_equal(deg[0, :3], [2, 2, 2])
    np.testing.assert_array_equal(deg[1, :2], [2, 2])
    assert deg[2].sum() == 0


def test_pooling():
    batch = make_batch(TOY)
    h = jnp.ones((3, 8, 4))
    np.testing.assert_allclose(
        np.asarray(graph_pool_sum(h, batch.node_mask))[:, 0], [3, 2, 1]
    )
    np.testing.assert_allclose(
        np.asarray(graph_pool_mean(h, batch.node_mask)), np.ones((3, 4))
    )
    h2 = jnp.asarray(np.arange(3 * 8 * 1, dtype=np.float32).reshape(3, 8, 1))
    mx = np.asarray(graph_pool_max(h2, batch.node_mask))
    np.testing.assert_allclose(mx[:, 0], [2, 9, 16])  # max over real nodes


def reference_pe_oracle(src, dst, n, pos_size):
    """The reference recipe (data_util.py:242-281) in scipy, dense."""
    import scipy.sparse as sp

    a = np.zeros((n, n))
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    deg = a.sum(axis=1)
    inv = 1.0 / np.sqrt(np.clip(deg, 1, None))
    m = a * inv[:, None] * inv[None, :]
    k = min(n - 2, pos_size)
    if k <= 0:
        return np.zeros((n, pos_size))
    vals, vecs = np.linalg.eigh(m)
    u = vecs[:, -k:]  # top-k ascending (reference layout)
    norm = np.linalg.norm(u, axis=1, keepdims=True)
    u = u / np.where(norm == 0, 1, norm)
    out = np.zeros((n, pos_size))
    out[:, :k] = u
    return out


@pytest.mark.parametrize("case", [0, 1])
def test_positional_embedding_matches_oracle_subspace(case):
    # Compare spanned subspace (ours descending vs oracle ascending, signs
    # arbitrary): the row-normalized top-k eigenvector sets must span the
    # same space, checked via projector allclose.
    rng = np.random.default_rng(case)
    n = 12
    src = rng.integers(0, n, 40)
    dst = rng.integers(0, n, 40)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    pos_size = 4
    batch = make_batch([(src, dst, n)], n_max=16, e_max=128)
    ours = np.asarray(laplacian_positional_embedding(batch, pos_size))[0, :n]
    # Recompute both *unnormalized* projectors from the raw eigenvectors:
    # row normalization destroys orthogonality, so compare before that —
    # instead check each of our columns lies in the oracle's top-k span.
    import numpy.linalg as la

    a = np.zeros((n, n))
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    deg = a.sum(axis=1)
    inv = 1.0 / np.sqrt(np.clip(deg, 1, None))
    m = a * inv[:, None] * inv[None, :]
    k = min(n - 2, pos_size)
    _, vecs = la.eigh(m)
    basis = vecs[:, -k:]
    proj = basis @ basis.T
    for j in range(k):
        col = ours[:, j]
        assert la.norm(col) > 0.1  # row-normalized, but columns nonzero
        # Column should be (numerically) inside the span only before row
        # normalization — so instead verify the *unnormalized* embedding:
    # Direct check: recompute ours without row-normalization via the
    # oracle in descending order and compare |cosine| per column.
    ref_desc = vecs[:, -1 : -k - 1 : -1]
    raw = np.asarray(
        laplacian_positional_embedding(batch, pos_size)
    )[0, :n]
    # After row normalization parity: apply same row normalization to ref.
    ref = np.zeros((n, pos_size))
    ref[:, :k] = ref_desc
    rn = la.norm(ref, axis=1, keepdims=True)
    ref = ref / np.where(rn == 0, 1, rn)
    for j in range(k):
        c = abs(np.dot(raw[:, j], ref[:, j])) / (
            la.norm(raw[:, j]) * la.norm(ref[:, j]) + 1e-12
        )
        assert c > 0.99, f"col {j} cosine {c}"


def test_positional_embedding_small_graphs_zero():
    # n <= 2 -> k <= 0 -> all-zero PE (reference data_util.py:245-246).
    batch = make_batch([([0, 1], [1, 0], 2), ([], [], 1)])
    pe = np.asarray(laplacian_positional_embedding(batch, 4))
    assert pe[0].sum() == 0 and pe[1].sum() == 0


def test_positional_embedding_rows_unit_norm():
    rng = np.random.default_rng(3)
    n = 10
    src = rng.integers(0, n, 30)
    dst = rng.integers(0, n, 30)
    keep = src != dst
    src, dst = np.concatenate([src[keep], dst[keep]]), np.concatenate(
        [dst[keep], src[keep]]
    )
    batch = make_batch([(src, dst, n)], n_max=16, e_max=128)
    pe = np.asarray(laplacian_positional_embedding(batch, 4))[0]
    norms = np.linalg.norm(pe[:n], axis=1)
    ok = (np.abs(norms - 1) < 1e-4) | (norms < 1e-6)
    assert ok.all()
    # Padding rows zero.
    assert np.abs(pe[n:]).sum() == 0


def test_featurize_batch_jits():
    batch = make_batch(TOY)
    f = jax.jit(lambda b: featurize_batch(b, 4))(batch)
    assert f.pos.shape == (3, 8, 4)
    assert f.degrees.dtype == jnp.int32
    assert f.adj.shape == (3, 8, 8)


def test_subspace_pe_approximates_eigh():
    # The subspace-iteration PE must span (approximately) the same
    # per-column directions as the exact eigh PE on a generic graph.
    rng = np.random.default_rng(5)
    n = 30
    src = rng.integers(0, n, 140)
    dst = rng.integers(0, n, 140)
    keep = src != dst
    src, dst = np.concatenate([src[keep], dst[keep]]), np.concatenate(
        [dst[keep], src[keep]]
    )
    batch = make_batch([(src, dst, n)], n_max=32, e_max=512)
    exact = np.asarray(
        laplacian_positional_embedding(batch, 8, method="eigh")
    )[0, :n]
    approx = np.asarray(
        laplacian_positional_embedding(batch, 8, method="subspace",
                                       iters=60, orth_every=4)
    )[0, :n]
    # Compare leading columns by |cosine| (degenerate tail may mix).
    for j in range(4):
        a, b = exact[:, j], approx[:, j]
        c = abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert c > 0.95, f"col {j}: cosine {c}"


def test_subspace_pe_padding_stays_zero():
    batch = make_batch(TOY + [([0, 1], [1, 0], 2)])
    pe = np.asarray(
        laplacian_positional_embedding(batch, 4, method="subspace", iters=20)
    )
    nm = np.asarray(batch.node_mask)
    assert np.abs(pe[nm == 0]).max() == 0


def test_pe_pallas_kernel_interpret_matches_xla():
    # The fused Pallas PE iteration (interpret mode on CPU) must agree
    # with the XLA op-by-op fallback on the converged subspace.
    from functools import partial

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from gcc_tpu.ops import pe_pallas

    rng = np.random.default_rng(0)
    b, n, k = 2, 32, 8
    m = rng.normal(size=(b, n, n)).astype(np.float32)
    m = (m + m.transpose(0, 2, 1)) / 2
    q0 = rng.normal(size=(b, n, k)).astype(np.float32)

    # f32 power dtype / no polish: the reference below replicates the
    # exact f32 round structure (the production bf16+polish path is
    # covered by the subspace-vs-eigh oracle tests).
    kernel = partial(pe_pallas._pe_kernel, iters=12, orth_every=4,
                     ns_steps=3, k=k, graphs_per_block=1,
                     power_dtype=jnp.float32, polish=0, final_ns=0)
    out_t = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, n), np.float32),
        interpret=True,
    )(jnp.asarray(m), jnp.asarray(q0).swapaxes(1, 2))
    out = jnp.swapaxes(out_t, 1, 2)

    # XLA reference of the same round-based iteration (orth_every
    # matmuls then Gershgorin-scaled Newton-Schulz, every round
    # including the last).
    q = jnp.asarray(q0)
    for _round in range(12 // 4):
        for _ in range(4):
            q = jnp.einsum("bij,bjk->bik", jnp.asarray(m), q)
        norm = jnp.sqrt((q * q).sum(axis=1, keepdims=True))
        q = q / jnp.maximum(norm, 1e-20)
        g = jnp.einsum("bni,bnj->bij", q, q)
        bound = jnp.max(jnp.sum(jnp.abs(g), axis=2), axis=1)
        s = 1.0 / jnp.sqrt(jnp.maximum(bound, 1e-20))
        q = q * s[:, None, None]
        g = g * (s * s)[:, None, None]
        for i in range(3):
            if i:
                g = jnp.einsum("bni,bnj->bij", q, q)
            q = 1.5 * q - 0.5 * jnp.einsum("bnk,bkj->bnj", q, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), rtol=2e-4,
                               atol=2e-4)


def test_dense_adjacency_onehot_matches_scatter():
    """The one-hot MXU adjacency builder is exactly the scatter oracle
    (bf16 one-hots are exact 0/1; f32 accumulation is exact counting)."""
    from gcc_tpu.ops.aggregate import (
        build_dense_adjacency, build_dense_adjacency_scatter, node_degrees,
    )

    rng = np.random.default_rng(3)
    graphs = []
    for n in (5, 11, 16):
        src = rng.integers(0, n, 4 * n)
        dst = rng.integers(0, n, 4 * n)
        # keep self-loops and duplicate edges: multiplicities must count
        graphs.append((np.concatenate([src, dst]),
                       np.concatenate([dst, src]), n))
    batch = make_batch(graphs, n_max=16, e_max=128)
    a1 = np.asarray(build_dense_adjacency(batch))
    a2 = np.asarray(build_dense_adjacency_scatter(batch))
    np.testing.assert_array_equal(a1, a2)
    d1 = np.asarray(node_degrees(batch, jnp.asarray(a1)))
    d2 = np.asarray(node_degrees(batch))
    np.testing.assert_allclose(d1, d2)


def test_pallas_production_config_interpret_vs_eigh(monkeypatch):
    """The PRODUCTION kernel path (bf16 power steps + f32 polish +
    Newton-Schulz finish) run in Pallas interpret mode must span the
    exact-eigh top-k per column, including a rank-deficient tiny
    component (n_b < k) in the same batch — the case where an unguarded
    NS finish diverges."""
    monkeypatch.setenv("GCC_TPU_PE_PALLAS", "interpret")
    rng = np.random.default_rng(4)
    n = 30
    src = rng.integers(0, n, 140)
    dst = rng.integers(0, n, 140)
    keep = src != dst
    src, dst = np.concatenate([src[keep], dst[keep]]), np.concatenate(
        [dst[keep], src[keep]]
    )
    # graph 2: a 5-node path — rank 5 < k=8 columns.
    tiny = ([0, 1, 1, 2, 2, 3, 3, 4], [1, 0, 2, 1, 3, 2, 4, 3], 5)
    batch = make_batch([(src, dst, n), tiny], n_max=32, e_max=512)
    approx = np.asarray(
        laplacian_positional_embedding(batch, 8, method="subspace",
                                       iters=60, orth_every=4)
    )
    assert np.isfinite(approx).all()
    assert np.abs(approx).max() <= 1.0 + 1e-4  # row-normalized, no blow-up
    exact = np.asarray(
        laplacian_positional_embedding(batch, 8, method="eigh")
    )
    for j in range(4):  # leading columns of the big graph
        a, b = exact[0, :n, j], approx[0, :n, j]
        c = abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert c > 0.95, f"col {j}: cosine {c}"
    # Tiny graph: k_b = 3 valid columns, all finite and nonzero.
    assert np.abs(approx[1, :5, :3]).sum() > 0
    assert np.abs(approx[1, :, 3:]).max() == 0  # masked columns stay zero


@pytest.mark.parametrize("layout", ["lane", "bm"])
def test_jacobi_eigh_matches_numpy_oracle(layout):
    """Parallel-order Jacobi (ops/jacobi.py) vs numpy.linalg.eigh on
    generic symmetric batches: eigenvalues, reconstruction, and
    orthonormality at the default 5 sweeps — for both the lane layout
    and the batch-minor ("bm") layout used when B >> n."""
    from gcc_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(3)
    for n in (8, 32):
        a = rng.standard_normal((16, n, n)).astype(np.float32)
        a = (a + a.transpose(0, 2, 1)) / 2
        w, v = jax.jit(
            lambda x: jacobi_eigh(x, sweeps=5, layout=layout)
        )(jnp.asarray(a))
        w, v = np.asarray(w), np.asarray(v)
        wr = np.linalg.eigh(a)[0]
        np.testing.assert_allclose(w, wr, atol=5e-4)
        rec = np.einsum("bij,bj,bkj->bik", v, w, v)
        np.testing.assert_allclose(rec, a, atol=5e-3)
        orth = np.einsum("bij,bik->bjk", v, v)
        np.testing.assert_allclose(
            orth, np.broadcast_to(np.eye(n), orth.shape), atol=3e-5
        )
        # descending order option
        wd, vd = jax.jit(
            lambda x: jacobi_eigh(x, sweeps=5, descending=True,
                                  layout=layout)
        )(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(wd), wr[:, ::-1], atol=5e-4)


def test_jacobi_eigh_bm_equals_lane():
    """bm and lane layouts are the same math in different memory
    layouts: identical eigenvalues and eigenvectors up to column sign
    at PE-realistic shapes (B >> n, including a 48-wide guarded Gram)."""
    from gcc_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(7)
    for b, n in ((64, 32), (48, 48)):
        a = rng.standard_normal((b, n, n)).astype(np.float32)
        a = (a + a.transpose(0, 2, 1)) / 2
        wl, vl = jax.jit(
            lambda x: jacobi_eigh(x, sweeps=5, descending=True)
        )(jnp.asarray(a))
        wb, vb = jax.jit(
            lambda x: jacobi_eigh(x, sweeps=5, descending=True,
                                  layout="bm")
        )(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(wb), np.asarray(wl),
                                   atol=2e-4)
        # Eigenvectors match up to per-column sign.
        dot = np.einsum("bij,bik->bjk", np.asarray(vl), np.asarray(vb))
        diag = np.abs(np.diagonal(dot, axis1=1, axis2=2))
        np.testing.assert_allclose(diag, 1.0, atol=1e-3)


def test_jacobi_pallas_interpret_matches_numpy():
    """The fused Jacobi kernel (experimental, ops/jacobi_pallas.py) in
    interpret mode vs numpy: same contract as the XLA formulation."""
    from gcc_tpu.ops.jacobi_pallas import jacobi_eigh_tpu

    rng = np.random.default_rng(4)
    a = rng.standard_normal((8, 32, 32)).astype(np.float32)
    a = (a + a.transpose(0, 2, 1)) / 2
    for desc in (False, True):
        w, v = jacobi_eigh_tpu(jnp.asarray(a), sweeps=5, descending=desc,
                               interpret=True)
        w, v = np.asarray(w), np.asarray(v)
        wr = np.linalg.eigh(a)[0]
        if desc:
            wr = wr[:, ::-1]
        np.testing.assert_allclose(w, wr, atol=5e-4)
        rec = np.einsum("bij,bj,bkj->bik", v, w, v)
        np.testing.assert_allclose(rec, a, atol=5e-3)


def test_pe_jacobi_rr_matches_eigh_rr(monkeypatch):
    """The production Jacobi Rayleigh-Ritz finish must reproduce the
    exact-eigh finish column-for-column (same subspace iterate, same
    ordering) — mis-ordered clustered Ritz values would permute PE
    columns per graph and change what the shared encoder weights see."""
    rng = np.random.default_rng(5)
    n = 200
    src = rng.integers(0, n, 1200)
    dst = rng.integers(0, n, 1200)
    batch = make_batch([(src, dst, n)], n_max=256, e_max=4096)

    monkeypatch.setenv("GCC_TPU_PE_RR", "eigh")
    pe_eigh = np.asarray(jax.jit(
        lambda b: laplacian_positional_embedding(b, 32, method="subspace")
    )(batch))
    monkeypatch.setenv("GCC_TPU_PE_RR", "jacobi")
    # 5 sweeps = the column-exact setting this oracle pins; the
    # production default (3) converges the vectors but may order
    # near-degenerate Ritz values differently (features/positional.py
    # _rr_sweeps).
    monkeypatch.setenv("GCC_TPU_PE_RR_SWEEPS", "5")
    pe_jac = np.asarray(jax.jit(
        lambda b: laplacian_positional_embedding(b, 32, method="subspace")
    )(batch))

    cos = []
    for j in range(30):
        a, b = pe_eigh[0, :n, j], pe_jac[0, :n, j]
        d = np.linalg.norm(a) * np.linalg.norm(b)
        if d > 1e-9:
            cos.append(abs(float(np.dot(a, b))) / d)
    cos = np.asarray(cos)
    assert np.median(cos) > 0.999, f"median col cosine {np.median(cos)}"
    assert (cos > 0.99).mean() > 0.8, f"cos dist {np.sort(cos)[:5]}"


def _random_compact_segments(rng, s, b, n_max, e_tot):
    """Random stacked compact wire segments + the padded oracle batches."""
    from gcc_tpu.graph.batch import (
        CompactWireBatch, expand_compact, pack_edge_ids,
    )

    dt = np.uint16 if n_max <= 256 else np.int32
    edges = np.full((s, e_tot), np.iinfo(dt).max, dt)  # stale tail bytes
    meta = np.zeros((s, 3, b), np.int32)
    padded = []
    id_bits = 8 if n_max <= 256 else 16
    for i in range(s):
        n = rng.integers(1, n_max + 1, b).astype(np.int32)
        e = rng.integers(0, max(2, e_tot // b), b).astype(np.int32)
        e = np.minimum(e, (e_tot - 8) // b)  # leave stale tail bytes
        seed_pos = rng.integers(0, n).astype(np.int32)
        src = np.concatenate([rng.integers(0, n[j], e[j]) for j in range(b)])
        dst = np.concatenate([rng.integers(0, n[j], e[j]) for j in range(b)])
        packed, bits = pack_edge_ids(src.astype(np.int32),
                                     dst.astype(np.int32), n_max)
        assert bits == id_bits
        edges[i, : packed.size] = packed
        meta[i] = np.stack([n, e, seed_pos])
        padded.append(expand_compact(
            CompactWireBatch(edges=edges[i], meta=meta[i], e_max=e_tot,
                             id_bits=id_bits),
            n_max,
        ))
    return edges, meta, id_bits, padded


def test_featurize_compact_matches_padded_path():
    """featurize_compact (adjacency scattered straight from the packed
    wire) is bit-identical to expanding each segment and running
    featurize_batch on the concatenation — the production hoisted path
    before this optimization."""
    from gcc_tpu.features.featurize import featurize_compact
    from gcc_tpu.graph.batch import concat_padded_many

    rng = np.random.default_rng(3)
    s, b, n_max, e_tot = 4, 3, 16, 64
    edges, meta, id_bits, padded = _random_compact_segments(
        rng, s, b, n_max, e_tot)

    got = jax.jit(
        lambda ed, me: featurize_compact(ed, me, n_max, id_bits, 8,
                                         pe_method="eigh")
    )(edges, meta)
    want = featurize_batch(concat_padded_many(padded), 8, pe_method="eigh")
    for name in got._fields:
        a, w = np.asarray(getattr(got, name)), np.asarray(getattr(want, name))
        if name == "pos":
            # The PE solver runs in a different fusion context (packed-
            # edge program vs padded-edge program), so eigh inputs agree
            # exactly but downstream rounding can differ in the last ulp.
            np.testing.assert_allclose(a, w, rtol=1e-5, atol=1e-6,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, w, err_msg=name)


def test_fused_featurize_matches_xla_chain():
    """The fused one-pass Pallas featurize builder (interpret mode) must
    reproduce the XLA chain exactly: adjacency ==
    build_dense_adjacency_compact, degrees == adj row sums, and m_shift
    == normalized_adjacency + _subspace_topk's pad-cancelling +I shift —
    including zero-edge graphs (the warm-compile path) and stale tail
    bytes past each segment's edge total."""
    from gcc_tpu.features.positional import _PAD_EIGENVALUE
    from gcc_tpu.ops.aggregate import build_dense_adjacency_compact
    from gcc_tpu.ops.featurize_pallas import fused_adjacency_featurize

    rng = np.random.default_rng(11)
    s, b, n_max, e_tot = 3, 4, 128, 256
    edges, meta, id_bits, _ = _random_compact_segments(
        rng, s, b, n_max, e_tot)
    assert id_bits == 8
    meta[0, 1, 0] = 0  # a zero-edge graph

    n_nodes = meta[:, 0, :].reshape(s * b)
    iota = np.arange(n_max, dtype=np.int32)[None, :]
    node_mask = (iota < n_nodes[:, None]).astype(np.float32)

    e_cap = 64  # per-graph cap: >= every count in the fixture
    assert int(meta[:, 1, :].max()) <= e_cap
    adj, ms, deg = fused_adjacency_featurize(
        jnp.asarray(edges), jnp.asarray(meta), jnp.asarray(node_mask),
        n_max, e_cap, interpret=True)

    want_adj = np.asarray(jax.jit(
        lambda ed, me: build_dense_adjacency_compact(ed, me[:, 1, :],
                                                     n_max, id_bits)
    )(edges, meta))
    np.testing.assert_array_equal(np.asarray(adj), want_adj)
    np.testing.assert_array_equal(np.asarray(deg), want_adj.sum(axis=2))

    # m_shift oracle: normalized adjacency with the -2 padding pin, then
    # + pad*eye + eye (features/positional.py _subspace_topk).
    degs = want_adj.sum(axis=2)  # in-degrees, both sides (node_degrees)
    inv_r = 1.0 / np.sqrt(np.maximum(degs, 1.0))
    m = want_adj * inv_r[:, :, None] * inv_r[:, None, :]
    eye = np.eye(n_max, dtype=np.float32)
    pad = 1.0 - node_mask
    m = m + (pad * _PAD_EIGENVALUE)[:, :, None] * eye
    want_ms = m + pad[:, :, None] * eye + eye
    np.testing.assert_allclose(np.asarray(ms), want_ms, atol=1e-6)


def test_featurize_compact_fused_path_equivalent(monkeypatch):
    """featurize_compact with GCC_TPU_FUSED_FEATURIZE=interpret (the
    one-pass kernel) must match the XLA-chain path leaf for leaf at the
    production subspace-PE configuration."""
    from gcc_tpu.features.featurize import featurize_compact

    rng = np.random.default_rng(13)
    s, b, n_max, e_tot = 3, 4, 128, 256
    edges, meta, id_bits, _ = _random_compact_segments(
        rng, s, b, n_max, e_tot)

    monkeypatch.setenv("GCC_TPU_PE_PALLAS", "interpret")

    def run():
        return featurize_compact(jnp.asarray(edges), jnp.asarray(meta),
                                 n_max, id_bits, 8, pe_method="subspace",
                                 e_cap=64)

    monkeypatch.delenv("GCC_TPU_FUSED_FEATURIZE", raising=False)
    want = run()
    monkeypatch.setenv("GCC_TPU_FUSED_FEATURIZE", "interpret")
    got = run()
    for name in got._fields:
        a, w = np.asarray(getattr(got, name)), np.asarray(getattr(want, name))
        if name == "pos":
            np.testing.assert_allclose(a, w, rtol=1e-4, atol=1e-5,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, w, err_msg=name)


def test_featurize_stacked_routes_compact():
    """featurize_stacked on stacked CompactWireBatch pytrees returns the
    same (K, 2B, ...) features as the padded-expansion route."""
    import dataclasses

    from gcc_tpu.graph.batch import CompactWireBatch
    from gcc_tpu.training.pretrain import featurize_stacked

    rng = np.random.default_rng(5)
    k_steps, b, n_max, e_tot = 2, 3, 16, 48
    eq, mq, bits, _ = _random_compact_segments(rng, k_steps, b, n_max, e_tot)
    ek, mk, _, _ = _random_compact_segments(rng, k_steps, b, n_max, e_tot)
    wq = CompactWireBatch(edges=eq, meta=mq, e_max=e_tot, id_bits=bits)
    wk = CompactWireBatch(edges=ek, meta=mk, e_max=e_tot, id_bits=bits)

    got = featurize_stacked(wq, wk, 8, "eigh", n_max)

    # Padded-expansion oracle: per step, expand q and k and featurize the
    # concatenation (the pre-optimization hoisted layout).
    from gcc_tpu.graph.batch import concat_padded_many, expand_compact

    per_step = []
    for i in range(k_steps):
        pq = expand_compact(dataclasses.replace(
            wq, edges=eq[i], meta=mq[i]), n_max)
        pk = expand_compact(dataclasses.replace(
            wk, edges=ek[i], meta=mk[i]), n_max)
        per_step.append(featurize_batch(
            concat_padded_many([pq, pk]), 8, pe_method="eigh"))
    for name in got._fields:
        want = np.stack([np.asarray(getattr(f, name)) for f in per_step])
        got_a = np.asarray(getattr(got, name))
        if name == "pos":
            np.testing.assert_allclose(got_a, want, rtol=1e-5, atol=1e-6,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(got_a, want, err_msg=name)


def test_pe_guards_profile_defaults(monkeypatch):
    """Session-5 retune (docs/PERF.md): train profile runs guardless,
    eval/generate keeps guards=16; GCC_TPU_PE_GUARDS overrides both."""
    from gcc_tpu.features.positional import _pe_guards

    monkeypatch.delenv("GCC_TPU_PE_GUARDS", raising=False)
    assert _pe_guards("train") == 0
    assert _pe_guards("eval") == 16
    monkeypatch.setenv("GCC_TPU_PE_GUARDS", "4")
    assert _pe_guards("train") == 4
    assert _pe_guards("eval") == 4


def test_pe_profile_changes_guard_path(monkeypatch):
    """The profile actually reaches the kernel: eval-profile PE (guarded
    generalized-RR) differs from train-profile PE on a graph whose tail
    columns need guards, and explicit guards= overrides the profile."""
    monkeypatch.delenv("GCC_TPU_PE_GUARDS", raising=False)
    rng = np.random.default_rng(0)
    n = 60
    src = rng.integers(0, n, 400).astype(np.int32)
    dst = rng.integers(0, n, 400).astype(np.int32)
    keep = src != dst
    sub = Subgraph(src=src[keep], dst=dst[keep], num_nodes=n, seed=0)
    batch = batch_subgraphs([sub], n_max=64, e_max=512)
    k = 16
    train = np.asarray(laplacian_positional_embedding(
        batch, k, method="subspace"))
    ev = np.asarray(laplacian_positional_embedding(
        batch, k, method="subspace", profile="eval"))
    g16 = np.asarray(laplacian_positional_embedding(
        batch, k, method="subspace", guards=16))
    g0 = np.asarray(laplacian_positional_embedding(
        batch, k, method="subspace", guards=0))
    np.testing.assert_array_equal(ev, g16)
    np.testing.assert_array_equal(train, g0)
    assert np.abs(ev - train).max() > 1e-6


def test_fused_featurize_nonmultiple_chunk_width():
    """e_cap > 512 and not a multiple of the 512-edge chunk must work:
    the wrapper pads the window width to a whole number of chunks
    (sentinel-filled) instead of letting the last ref slice clamp
    narrower than the iota one-hots (a trace-time crash pre-fix)."""
    from gcc_tpu.ops.aggregate import build_dense_adjacency_compact
    from gcc_tpu.ops.featurize_pallas import fused_adjacency_featurize

    rng = np.random.default_rng(13)
    s, b, n_max, e_tot = 2, 2, 64, 1400
    edges, meta, id_bits, _ = _random_compact_segments(
        rng, s, b, n_max, e_tot)
    assert id_bits == 8
    n_nodes = meta[:, 0, :].reshape(s * b)
    iota = np.arange(n_max, dtype=np.int32)[None, :]
    node_mask = (iota < n_nodes[:, None]).astype(np.float32)

    e_cap = 600  # > 512, not a multiple of 512
    assert int(meta[:, 1, :].max()) <= e_cap
    adj, _, deg = fused_adjacency_featurize(
        jnp.asarray(edges), jnp.asarray(meta), jnp.asarray(node_mask),
        n_max, e_cap, interpret=True)
    want_adj = np.asarray(jax.jit(
        lambda ed, me: build_dense_adjacency_compact(ed, me[:, 1, :],
                                                     n_max, id_bits)
    )(edges, meta))
    np.testing.assert_array_equal(np.asarray(adj), want_adj)
    np.testing.assert_array_equal(np.asarray(deg), want_adj.sum(axis=2))
