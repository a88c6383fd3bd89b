"""Oracle gates for the round-5 bytes levers (docs/PERF.md levers 2-3):
GCC_TPU_ADJ_DTYPE=bf16 (adjacency/PE-operator storage) and
GCC_TPU_JACOBI_V_DTYPE=bf16 (Jacobi eigenvector accumulator).

The device-step A/B lives in scripts/diag_bf16_ab.py and the downstream
gate in scripts/pe_ab.py; these tests pin the numeric contracts that
make the levers SAFE to flip: integer edge counts stay exact in bf16,
Ritz VALUES (and hence column order — the one PE property shown to
matter downstream, docs/PERF.md "RR sweep count") are untouched by the
V-dtype, and the full subspace-PE pipeline keeps high cosine fidelity
to its f32 self.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def bf16_adj(monkeypatch):
    monkeypatch.setenv("GCC_TPU_ADJ_DTYPE", "bf16")


@pytest.fixture
def bf16_v(monkeypatch):
    monkeypatch.setenv("GCC_TPU_JACOBI_V_DTYPE", "bf16")


def _random_compact(rng, s=2, b=4, n=24, e_tot=256):
    """Random compact wire segments with duplicate edges (multiplicity)."""
    n_edges = rng.integers(10, 40, (s, b)).astype(np.int32)
    n_edges[:, -1] = np.minimum(n_edges[:, -1],
                                e_tot - n_edges[:, :-1].sum(1))
    edges = np.zeros((s, e_tot), np.uint16)
    for si in range(s):
        pos = 0
        for bi in range(b):
            src = rng.integers(0, n, n_edges[si, bi])
            dst = rng.integers(0, n, n_edges[si, bi])
            # force some duplicates for multiplicity coverage
            src[::5] = src[0]
            dst[::5] = dst[0]
            edges[si, pos : pos + n_edges[si, bi]] = src + (dst << 8)
            pos += n_edges[si, bi]
    return edges, n_edges


def test_bf16_adjacency_counts_exact(bf16_adj):
    from gcc_tpu.ops.aggregate import build_dense_adjacency_compact

    rng = np.random.default_rng(0)
    edges, n_edges = _random_compact(rng)
    adj = build_dense_adjacency_compact(
        jnp.asarray(edges), jnp.asarray(n_edges), 24, 8)
    assert adj.dtype == jnp.bfloat16
    import os

    os.environ.pop("GCC_TPU_ADJ_DTYPE")
    ref = build_dense_adjacency_compact(
        jnp.asarray(edges), jnp.asarray(n_edges), 24, 8)
    assert ref.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(adj, np.float32),
                                  np.asarray(ref))


def test_bf16_adjacency_aggregation_matches(bf16_adj):
    """aggregate_sum_dense with a bf16 adjacency: exact counts, bf16
    activation rounding only (~2^-9 relative)."""
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.ops.aggregate import (aggregate_sum_dense,
                                       build_dense_adjacency)

    rng = np.random.default_rng(1)
    subs = [
        Subgraph(src=rng.integers(0, 10, 30).astype(np.int32),
                 dst=rng.integers(0, 10, 30).astype(np.int32),
                 num_nodes=10, seed=0)
        for _ in range(3)
    ]
    batch = batch_subgraphs(subs, n_max=16, e_max=64)
    adj = build_dense_adjacency(batch)
    assert adj.dtype == jnp.bfloat16
    h = jnp.asarray(rng.standard_normal((3, 16, 8)), jnp.float32)
    out = aggregate_sum_dense(h, adj)
    assert out.dtype == jnp.float32
    ref = aggregate_sum_dense(h, adj.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_bf16_jacobi_values_exact_vectors_close(bf16_v):
    """V-dtype does not touch the iterate T: eigenVALUES bit-match the
    f32-V run; eigenVECTORS stay within bf16 random-walk rounding."""
    from gcc_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(2)
    a = rng.standard_normal((6, 32, 32)).astype(np.float32)
    a = a + np.swapaxes(a, 1, 2)
    for layout in ("lane", "bm"):
        w_lo, v_lo = jacobi_eigh(jnp.asarray(a), sweeps=5,
                                 descending=True, layout=layout)
        assert v_lo.dtype == jnp.float32  # API contract: f32 out
        import os

        os.environ.pop("GCC_TPU_JACOBI_V_DTYPE")
        w_hi, v_hi = jacobi_eigh(jnp.asarray(a), sweeps=5,
                                 descending=True, layout=layout)
        os.environ["GCC_TPU_JACOBI_V_DTYPE"] = "bf16"
        # Values come from the (f32) diagonal of the rotated T — the V
        # dtype must not perturb them at all.
        np.testing.assert_array_equal(np.asarray(w_lo), np.asarray(w_hi))
        cos = np.abs(np.sum(np.asarray(v_lo) * np.asarray(v_hi), axis=1))
        assert np.median(cos) > 0.995, (layout, np.median(cos))
        assert cos.min() > 0.9, (layout, cos.min())


def test_bf16_adj_subspace_pe_fidelity(bf16_adj):
    """Full subspace-PE chain with bf16 adjacency+operator vs its f32
    self on real-ish subgraphs: the bf16 storage rounding must not
    perturb the PE beyond the method's own clustered-spectrum ambiguity
    (median per-column |cos| ≥ 0.97 against the f32 run)."""
    from gcc_tpu.features.positional import laplacian_positional_embedding
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs

    rng = np.random.default_rng(3)
    subs = []
    for _ in range(4):
        n = int(rng.integers(30, 60))
        e = int(rng.integers(2 * n, 4 * n))
        subs.append(Subgraph(
            src=rng.integers(0, n, e).astype(np.int32),
            dst=rng.integers(0, n, e).astype(np.int32),
            num_nodes=n, seed=0))
    batch = batch_subgraphs(subs, n_max=64, e_max=256)
    pe_lo = laplacian_positional_embedding(batch, 32, method="subspace",
                                           guards=0)
    import os

    os.environ.pop("GCC_TPU_ADJ_DTYPE")
    pe_hi = laplacian_positional_embedding(batch, 32, method="subspace",
                                           guards=0)
    cos = np.abs(np.sum(np.asarray(pe_lo) * np.asarray(pe_hi), axis=1))
    # per-(graph, column) cosine over node axis; count only live columns
    live = np.linalg.norm(np.asarray(pe_hi), axis=1) > 1e-6
    assert np.median(cos[live]) > 0.97, np.median(cos[live])
