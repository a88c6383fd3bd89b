"""Sampler tests: structural contracts checked on both native and numpy paths.

The native C++ and numpy implementations share a behavior contract but
not RNG streams, so tests assert structure (seed-first, connectivity,
budget bounds, induced-edge correctness vs the CSRGraph oracle,
determinism) rather than bit-equality between backends.
"""

import numpy as np
import pytest

from gcc_tpu.config import SamplerConfig
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.sampling import (
    native_available,
    random_walk_final,
    rwr_budgets,
    sample_contrastive_pairs,
    sample_subgraphs,
    weighted_sample,
)
from gcc_tpu.sampling.sampler import degree_weights, entire_graph_subgraph

BACKENDS = [True]  # force_numpy values
if native_available():
    BACKENDS.append(False)


def ring_graph(n=50):
    src = np.arange(n)
    dst = (src + 1) % n
    return CSRGraph.from_edges(src, dst, symmetrize=True)


def random_graph(n=200, m=800, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n, symmetrize=True)


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_rwr_structure(force_numpy):
    g = random_graph()
    seeds = np.array([0, 7, 100, 199])
    budgets = np.full(4, 32)
    out = sample_subgraphs(
        g, seeds, budgets, restart_prob=0.8, rng_seed=42, force_numpy=force_numpy
    )
    for i, seed in enumerate(seeds):
        n_i, e_i = out.n[i], out.e[i]
        assert 1 <= n_i <= 33  # budget visits + seed
        # Seed is local node 0.
        assert out.nodes[i, 0] == seed
        # Unique nodes.
        assert len(set(out.nodes[i, :n_i].tolist())) == n_i
        # Edges are a subset of the true induced subgraph.
        oracle_src, oracle_dst = g.induced_subgraph(out.nodes[i, :n_i])
        got = sorted(zip(out.src[i, :e_i].tolist(), out.dst[i, :e_i].tolist()))
        want = sorted(zip(oracle_src.tolist(), oracle_dst.tolist()))
        assert got == want
        assert out.e_full[i] == len(want)


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_rwr_deterministic(force_numpy):
    g = random_graph()
    seeds = np.array([3, 14, 15])
    budgets = np.full(3, 64)
    a = sample_subgraphs(g, seeds, budgets, rng_seed=7, force_numpy=force_numpy)
    b = sample_subgraphs(g, seeds, budgets, rng_seed=7, force_numpy=force_numpy)
    np.testing.assert_array_equal(a.nodes, b.nodes)
    np.testing.assert_array_equal(a.src, b.src)
    c = sample_subgraphs(g, seeds, budgets, rng_seed=8, force_numpy=force_numpy)
    assert not np.array_equal(a.nodes, c.nodes)


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_rwr_isolated_seed(force_numpy):
    g = CSRGraph.from_edges([0], [1], num_nodes=3, symmetrize=True)
    out = sample_subgraphs(
        g, np.array([2]), np.array([16]), force_numpy=force_numpy
    )
    assert out.n[0] == 1 and out.e[0] == 0
    assert out.nodes[0, 0] == 2


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_rwr_stays_in_component(force_numpy):
    # Two disconnected rings: walk from ring A never reaches ring B.
    n = 20
    src = np.concatenate([np.arange(n), np.arange(n) + n])
    dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) + 1) % n + n])
    g = CSRGraph.from_edges(src, dst, symmetrize=True)
    out = sample_subgraphs(
        g, np.array([0]), np.array([500]), force_numpy=force_numpy
    )
    assert out.nodes[0, : out.n[0]].max() < n


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_ns_structure(force_numpy):
    g = random_graph()
    out = sample_subgraphs(
        g, np.array([5]), np.array([1]), aug="ns", expand=3, hops=2,
        node_cap=64, force_numpy=force_numpy,
    )
    n_i = out.n[0]
    assert n_i >= 2  # seed plus at least one neighbor
    assert out.nodes[0, 0] == 5
    # All sampled nodes within 2 hops of the seed.


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_random_walk_final(force_numpy):
    g = ring_graph(10)
    out = random_walk_final(g, np.array([0, 5]), num_hops=1,
                            force_numpy=force_numpy)
    # One hop on a ring moves to a neighbor.
    assert out[0] in (1, 9)
    assert out[1] in (4, 6)
    # Zero hops stays.
    out0 = random_walk_final(g, np.array([3]), num_hops=0,
                             force_numpy=force_numpy)
    assert out0[0] == 3


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_weighted_sample_distribution(force_numpy):
    w = np.array([0.0, 1.0, 3.0])
    out = weighted_sample(w, 6000, rng_seed=1, force_numpy=force_numpy)
    assert (out == 0).sum() == 0
    frac_2 = (out == 2).mean()
    assert 0.68 < frac_2 < 0.82  # expect 0.75


def test_budget_formula():
    g = random_graph()
    cfg = SamplerConfig(rw_hops=4, restart_prob=0.8)
    seeds = np.arange(10)
    b = rwr_budgets(g, seeds, cfg, degree_power=True)
    deg = g.out_degrees()[:10] ** 0.75
    expect = np.maximum(4, np.floor(deg * np.e / (np.e - 1) / 0.8 + 0.5))
    np.testing.assert_array_equal(b, expect.astype(np.int64))


@pytest.mark.parametrize("force_numpy", BACKENDS)
def test_contrastive_pairs(force_numpy):
    g = random_graph()
    cfg = SamplerConfig(rw_hops=16, restart_prob=0.8)
    qs, ks = sample_contrastive_pairs(
        g, np.array([1, 2, 3]), cfg, rng_seed=0, force_numpy=force_numpy
    )
    assert len(qs) == len(ks) == 3
    for q, k in zip(qs, ks):
        assert q.seed == 0 and k.seed == 0
        assert q.num_nodes >= 1 and k.num_nodes >= 1
        # q and k are independent samples (overwhelmingly different).
    assert any(
        q.num_nodes != k.num_nodes or not np.array_equal(q.src, k.src)
        for q, k in zip(qs, ks)
    )


def test_entire_graph_subgraph():
    g = random_graph(30, 100)
    sub = entire_graph_subgraph(g)
    assert sub.num_nodes == 30
    assert len(sub.src) == g.num_edges
    assert sub.seed == int(np.argmax(g.out_degrees()))


def test_degree_weights():
    g1 = ring_graph(5)
    g2 = ring_graph(3)
    w = degree_weights([g1, g2])
    assert len(w) == 8
    np.testing.assert_allclose(w, 2 ** 0.75)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_matches_numpy_statistically():
    # Mean subgraph size should agree between backends within tolerance.
    g = random_graph(500, 3000, seed=3)
    seeds = np.arange(100)
    budgets = np.full(100, 64)
    a = sample_subgraphs(g, seeds, budgets, rng_seed=0, force_numpy=False)
    b = sample_subgraphs(g, seeds, budgets, rng_seed=0, force_numpy=True)
    assert abs(a.n.mean() - b.n.mean()) / b.n.mean() < 0.15


def test_compact_pack16_matches_python_path():
    """The fused native super-batch pack must be bit-identical to
    compact_rows + pack_edge_ids per batch (including truncation
    accounting and zeroed tails)."""
    from gcc_tpu.graph.batch import pack_edge_ids
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler unavailable")
    rng = np.random.default_rng(3)
    n_batches, step, e_cap, e_tot = 4, 8, 64, 96
    rows = n_batches * step
    src = rng.integers(0, 256, (rows, e_cap)).astype(np.int16)
    dst = rng.integers(0, 256, (rows, e_cap)).astype(np.int16)
    n = rng.integers(1, 256, rows).astype(np.int32)
    e = rng.integers(0, e_cap, rows).astype(np.int32)
    e[5] = e_cap  # force overflow in batch 0
    edges, meta, dropped = native.compact_pack16(
        src, dst, n, e, n_batches, step, e_tot)
    for b in range(n_batches):
        lo, hi = b * step, (b + 1) * step
        c_src, c_dst, c_e, total = native.compact_rows(
            src[lo:hi], dst[lo:hi], e[lo:hi], e_tot)
        ref, bits = pack_edge_ids(c_src, c_dst, 256)
        assert bits == 8
        np.testing.assert_array_equal(edges[b][:total], ref[:total])
        assert (edges[b][total:] == 0).all()
        np.testing.assert_array_equal(meta[b][0], n[lo:hi])
        np.testing.assert_array_equal(meta[b][1], c_e)
        assert dropped[b] == int(e[lo:hi].astype(np.int64).sum()) - total


def test_avx512_extraction_matches_scalar():
    """The AVX-512 induced-edge extraction must be bit-identical to the
    scalar fallback (same edges, same order). The dispatch latches on
    first use, so each variant runs in its own subprocess."""
    import os
    import subprocess
    import sys

    prog = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.sampling import native
if not native.native_available():
    print("SKIP"); sys.exit(0)
rng = np.random.default_rng(7)
g = CSRGraph.from_edges(rng.integers(0, 4000, 30000),
                        rng.integers(0, 4000, 30000),
                        num_nodes=4000, symmetrize=True)
seeds = rng.integers(0, 4000, 64).astype(np.int64)
budgets = np.full(64, 200, np.int64)
out = native.sample_wire_pairs(g, seeds, seeds, budgets, budgets, 0.8,
                               "rwr", 5, 64, 1,
                               np.arange(64, dtype=np.int64), 256, 1024,
                               n_threads=1)
qs, qd, qn, qe, ks, kd, kn, ke = [np.asarray(x) for x in out]
acc = [qn.tobytes(), qe.tobytes(), kn.tobytes(), ke.tobytes()]
for s_, d_, e_ in ((qs, qd, qe), (ks, kd, ke)):
    for r in range(64):
        acc.append(s_[r, :e_[r]].tobytes())
        acc.append(d_[r, :e_[r]].tobytes())
import hashlib
print(hashlib.sha256(b"".join(acc)).hexdigest())
"""
    outs = []
    for env_val in ("0", "1"):
        env = dict(os.environ, GCC_SAMPLER_NO_AVX512=env_val,
                   JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout.strip().splitlines()[-1])
    if "SKIP" in outs:
        pytest.skip("native sampler unavailable")
    assert outs[0] == outs[1], "AVX-512 and scalar extraction diverge"


def test_interleaved_walker_bit_identical(monkeypatch):
    """GCC_TPU_WALK_ILV=W (the miss-bound-regime walker, csrc
    worker_ilv) must produce bit-identical wire pairs to the scalar
    path: each (sample, view) owns its RNG stream and visit set, so
    interleaving may only change completion order."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler required")
    rng = np.random.default_rng(3)
    n, m = 20000, 120000
    src = (n * rng.random(m) ** 2).astype(np.int64)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                            symmetrize=True)
    seeds = rng.integers(0, n, 64)
    bud = np.full(64, 128, np.int64)

    def run():
        return native.sample_wire_pairs(
            g, seeds, seeds, bud, bud, restart_prob=0.8, aug="rwr",
            expand=5, hops=2, rng_seed=7,
            sample_ids=np.arange(64, dtype=np.int64),
            node_cap=256, e_cap=1024, n_threads=1)

    monkeypatch.delenv("GCC_TPU_WALK_ILV", raising=False)
    base = run()
    monkeypatch.setenv("GCC_TPU_WALK_ILV", "8")
    ilv = run()
    for a, b in zip(base, ilv):
        np.testing.assert_array_equal(a, b)


def hub_graph(n=5000, m=40000, seed=7):
    """Heavy-tailed sorted-row graph with real hubs and multi-edges —
    the shape that triggers the hub-row binary-search extraction."""
    rng = np.random.default_rng(seed)
    src = (n * rng.random(m) ** 3.0).astype(np.int64)  # strong hub bias
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # Multi-edges: the hub path must count duplicate runs, not unique hits.
    src = np.concatenate([src, src[:2000]])
    dst = np.concatenate([dst, dst[:2000]])
    g = CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True,
                            sort_rows=True)
    assert g.rows_sorted
    # The fixture must actually contain hub rows (deg >> any visit set).
    deg = np.diff(g.indptr)
    assert deg.max() > 1000
    return g, rng


def test_sort_rows_invariant():
    g, _ = hub_graph()
    for u in (0, 1, 17, 4999):
        row = g.indices[g.indptr[u]:g.indptr[u + 1]]
        assert np.all(np.diff(row) >= 0)


def test_hub_extraction_bit_identical_wire_pairs(monkeypatch):
    """GCC_TPU_HUB_MULT>0 on a sorted-row graph must emit byte-identical
    wire pairs to the full row scan: on a sorted row both walk the
    neighbors in ascending-id order with multi-edge runs adjacent, so
    only the probe pattern — not the output — may change."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler required")
    g, rng = hub_graph()
    seeds = rng.integers(0, 5000, 64)
    bud = np.full(64, 128, np.int64)

    def run():
        return native.sample_wire_pairs(
            g, seeds, seeds, bud, bud, restart_prob=0.8, aug="rwr",
            expand=5, hops=2, rng_seed=11,
            sample_ids=np.arange(64, dtype=np.int64),
            node_cap=256, e_cap=2048, n_threads=1)

    monkeypatch.setenv("GCC_TPU_HUB_MULT", "0")
    base = run()
    # mult=1 routes every row with deg > |set| through the hub path —
    # far past the production threshold, maximal coverage.
    monkeypatch.setenv("GCC_TPU_HUB_MULT", "1")
    hub = run()
    for a, b in zip(base, hub):
        np.testing.assert_array_equal(a, b)


def test_hub_extraction_bit_identical_subgraphs(monkeypatch):
    """Same contract through the gcc_sample_subgraphs entry (generate /
    downstream-task path), including the past-cap e_full count."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler required")
    g, rng = hub_graph(seed=13)
    seeds = rng.integers(0, 5000, 32)
    bud = np.full(32, 128, np.int64)

    def run():
        return native.sample_subgraphs(
            g, seeds, bud, restart_prob=0.8, rng_seed=5,
            node_cap=256, e_cap=192)  # small cap: exercises truncation

    monkeypatch.setenv("GCC_TPU_HUB_MULT", "0")
    base = run()
    monkeypatch.setenv("GCC_TPU_HUB_MULT", "1")
    hub = run()
    for name in ("nodes", "n", "src", "dst", "e", "e_full"):
        np.testing.assert_array_equal(getattr(base, name),
                                      getattr(hub, name), err_msg=name)
    assert base.e_full.max() > 192  # truncation actually exercised


def test_unsorted_graph_never_takes_hub_path(monkeypatch):
    """rows_sorted=False graphs must ignore GCC_TPU_HUB_MULT entirely
    (binary search on an unsorted row would be wrong)."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler required")
    rng = np.random.default_rng(3)
    n, m = 5000, 40000
    src = (n * rng.random(m) ** 3.0).astype(np.int64)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                            symmetrize=True)  # unsorted rows
    seeds = rng.integers(0, n, 32)
    bud = np.full(32, 128, np.int64)

    def run():
        return native.sample_subgraphs(g, seeds, bud, restart_prob=0.8,
                                       rng_seed=5, node_cap=256, e_cap=2048)

    monkeypatch.setenv("GCC_TPU_HUB_MULT", "0")
    base = run()
    monkeypatch.setenv("GCC_TPU_HUB_MULT", "1")
    same = run()
    for name in ("nodes", "n", "src", "dst", "e", "e_full"):
        np.testing.assert_array_equal(getattr(base, name),
                                      getattr(same, name), err_msg=name)


def test_hub_extraction_matches_numpy_oracle(monkeypatch):
    """Hub-path induced edges equal the CSRGraph numpy oracle as an edge
    multiset per subgraph (the oracle and the native path share the
    behavior contract, not RNG streams — compare on the native path's
    own visit sets)."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("native sampler required")
    monkeypatch.setenv("GCC_TPU_HUB_MULT", "1")
    g, rng = hub_graph(seed=21)
    seeds = rng.integers(0, 5000, 16)
    bud = np.full(16, 128, np.int64)
    out = native.sample_subgraphs(g, seeds, bud, restart_prob=0.8,
                                  rng_seed=9, node_cap=256, e_cap=8192)
    for i in range(16):
        nodes = out.nodes[i, :out.n[i]]
        osrc, odst = g.induced_subgraph(nodes)
        got = np.stack([out.src[i, :out.e[i]], out.dst[i, :out.e[i]]])
        want = np.stack([osrc, odst])
        # Multisets of (src, dst) pairs must match exactly.
        got_v = np.sort(got[0].astype(np.int64) * 100000 + got[1])
        want_v = np.sort(want[0].astype(np.int64) * 100000 + want[1])
        np.testing.assert_array_equal(got_v, want_v)
