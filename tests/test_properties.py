"""Property-based fuzzing of sampler/batching invariants (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.sampling import native_available, sample_subgraphs


graph_strategy = st.tuples(
    st.integers(min_value=2, max_value=60),          # nodes
    st.integers(min_value=0, max_value=200),         # edges
    st.integers(min_value=0, max_value=2**31 - 1),   # seed
)


def build_graph(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)


@settings(max_examples=60, deadline=None)
@given(graph_strategy, st.integers(0, 2**31 - 1),
       st.integers(1, 64), st.integers(4, 64))
def test_sampler_invariants(gparams, rng_seed, budget, node_cap):
    g = build_graph(*gparams)
    seeds = np.arange(min(4, g.num_nodes))
    out = sample_subgraphs(
        g, seeds, np.full(len(seeds), budget), rng_seed=rng_seed,
        node_cap=node_cap, e_cap=node_cap * 8,
    )
    for i, seed in enumerate(seeds):
        n_i, e_i = int(out.n[i]), int(out.e[i])
        # Seed first, node count within caps.
        assert out.nodes[i, 0] == seed
        assert 1 <= n_i <= node_cap
        # Local edge endpoints within the subgraph.
        if e_i:
            assert out.src[i, :e_i].max() < n_i
            assert out.dst[i, :e_i].max() < n_i
        # Edges are real edges of g.
        nodes = out.nodes[i, :n_i]
        edge_set = {(int(a), int(b))
                    for a in nodes for b in g.neighbors(int(a))}
        for a, b in zip(out.src[i, :e_i], out.dst[i, :e_i]):
            assert (int(nodes[a]), int(nodes[b])) in edge_set


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 6), st.integers(0, 2**31 - 1))
def test_wire_roundtrip_property(bsz, seed):
    import jax

    from gcc_tpu.graph.batch import (
        Subgraph, batch_subgraphs, expand_wire, wire_from_arrays,
    )

    rng = np.random.default_rng(seed)
    n_max, e_max = 8, 16
    subs, srcs, dsts, ns, es = [], [], [], [], []
    for _ in range(bsz):
        n = int(rng.integers(1, n_max + 1))
        e = int(rng.integers(0, e_max + 1))
        s = rng.integers(0, n, e).astype(np.int32)
        d = rng.integers(0, n, e).astype(np.int32)
        subs.append(Subgraph(src=s, dst=d, num_nodes=n))
        row_s = np.zeros(e_max, np.int32)
        row_d = np.zeros(e_max, np.int32)
        row_s[:e], row_d[:e] = s, d
        srcs.append(row_s)
        dsts.append(row_d)
        ns.append(n)
        es.append(e)
    ref = batch_subgraphs(subs, n_max=n_max, e_max=e_max)
    wire = wire_from_arrays(np.stack(srcs), np.stack(dsts),
                            np.array(ns), np.array(es))
    got = expand_wire(wire, n_max)
    w = np.asarray(ref.edge_weight) > 0
    np.testing.assert_array_equal(np.asarray(got.edge_weight),
                                  np.asarray(ref.edge_weight))
    np.testing.assert_array_equal(np.asarray(got.edges_src)[w],
                                  np.asarray(ref.edges_src)[w])
    np.testing.assert_array_equal(np.asarray(got.edges_dst)[w],
                                  np.asarray(ref.edges_dst)[w])
    np.testing.assert_array_equal(np.asarray(got.node_mask),
                                  np.asarray(ref.node_mask))
