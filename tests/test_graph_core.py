"""Unit tests for CSRGraph and PaddedSubgraphBatch."""

import numpy as np
import pytest

from gcc_tpu.config import TrainConfig
from gcc_tpu.graph.batch import Subgraph, batch_subgraphs, pick_bucket
from gcc_tpu.graph.csr import CSRGraph, largest_connected_component


def toy_graph():
    # 0-1, 0-2, 1-2, 3-4 (undirected), node 5 isolated.
    src = [0, 0, 1, 3]
    dst = [1, 2, 2, 4]
    return CSRGraph.from_edges(src, dst, num_nodes=6, symmetrize=True)


def test_csr_basics():
    g = toy_graph()
    assert g.num_nodes == 6
    assert g.num_edges == 8
    np.testing.assert_array_equal(g.out_degrees(), [2, 2, 2, 1, 1, 0])
    np.testing.assert_array_equal(g.in_degrees(), g.out_degrees())
    assert set(g.neighbors(0)) == {1, 2}
    assert set(g.neighbors(4)) == {3}


def test_csr_multi_edges_kept():
    g = CSRGraph.from_edges([0, 0, 0], [1, 1, 2], num_nodes=3)
    assert g.num_edges == 3
    assert list(g.neighbors(0)).count(1) == 2


def test_induced_subgraph_relabels_and_preserves_order():
    g = toy_graph()
    sub_src, sub_dst = g.induced_subgraph(np.array([2, 0, 1]))
    # node 2 -> 0, node 0 -> 1, node 1 -> 2; all 6 directed edges kept.
    edges = set(zip(sub_src.tolist(), sub_dst.tolist()))
    assert edges == {(1, 2), (1, 0), (2, 0), (2, 1), (0, 1), (0, 2)}


def test_induced_subgraph_excludes_outside():
    g = toy_graph()
    sub_src, sub_dst = g.induced_subgraph(np.array([0, 3]))
    assert len(sub_src) == 0  # 0 and 3 are not adjacent


def test_largest_cc():
    g = toy_graph()
    cc = largest_connected_component(g)
    assert set(cc.tolist()) == {0, 1, 2}


def test_pick_bucket():
    assert pick_bucket(33, 100) == (64, 128)
    assert pick_bucket(32, 64) == (32, 64)
    with pytest.raises(ValueError):
        pick_bucket(10**9, 1)


def test_batch_subgraphs_layout():
    g1 = Subgraph(src=np.array([0, 1], np.int32), dst=np.array([1, 0], np.int32),
                  num_nodes=2)
    g2 = Subgraph(src=np.array([0, 1, 2], np.int32),
                  dst=np.array([1, 2, 0], np.int32), num_nodes=3, seed=2)
    batch = batch_subgraphs([g1, g2], n_max=4, e_max=4)
    assert batch.batch_size == 2 and batch.n_max == 4 and batch.e_max == 4
    es = np.asarray(batch.edges_src).reshape(2, 4)
    ed = np.asarray(batch.edges_dst).reshape(2, 4)
    ew = np.asarray(batch.edge_weight).reshape(2, 4)
    # Graph 1 at flat offset 0, graph 2 at offset 4.
    np.testing.assert_array_equal(es[0], [0, 1, 0, 0])
    np.testing.assert_array_equal(ed[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(es[1], [4, 5, 6, 4])
    np.testing.assert_array_equal(ed[1], [5, 6, 4, 4])
    np.testing.assert_array_equal(ew[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(batch.node_mask)[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(batch.seed_flag)[1], [0, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(batch.n_nodes), [2, 3])


def test_batch_is_pytree():
    import jax

    g = Subgraph(src=np.array([0], np.int32), dst=np.array([0], np.int32),
                 num_nodes=1)
    batch = batch_subgraphs([g], n_max=4, e_max=4)
    leaves = jax.tree_util.tree_leaves(batch)
    assert len(leaves) == 6


def test_config_roundtrip():
    cfg = TrainConfig(batch_size=64)
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert "bsz_64" in cfg.run_name()


def test_wire_batch_expand_matches_batch_subgraphs():
    import jax
    import numpy as np
    from gcc_tpu.graph.batch import (
        Subgraph, batch_subgraphs, expand_wire, wire_from_arrays,
    )

    rng = np.random.default_rng(0)
    subs = []
    srcs = np.zeros((3, 8), np.int32)
    dsts = np.zeros((3, 8), np.int32)
    ns = np.zeros(3, np.int32)
    es = np.zeros(3, np.int32)
    for i in range(3):
        n = int(rng.integers(2, 5))
        e = int(rng.integers(1, 7))
        s = rng.integers(0, n, e).astype(np.int32)
        d = rng.integers(0, n, e).astype(np.int32)
        subs.append(Subgraph(src=s, dst=d, num_nodes=n))
        srcs[i, :e] = s
        dsts[i, :e] = d
        ns[i], es[i] = n, e
    ref = batch_subgraphs(subs, n_max=8, e_max=8)
    wire = wire_from_arrays(srcs, dsts, ns, es)
    got = jax.jit(lambda w: expand_wire(w, 8))(wire)
    for field in ("edges_src", "edges_dst", "edge_weight", "node_mask",
                  "seed_flag", "n_nodes"):
        a = np.asarray(getattr(got, field))
        b = np.asarray(getattr(ref, field))
        # Padding edge endpoints may differ (base vs 0+base) — compare
        # only where weight is nonzero for edge arrays.
        if field in ("edges_src", "edges_dst"):
            w = np.asarray(ref.edge_weight) > 0
            np.testing.assert_array_equal(a[w], b[w])
        else:
            np.testing.assert_array_equal(a, b)


def test_wire_from_arrays_truncates_columns():
    import numpy as np
    from gcc_tpu.graph.batch import wire_from_arrays

    src = np.arange(12, dtype=np.int32).reshape(2, 6)
    wire = wire_from_arrays(src, src, np.array([3, 3]), np.array([6, 2]),
                            e_max=4)
    assert wire.src.shape == (2, 4)
    assert wire.n_edges.tolist() == [4, 2]


def test_compact_rows_native_matches_numpy():
    from gcc_tpu.sampling import native

    rng = np.random.default_rng(0)
    rows, e_cap = 6, 16
    src = rng.integers(0, 30, (rows, e_cap)).astype(np.int16)
    dst = rng.integers(0, 30, (rows, e_cap)).astype(np.int16)
    e = np.array([3, 16, 0, 7, 16, 5], np.int32)
    for cap in (64, 30, 10):
        got = native.compact_rows(src, dst, e, cap)
        # independent numpy reference
        exp_src, exp_dst, off, e_exp = (
            np.zeros(cap, np.int16), np.zeros(cap, np.int16), 0, [])
        for i in range(rows):
            take = min(int(e[i]), cap - off)
            exp_src[off:off + take] = src[i, :take]
            exp_dst[off:off + take] = dst[i, :take]
            e_exp.append(take)
            off += take
        np.testing.assert_array_equal(got[0], exp_src)
        np.testing.assert_array_equal(got[1], exp_dst)
        np.testing.assert_array_equal(got[2], e_exp)
        assert got[3] == off


def test_expand_compact_matches_expand_wire():
    """CompactWireBatch expansion reproduces the padded batch exactly
    when nothing is truncated."""
    import jax

    from gcc_tpu.graph.batch import (
        CompactWireBatch, WireBatch, expand_compact, expand_wire,
    )
    from gcc_tpu.sampling import native

    rng = np.random.default_rng(1)
    b, e_max, n_max = 4, 32, 16
    n = np.array([5, 16, 2, 9], np.int32)
    e = np.array([12, 32, 1, 20], np.int32)
    src = np.zeros((b, e_max), np.int16)
    dst = np.zeros((b, e_max), np.int16)
    for i in range(b):
        src[i, :e[i]] = rng.integers(0, n[i], e[i])
        dst[i, :e[i]] = rng.integers(0, n[i], e[i])
    seed_pos = np.zeros(b, np.int32)
    wire = WireBatch(src=src, dst=dst, n_nodes=n, n_edges=e,
                     seed_pos=seed_pos)
    c_src, c_dst, c_e, total = native.compact_rows(src, dst, e, int(e.sum()))
    from gcc_tpu.graph.batch import pack_edge_ids

    packed, id_bits = pack_edge_ids(c_src, c_dst, n_max)
    cw = CompactWireBatch(edges=packed, meta=np.stack([n, c_e, seed_pos]),
                          e_max=e_max, id_bits=id_bits)
    p1 = expand_wire(wire, n_max)
    p2 = expand_compact(cw, n_max)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_expand_compact_int32_packing():
    """Buckets with local ids > 255 pack as int32 (16+16 bits) and
    round-trip exactly."""
    import jax

    from gcc_tpu.graph.batch import (
        CompactWireBatch, WireBatch, expand_compact, expand_wire,
        pack_edge_ids,
    )
    from gcc_tpu.sampling import native

    rng = np.random.default_rng(7)
    b, e_max, n_max = 3, 64, 512
    n = np.array([400, 512, 3], np.int32)
    e = np.array([40, 64, 2], np.int32)
    src = np.zeros((b, e_max), np.int16)
    dst = np.zeros((b, e_max), np.int16)
    for i in range(b):
        src[i, :e[i]] = rng.integers(0, n[i], e[i])
        dst[i, :e[i]] = rng.integers(0, n[i], e[i])
    seed_pos = np.zeros(b, np.int32)
    c_src, c_dst, c_e, _ = native.compact_rows(src, dst, e, int(e.sum()))
    packed, id_bits = pack_edge_ids(c_src, c_dst, n_max)
    assert id_bits == 16 and packed.dtype == np.int32
    cw = CompactWireBatch(edges=packed, meta=np.stack([n, c_e, seed_pos]),
                          e_max=e_max, id_bits=id_bits)
    p1 = expand_wire(WireBatch(src=src, dst=dst, n_nodes=n, n_edges=e,
                               seed_pos=seed_pos), n_max)
    p2 = expand_compact(cw, n_max)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_corpus_rows_sorted_roundtrip(tmp_path):
    """The rows_sorted manifest flag must survive create/open/load — it
    gates the native hub extraction, so dropping it silently disables
    the miss-bound-scale win; setting it falsely would corrupt edges."""
    import numpy as np

    from gcc_tpu.graph.corpus import CorpusStore
    from gcc_tpu.graph.csr import CSRGraph

    rng = np.random.default_rng(0)
    src = rng.integers(0, 100, 500)
    dst = rng.integers(0, 100, 500)
    keep = src != dst
    g_sorted = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=100,
                                   symmetrize=True, sort_rows=True)
    g_unsorted = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=100,
                                     symmetrize=True)

    d1 = str(tmp_path / "sorted")
    CorpusStore.create(d1, [g_sorted, g_sorted])
    st = CorpusStore.open(d1)
    assert st.manifest.get("rows_sorted") is True
    assert st.load(0).rows_sorted

    d2 = str(tmp_path / "mixed")
    CorpusStore.create(d2, [g_sorted, g_unsorted])
    st2 = CorpusStore.open(d2)
    assert not st2.manifest.get("rows_sorted", False)
    assert not st2.load(0).rows_sorted
