"""Classical baseline embedder tests (ProNE, GraphWave, adapters)."""

import numpy as np
import pytest

from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.models.emb import build_model
from gcc_tpu.tasks import evaluate_node_embeddings
from tests.test_e2e_pipeline import community_graph


def test_registry_names():
    from gcc_tpu.models.emb import REGISTRY

    assert set(REGISTRY) == {
        "zero", "from_numpy", "from_numpy_align", "from_numpy_graph",
        "prone", "graphwave",
    }


def test_zero_baseline():
    g = CSRGraph.from_edges([0, 1], [1, 2], symmetrize=True)
    emb = build_model("zero", 8).train(g)
    assert emb.shape == (3, 8) and emb.sum() == 0


def test_prone_beats_chance_on_community_graph():
    g, y = community_graph()
    emb = build_model("prone", 16).train(g)
    assert emb.shape == (g.num_nodes, 16)
    assert np.isfinite(emb).all()
    res = evaluate_node_embeddings(emb, y)
    assert res["Micro-F1"] > 0.6, res


def test_graphwave_chebyshev_matches_expm():
    from scipy.linalg import expm

    from gcc_tpu.models.emb.graphwave import _chebyshev_heat, _lanczos_lmax
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 20
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                            symmetrize=True)
    adj = sp.csr_matrix(
        (np.ones(g.num_edges), g.indices.astype(np.int64), g.indptr),
        shape=(n, n))
    deg = np.asarray(adj.sum(axis=1)).ravel()
    lap = sp.diags(deg) - adj
    lmax = _lanczos_lmax(lap)
    approx = _chebyshev_heat(lap, 0.5, lmax, order=40)
    exact = expm(-0.5 * lap.toarray())
    np.testing.assert_allclose(approx, exact, atol=1e-5)


def test_graphwave_structural_embedding():
    g, y = community_graph()
    emb = build_model("graphwave", 16, scales=(2.0, 5.0)).train(g)
    assert emb.shape == (g.num_nodes, 16)
    assert np.isfinite(emb).all()
    res = evaluate_node_embeddings(emb, y)
    assert res["Micro-F1"] > 0.55, res


def test_from_numpy_adapters(tmp_path):
    g = CSRGraph.from_edges([0, 1], [1, 2], symmetrize=True)
    emb = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "e.npy")
    np.save(p, emb)
    out = build_model("from_numpy", 4, emb_path=p).train(g)
    np.testing.assert_array_equal(out, emb)
    out2 = build_model("from_numpy_graph", 4, emb_path=p).train(None)
    np.testing.assert_array_equal(out2, emb)

    g2 = CSRGraph.from_edges([0, 1, 2], [1, 2, 3], symmetrize=True)
    emb2 = np.ones((4, 4))
    p2 = str(tmp_path / "e2.npy")
    np.save(p2, emb2)
    align = build_model("from_numpy_align", 4, emb_path_1=p, emb_path_2=p2)
    np.testing.assert_array_equal(align.train(g), emb)
    np.testing.assert_array_equal(align.train(g2), emb2)
