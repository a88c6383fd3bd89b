"""Task evaluator tests over the real file formats."""

import os

import numpy as np

from gcc_tpu.data.formats import Edgelist, SSDataset, SSSingleDataset
from gcc_tpu.tasks import evaluate_similarity
from gcc_tpu.tasks.similarity_search import SimilaritySearch


def write_panther(root, name, edges, names):
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, f"{name}.graph"), "w") as f:
        f.write(f"{len(set(sum(([a, b] for a, b, _ in edges), [])))} {len(edges)}\n")
        for a, b, t in edges:
            f.write(f"{a} {b} {t}\n")
    with open(os.path.join(root, f"{name}.dict"), "w") as f:
        for author, raw in names:
            f.write(f"{author}\t{raw}\n")


def test_panther_format_multiplicity(tmp_path):
    root = str(tmp_path)
    write_panther(root, "confA", [(10, 11, 3), (11, 12, 1)],
                  [("alice", 10), ("bob", 12)])
    ds = SSSingleDataset(root, "confA")
    g = ds.data.graph
    # 3x multiplicity both directions + 1x both directions = 8 edges.
    assert g.num_edges == 8
    assert list(g.neighbors(0)).count(1) == 3


def test_similarity_search_protocol(tmp_path):
    root = str(tmp_path / "panther")
    write_panther(root, "kdd", [(1, 2, 1), (2, 3, 1)],
                  [("alice", 1), ("bob", 2), ("carol", 3)])
    write_panther(root, "icdm", [(7, 8, 1), (8, 9, 1)],
                  [("alice", 7), ("bob", 8), ("dave", 9)])
    ds = SSDataset(root, "kdd", "icdm")
    d1, d2 = ds.data
    # Identical embeddings for shared authors -> perfect recall.
    emb_1 = np.eye(3, 8)
    emb_2 = np.zeros((3, 8))
    emb_2[d2.names["alice"]] = emb_1[d1.names["alice"]]
    emb_2[d2.names["bob"]] = emb_1[d1.names["bob"]]
    emb_2[d2.names["dave"]] = np.ones(8)
    res = evaluate_similarity(emb_1, emb_2, d1.names, d2.names)
    assert res["Recall @ 20"] == 1.0


def test_similarity_search_task_class(tmp_path):
    root = str(tmp_path)
    panther = os.path.join(root, "panther")
    write_panther(panther, "kdd", [(1, 2, 1)], [("alice", 1), ("bob", 2)])
    write_panther(panther, "icdm", [(5, 6, 1)], [("alice", 5), ("bob", 6)])
    e1 = np.random.default_rng(0).normal(size=(2, 4))
    e2 = e1.copy()
    np.save(os.path.join(root, "e1.npy"), e1)
    np.save(os.path.join(root, "e2.npy"), e2)
    task = SimilaritySearch("kdd", "icdm", 4,
                            emb_path_1=os.path.join(root, "e1.npy"),
                            emb_path_2=os.path.join(root, "e2.npy"),
                            data_root=root)
    res = task.train()
    assert res["Recall @ 20"] == 1.0


def test_edgelist_hindex_binarization(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "hindex_x.edgelist"), "w") as f:
        f.write("1 2\n2 3\n3 4\n")
    with open(os.path.join(root, "hindex_x.nodelabel"), "w") as f:
        f.write("1 5\n2 10\n3 20\n4 40\n")
    ds = Edgelist(root, "hindex_x")
    y = ds.data.y
    assert y.shape == (4, 2)
    # median of [5,10,20,40] = 15 -> labels [0,0,1,1]
    np.testing.assert_array_equal(y.argmax(1), [0, 0, 1, 1])


def test_similarity_search_baseline_model(tmp_path):
    """Classical-model path (reference scripts/similarity_search/baseline.sh):
    the task trains the baseline embedder on each graph directly."""
    root = str(tmp_path)
    panther = os.path.join(root, "panther")
    edges = [(i, i + 1, 1) for i in range(1, 8)] + [(1, 8, 1)]
    names = [(f"a{i}", i) for i in range(1, 9)]
    write_panther(panther, "kdd", edges, names)
    write_panther(panther, "icdm", edges, names)
    task = SimilaritySearch("kdd", "icdm", 4, model="prone", data_root=root)
    res = task.train()
    # Identical graphs + deterministic embedder -> shared authors retrieve
    # themselves perfectly.
    assert res["Recall @ 20"] == 1.0
