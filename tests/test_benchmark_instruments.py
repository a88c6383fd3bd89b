"""Pin the sub-ceiling benchmark instruments (VERDICT r4 item 7).

All round-4+ accuracy A/Bs are adjudicated on two script-level
instruments — the 9-class role benchmark v2 (scripts/role_benchmark.py)
and the 6-family graph-classification benchmark
(scripts/graph_benchmark.py). A silent change to a family generator or
the scoring protocol would re-anchor every past and future comparison,
so these tests freeze the fixtures (exact node/edge counts, label
distributions, a content hash of the frozen-seed edge lists) and the
degree-histogram baseline's score window (a drift in the SVC protocol
or the histogram featurization moves it out of [0.75, 0.88] — it
measured 0.8028 when the instrument was calibrated, docs/PERF.md
"graph-classification transfer benchmark").
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))

from graph_benchmark import (  # noqa: E402
    build_graph_benchmark,
    degree_histogram_embeddings,
)
from role_benchmark import build_role_graph_v2  # noqa: E402


def test_role_v2_fixture_frozen():
    g, y = build_role_graph_v2()
    assert g.num_nodes == 6307
    assert g.num_edges == 19762
    labels = y.argmax(axis=1)
    np.testing.assert_array_equal(
        np.bincount(labels),
        [705, 838, 120, 770, 971, 983, 360, 480, 1080],
    )
    h = hashlib.sha256(g.indptr.tobytes() + g.indices.tobytes()).hexdigest()
    assert h[:16] == "fcf2d5d7f2d77871", (
        "role-v2 graph content changed — every past A/B on this "
        "instrument is re-anchored; bump deliberately with a PERF.md "
        "recalibration entry")
    # Majority-class chance floor the calibration table quotes.
    assert abs(np.bincount(labels).max() / g.num_nodes - 0.171) < 0.002


def test_graph_benchmark_fixture_frozen():
    graphs, y = build_graph_benchmark(60)
    assert len(graphs) == 360
    np.testing.assert_array_equal(np.bincount(y), [60] * 6)
    sizes = np.array([g.num_nodes for g in graphs])
    assert sizes.min() >= 60 and sizes.max() <= 120
    assert int(sizes.sum()) == 31841
    assert int(sum(g.num_edges for g in graphs)) == 263428
    h = hashlib.sha256(
        b"".join(g.indices.tobytes() for g in graphs)).hexdigest()
    assert h[:16] == "51a2967aad3ce4d2", (
        "graph-benchmark families changed — recalibrate (docs/PERF.md) "
        "before trusting any cross-round comparison")


def test_graph_benchmark_degree_hist_baseline_window():
    """The trivial-baseline score anchors the instrument's difficulty:
    too low = families became degree-separable noise, too high = the
    benchmark saturated for histogram features. Calibrated 0.8028."""
    graphs, y = build_graph_benchmark(60)
    dh = degree_histogram_embeddings(graphs)
    from gcc_tpu.tasks.graph_classification import evaluate_graph_embeddings

    f1 = evaluate_graph_embeddings(dh, y)["Micro-F1"]
    assert 0.75 < f1 < 0.88, f1


def test_evaluate_standardize_is_fold_local():
    """standardize=True must fit the scaler on train folds only: a
    constant-label scaling probe — test fold features shifted by a huge
    offset — still classifies correctly iff the scaler transfers the
    TRAIN statistics (global fitting would re-center the test fold and
    mask the offset)."""
    from gcc_tpu.tasks.graph_classification import evaluate_graph_embeddings

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 4))
    ylab = (x[:, 0] > 0).astype(int)
    base = evaluate_graph_embeddings(x, ylab, standardize=True)["Micro-F1"]
    assert base > 0.9
