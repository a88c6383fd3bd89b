#!/usr/bin/env python
"""Sub-ceiling graph-classification transfer benchmark (round 4; the
graph-level companion to role_benchmark.py --bench v2).

The CLI graph-classification flow validated plumbing on a clique/star
fixture that every embedding scores 1.0 on. This benchmark is built to
discriminate: six random-graph FAMILIES with matched mean degree (~8)
and overlapping size ranges (60-120 nodes), plus uniform edge noise —
so separating them requires structure beyond size or average degree
(degree-distribution shape, clustering, community structure, lattice
locality). Frozen GCC entire-graph embeddings (the reference freeze
protocol, generate_graph_embeddings) are scored with the reference's
SVC(C=1e5) 10-fold protocol against a degree-histogram baseline (the
strongest trivial graph feature) and the majority-class floor.

  0 Erdos-Renyi            Poisson degrees, no structure
  1 Barabasi-Albert        heavy-tail degrees
  2 Watts-Strogatz         ring lattice + 20% rewire (high clustering)
  3 random regular         uniform degrees (vs ER: variance only)
  4 planted 2-partition    community structure at ER-like degrees
  5 Holme-Kim              BA + triad closure (heavy tail + clustering)

Usage:
  python scripts/graph_benchmark.py --ckpt saved/<run>/current
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _er(rng, n, d):
    p = d / (n - 1)
    m = rng.random((n, n)) < p
    src, dst = np.nonzero(np.triu(m, 1))
    return src, dst


def _ba(rng, n, m):
    targets = list(range(m))
    src, dst = [], []
    repeated = []
    for v in range(m, n):
        for t in targets:
            src.append(v)
            dst.append(t)
        repeated.extend(targets)
        repeated.extend([v] * m)
        targets = [repeated[i] for i in rng.integers(0, len(repeated), m)]
    return np.array(src), np.array(dst)


def _ws(rng, n, k, p):
    src, dst = [], []
    for v in range(n):
        for j in range(1, k // 2 + 1):
            u = (v + j) % n
            if rng.random() < p:
                u = int(rng.integers(0, n))
            if u != v:
                src.append(v)
                dst.append(u)
    return np.array(src), np.array(dst)


def _regular(rng, n, d):
    stubs = np.repeat(np.arange(n), d)
    for _ in range(10):
        rng.shuffle(stubs)
        src, dst = stubs[0::2], stubs[1::2]
        keep = src != dst
        if keep.mean() > 0.95:
            return src[keep], dst[keep]
    return src[keep], dst[keep]


def _planted(rng, n, d, ratio=3.0):
    half = n // 2
    blocks = (np.arange(n) >= half).astype(int)
    p_out = 2 * d / (n * (1 + ratio))
    p_in = ratio * p_out
    m = rng.random((n, n))
    same = blocks[:, None] == blocks[None, :]
    adj = np.where(same, m < p_in, m < p_out)
    src, dst = np.nonzero(np.triu(adj, 1))
    return src, dst


def _holme_kim(rng, n, m, p_triad=0.5):
    src, dst = _ba(rng, n, m)
    # triad closure: for a fraction of edges, connect a random neighbor
    # pair of the same hub.
    extra_s, extra_d = [], []
    by_node: dict[int, list[int]] = {}
    for s, t in zip(src, dst):
        by_node.setdefault(int(t), []).append(int(s))
    for hub, nbrs in by_node.items():
        if len(nbrs) >= 2:
            for _ in range(int(len(nbrs) * p_triad)):
                a, b = rng.integers(0, len(nbrs), 2)
                if nbrs[a] != nbrs[b]:
                    extra_s.append(nbrs[a])
                    extra_d.append(nbrs[b])
    return (np.concatenate([src, extra_s]).astype(np.int64),
            np.concatenate([dst, extra_d]).astype(np.int64))


def build_graph_benchmark(graphs_per_class=60, seed=0, p_noise=0.05):
    """(graphs, labels): six families, matched mean degree ~8, sizes
    60-120, + `p_noise`·E uniform noise edges per graph."""
    from gcc_tpu.graph.csr import CSRGraph

    rng = np.random.default_rng(seed)
    gens = [
        lambda n: _er(rng, n, 8),
        lambda n: _ba(rng, n, 4),
        lambda n: _ws(rng, n, 8, 0.2),
        lambda n: _regular(rng, n, 8),
        lambda n: _planted(rng, n, 8),
        lambda n: _holme_kim(rng, n, 3),
    ]
    graphs, labels = [], []
    for cls, gen in enumerate(gens):
        for _ in range(graphs_per_class):
            n = int(rng.integers(60, 121))
            src, dst = gen(n)
            e_noise = max(1, int(p_noise * len(src)))
            ns = rng.integers(0, n, e_noise)
            nd = rng.integers(0, n, e_noise)
            keep = ns != nd
            src = np.concatenate([src, ns[keep]])
            dst = np.concatenate([dst, nd[keep]])
            graphs.append(CSRGraph.from_edges(src, dst, num_nodes=n,
                                              symmetrize=True))
            labels.append(cls)
    return graphs, np.array(labels)


def degree_histogram_embeddings(graphs, bins=16):
    """Strongest trivial baseline: normalized log-binned degree
    histogram + [n, e, mean_deg] summary stats."""
    out = np.zeros((len(graphs), bins + 3), np.float64)
    edges = np.unique(np.geomspace(1, 256, bins + 1).astype(int))
    for i, g in enumerate(graphs):
        deg = np.diff(g.indptr)
        h, _ = np.histogram(deg, bins=edges)
        out[i, : len(h)] = h / max(1, len(deg))
        out[i, -3:] = [g.num_nodes / 128.0, g.num_edges / 1024.0,
                       deg.mean() / 16.0]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--graphs-per-class", type=int, default=60)
    ap.add_argument("--n-max", type=int, default=256)
    ap.add_argument("--e-max", type=int, default=8192)
    args = ap.parse_args()

    from types import SimpleNamespace

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.generate import composite_graph_readout, generate_graph_readouts
    from gcc_tpu.tasks.graph_classification import evaluate_graph_embeddings
    from gcc_tpu.training.checkpoint import load_checkpoint, load_config

    _enable_compilation_cache()
    graphs, y = build_graph_benchmark(args.graphs_per_class)
    sizes = [g.num_nodes for g in graphs]
    print(f"graph benchmark: {len(graphs)} graphs, 6 classes, "
          f"sizes {min(sizes)}-{max(sizes)}", flush=True)

    cfg = load_config(os.path.dirname(args.ckpt))
    state = SimpleNamespace(**load_checkpoint(args.ckpt))
    # One encode pass serves both readouts (scripts/graph_readout_ab.py
    # for the full variant sweep): "gcc" = the reference's score
    # protocol; "gcc-composite" = generate's readout="composite".
    ro = generate_graph_readouts(cfg, state, graphs, n_max=args.n_max,
                                 e_max=args.e_max)
    emb = ro["score"]
    comp = composite_graph_readout(ro)
    dh = degree_histogram_embeddings(graphs)
    print("gcc (score)   ", evaluate_graph_embeddings(emb, y), flush=True)
    print("gcc-composite ", evaluate_graph_embeddings(comp, y), flush=True)
    print("degree-hist   ", evaluate_graph_embeddings(dh, y), flush=True)
    # Complementarity probe: does the GCC embedding carry structure the
    # degree histogram lacks (concat beats both), or is it subsumed?
    print("gcc+dh        ", evaluate_graph_embeddings(
        np.concatenate([emb, dh], axis=1), y), flush=True)
    print("composite+dh  ", evaluate_graph_embeddings(
        np.concatenate([comp, dh], axis=1), y), flush=True)
    counts = np.bincount(y)
    print(f"majority    {{'Micro-F1': {counts.max() / counts.sum():.4f}}}",
          flush=True)


if __name__ == "__main__":
    main()
