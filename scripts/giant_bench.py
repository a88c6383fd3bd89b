#!/usr/bin/env python
"""Giant-path throughput artifact (VERDICT r4 item 8 → GIANT_r05.json).

The giant door (generate → parallel/giant_features.giant_graph_embedding:
partitioned whole-graph PE + giant GIN encode) is oracle-tested and
CLI-reachable, but its performance existed only as diag tables. This
records a small tracked artifact so the flagship beyond-reference
capability gets the same cross-round regression tracking as the train
step:

  * 50k-node heavy-tailed graph, end-to-end giant_graph_embedding wall
    (includes host partition build + the PE solve at eval guards) and a
    second call at the same shape (program cached — the marginal cost
    per additional graph of that size),
  * edge-messages/s through the 4 GIN aggregation layers for the encode.

Single chip (part=1 mesh) — the ICI story is validated by the driver's
multi-chip dryrun; this pins the single-chip envelope.

Usage: timeout 5400 python scripts/giant_bench.py [--nodes 50000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--avg-degree", type=int, default=12)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--out", default="GIANT_r05.json")
    args = ap.parse_args()

    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import TrainConfig
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.graph.csr import CSRGraph
    from gcc_tpu.models import GraphEncoder
    from gcc_tpu.parallel.giant_features import giant_graph_embedding
    from gcc_tpu.parallel.mesh import make_mesh
    from types import SimpleNamespace

    rng = np.random.default_rng(0)
    n = args.nodes
    m = n * args.avg_degree // 2
    src = (n * rng.random(m) ** 2.0).astype(np.int64)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                            symmetrize=True)
    print(f"graph: {g.num_nodes} nodes, {g.num_edges} edges", flush=True)

    cfg = TrainConfig()
    enc = GraphEncoder(cfg.encoder)
    toy_src = rng.integers(0, 24, 96).astype(np.int32)
    toy_dst = rng.integers(0, 24, 96).astype(np.int32)
    toy = batch_subgraphs([Subgraph(src=toy_src, dst=toy_dst, num_nodes=24)],
                          n_max=32, e_max=256)
    feats = jax.jit(
        lambda b: featurize_batch(b, cfg.encoder.positional_embedding_size)
    )(toy)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    state = SimpleNamespace(params=variables["params"],
                            batch_stats=variables["batch_stats"])
    mesh = make_mesh(data=1, part=len(jax.devices()))

    t0 = time.time()
    emb = giant_graph_embedding(cfg.encoder, state.params,
                                state.batch_stats, g, mesh,
                                iters=args.iters)
    first_s = time.time() - t0
    assert np.isfinite(emb).all()
    print(f"first encode (incl. compiles): {first_s:.1f}s", flush=True)

    warm = []
    for _ in range(3):
        t0 = time.time()
        emb = giant_graph_embedding(cfg.encoder, state.params,
                                    state.batch_stats, g, mesh,
                                    iters=args.iters)
        warm.append(time.time() - t0)
    warm.sort()
    warm_s = warm[len(warm) // 2]
    layers = cfg.encoder.num_layers - 1
    out = {
        "metric": "giant_encode_ms",
        "nodes": g.num_nodes,
        "edges": g.num_edges,
        "pe_iters": args.iters,
        "first_encode_s": round(first_s, 2),
        "warm_encode_s": round(warm_s, 3),
        "warm_trials_s": [round(t, 3) for t in warm],
        "edge_msgs_per_s_encode": round(g.num_edges * layers / warm_s, 1),
        "devices": len(jax.devices()),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
