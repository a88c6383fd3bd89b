#!/usr/bin/env python
"""Host sampling benchmark at the reference's corpus scale (VERDICT r4
item 3).

Pure host — never imports jax, never touches the chip — so it can
measure the sampler wall (the production bottleneck once the device
step hid under 0.64 ms) without relay contention. Runs the production
pipeline (C++ RWR walk → induced-edge extract → compact-wire pack,
routed emission, bench.py config) against two corpora:

  small     the 6 × ~100k-node bench corpus — CSR fits in LLC; this is
            the regime every recorded sampler number was measured in.
  refscale  graph/corpus.synthetic_corpus_reference_scale — the
            reference's published corpus shape (LiveJournal-class 4.8M
            nodes; ~150M edges total): visit-word and adjacency probes
            are cache MISSES.

Reports per-corpus pair rates, per-phase native counters
(walk/extract/pack ns), and their ratio — the measured cost of the
LLC assumption breaking. JSON artifact for the round record.

Usage: timeout 3600 python scripts/refscale_bench.py [--pairs 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_corpus(corpus_dir: str, pairs_target: int, super_batch: int = 64,
                 threads: int = 1) -> dict:
    from gcc_tpu.config import SamplerConfig
    from gcc_tpu.graph.corpus import CorpusStore
    from gcc_tpu.sampling import native
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline

    store = CorpusStore.open(corpus_dir)
    pcfg = PipelineConfig(
        batch_size=32, n_max=256, e_max=2048, num_samples=1_000_000,
        num_workers=0, emit="routed", super_batch=super_batch, n_small=128,
        threads_per_worker=threads,
    )
    scfg = SamplerConfig(rw_hops=256)
    with PretrainPipeline(store, scfg, pcfg, seed=0) as pipe:
        # Warm: touches the mmap'd CSR + builds seed CDFs.
        for _ in range(2):
            next(pipe)
        native.sampler_stats(reset=True)
        t0 = time.time()
        pairs = 0
        edges = 0
        while pairs < pairs_target:
            sq, sk = next(pipe)
            s = sq.meta.shape[0]
            pairs += s * sq.meta.shape[2]
            edges += int(sq.meta[:, 1, :].sum(dtype=np.int64))
            edges += int(sk.meta[:, 1, :].sum(dtype=np.int64))
        dt = time.time() - t0
        stats = native.sampler_stats()
    return {
        "corpus": corpus_dir,
        "graphs": store.num_graphs,
        "total_nodes": int(sum(store.graph_sizes)),
        "total_edges": int(sum(g["num_edges"]
                               for g in store.manifest["graphs"])),
        "pairs": pairs,
        "seconds": round(dt, 3),
        "pairs_per_s": round(pairs / dt, 1),
        "ms_per_batch_pair_32": round(dt / (pairs / 32) * 1e3, 3),
        "subgraph_edges": edges,
        "host_ceiling_edge_msgs_per_s": round(edges * 4 / dt, 1),
        "native_stats": stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--small-corpus", default="/tmp/gcc_tpu_bench_corpus")
    ap.add_argument("--refscale-corpus",
                    default="/tmp/gcc_tpu_corpus_refscale")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--out", default="REFSCALE_r05.json")
    args = ap.parse_args()

    from gcc_tpu.graph.corpus import (synthetic_corpus,
                                      synthetic_corpus_reference_scale)

    if not os.path.exists(os.path.join(args.small_corpus, "manifest.json")):
        synthetic_corpus(args.small_corpus, num_graphs=6,
                         nodes_per_graph=100_000, avg_degree=12, seed=0)
    manifest_path = os.path.join(args.refscale_corpus, "manifest.json")
    rebuild = not os.path.exists(manifest_path)
    if not rebuild:
        with open(manifest_path) as f:
            if not json.load(f).get("rows_sorted", False):
                # A pre-round-5 (unsorted) corpus would silently bench the
                # scan-only path — not comparable to the recorded
                # sorted+hub numbers. Rebuild rather than mis-measure.
                print("refscale corpus lacks rows_sorted — rebuilding "
                      "sorted (pre-round-5 build found)", flush=True)
                rebuild = True
    if rebuild:
        print("building reference-scale corpus (~150M edges, minutes)...",
              flush=True)
        t0 = time.time()
        synthetic_corpus_reference_scale(args.refscale_corpus, seed=0)
        print(f"built in {time.time() - t0:.0f}s", flush=True)

    out = {}
    for name, corpus in (("small", args.small_corpus),
                         ("refscale", args.refscale_corpus)):
        print(f"benching {name} ({corpus})...", flush=True)
        out[name] = bench_corpus(corpus, args.pairs, threads=args.threads)
        print(json.dumps(out[name], indent=1), flush=True)
    # Production setting for miss-bound corpora (docs/PERF.md round-5
    # verdict 3: the second core pays for itself at reference scale).
    if args.threads != 2:
        print("benching refscale_t2...", flush=True)
        out["refscale_t2"] = bench_corpus(args.refscale_corpus, args.pairs,
                                          threads=2)
        print(json.dumps(out["refscale_t2"], indent=1), flush=True)
    else:
        out["refscale_t2"] = out["refscale"]
    out["refscale_over_small_ms_ratio"] = round(
        out["refscale"]["ms_per_batch_pair_32"]
        / out["small"]["ms_per_batch_pair_32"], 3)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: refscale/small batch-pair cost ratio "
          f"{out['refscale_over_small_ms_ratio']}", flush=True)


if __name__ == "__main__":
    main()
