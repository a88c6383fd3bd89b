#!/usr/bin/env python
"""A/B the hub-row binary-search extraction on the reference-scale corpus.

Pure host (never touches the chip). The corpus must be the SORTED-rows
build (graph/corpus.synthetic_corpus_reference_scale, sort_rows=True) so
that every arm samples identical trajectories — the only difference
between arms is GCC_TPU_HUB_MULT, i.e. which rows take the binary-search
path instead of the full scan (csrc/sampler.cpp extract_row_hub).

Arms: a threshold-multiplier sweep at 1 thread, then the winner and the
scan baseline at 2 threads (the production setting for miss-bound
corpora — docs/PERF.md round-5 refscale verdict 3). The sweep is a
COARSE single-trial frontier scan (the host shares 2 cores with the
relay, so near-tied multipliers can swap order run-to-run); the
recorded verdict comes from a paired interleaved A/B of the winner vs
mult=0 with the walk phase as a drift control (docs/PERF.md). A warm
pass runs first so the scan baseline doesn't absorb the corpus mmap's
cold page-cache faults.

Usage: timeout 7200 python scripts/hub_ab.py [--pairs 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2048)
    ap.add_argument("--final-pairs", type=int, default=4096)
    ap.add_argument("--corpus", default="/tmp/gcc_tpu_corpus_refscale")
    ap.add_argument("--mults", default="0,2,4,8,16,64")
    ap.add_argument("--out", default="/tmp/hub_ab.json")
    args = ap.parse_args()

    from refscale_bench import bench_corpus  # noqa: E402 (sibling script)
    from gcc_tpu.graph.corpus import CorpusStore

    store = CorpusStore.open(args.corpus)
    assert store.manifest.get("rows_sorted"), (
        "hub A/B requires the sorted-rows corpus build")

    results = {}

    def run(mult: int, threads: int, pairs: int) -> dict:
        os.environ["GCC_TPU_HUB_MULT"] = str(mult)
        r = bench_corpus(args.corpus, pairs, threads=threads)
        ns = r["native_stats"]
        sub = max(ns.get("subgraphs", 0), 1)
        row = {
            "ms_per_batch_pair": r["ms_per_batch_pair_32"],
            "walk_us_per_sg": round(ns["walk_ns"] / sub / 1e3, 2),
            "extract_us_per_sg": round(ns["extract_ns"] / sub / 1e3, 2),
            "host_ceiling_msgs_per_s": r["host_ceiling_edge_msgs_per_s"],
            "pairs": pairs,
        }
        key = f"mult{mult}_t{threads}"
        results[key] = row
        print(json.dumps({key: row}), flush=True)
        return row

    mults = [int(m) for m in args.mults.split(",")]
    # Warm the corpus mmap (discarded): the first pass after a build
    # pays cold page faults (walk 9 -> 47 us/sg observed — CLAUDE.md).
    os.environ["GCC_TPU_HUB_MULT"] = "0"
    bench_corpus(args.corpus, max(256, args.pairs // 8), threads=1)
    for m in mults:
        run(m, threads=1, pairs=args.pairs)
    best = min((m for m in mults),
               key=lambda m: results[f"mult{m}_t1"]["ms_per_batch_pair"])
    print(f"sweep winner: mult={best}", flush=True)
    run(0, threads=2, pairs=args.final_pairs)
    if best != 0:
        run(best, threads=2, pairs=args.final_pairs)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
