#!/usr/bin/env python
"""Graph-level readout composition A/B on the sub-ceiling graph benchmark.

VERDICT r4 item 1: frozen GCC entire-graph embeddings (the reference's
64-d summed-head score, generate.py:33-53) scored 0.717 on the 6-family
graph benchmark — below a trivial 19-d degree histogram (0.803). The
reference's GIN computes richer graph-level quantities that its freeze
protocol never uses: per-layer pooled activations (gin.py:194-231
`all_outputs`, incl. the pooled input features whose degree-embedding
block is a TRAINED degree histogram). This script encodes the benchmark
ONCE (generate_graph_readouts) and scores every readout composition with
the reference SVC(C=1e5) 10-fold protocol, so the variants differ only
in host-side assembly — one chip program, paired evaluation.

Variants (all frozen; no benchmark-side training of GCC weights):
  score          64-d summed-head score (r4 baseline = the reference)
  layercat       concat per-layer pooled conv activations (4x64)
  layercat+in    + pooled input features (49-d: PE + deg-emb + seed)
  *_mean         pooled sums divided by n (size-normalized)
  *_l2           each layer block L2-normalized before concat
  score+layercat the score appended to layercat+in
Each also evaluated with per-fold standardization (StandardScaler fit
on train folds — evaluate_graph_embeddings(standardize=True)), since
pooled-sum magnitudes span orders of magnitude across columns.

Usage:
  python scripts/graph_readout_ab.py --ckpt /tmp/gcc_tpu_pe_ab_100ep/subspace-g0_s0/*/current
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _l2(x, axis=-1):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.where(n == 0, 1.0, n)


def assemble_variants(ro: dict) -> dict[str, np.ndarray]:
    """Readout variants from generate_graph_readouts output."""
    score, pooled, n = ro["score"], ro["pooled"], ro["n_nodes"][:, None]
    conv = pooled[1:]
    v = {
        "score": score,
        "layercat": np.concatenate(conv, axis=1),
        "layercat+in": np.concatenate(pooled, axis=1),
        "layercat_mean": np.concatenate([p / n for p in conv], axis=1),
        "layercat+in_mean": np.concatenate([p / n for p in pooled], axis=1),
        "layercat_l2": np.concatenate([_l2(p) for p in conv], axis=1),
        "layercat+in_l2": np.concatenate([_l2(p) for p in pooled], axis=1),
        "in_pooled": pooled[0],
        "in_pooled_mean": pooled[0] / n,
    }
    v["score+layercat"] = np.concatenate([score, v["layercat+in"]], axis=1)
    v["sum+mean"] = np.concatenate(
        [v["layercat+in"], v["layercat+in_mean"]], axis=1)
    # Composites of the strongest blocks (first sweep, docs/PERF.md
    # "graph readout"): the mean-pooled INPUT features (trained
    # degree-embedding row + PE sums — 0.8194 alone) carry the degree
    # law; per-layer L2'd conv sums (0.7694) carry the learned
    # structure with magnitudes equalized so neither block drowns.
    from gcc_tpu.generate import composite_graph_readout

    v["inmean+convl2"] = composite_graph_readout(ro)  # == the library's
    #           readout="composite" door (single definition, no drift)
    v["inmean+convmean"] = np.concatenate([p / n for p in pooled], axis=1)
    v["insum+inmean+convl2"] = np.concatenate(
        [pooled[0], pooled[0] / n] + [_l2(p) for p in conv], axis=1)
    v["inmean+convl2+score"] = np.concatenate(
        [pooled[0] / n] + [_l2(p) for p in conv] + [score], axis=1)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, nargs="+",
                    help="checkpoint glob(s); several checkpoints at one "
                         "encoder config share one compiled encode program")
    ap.add_argument("--graphs-per-class", type=int, default=60)
    ap.add_argument("--n-max", type=int, default=256)
    ap.add_argument("--e-max", type=int, default=8192)
    ap.add_argument("--out", default="/tmp/gcc_tpu_graph_readout_ab.json")
    ap.add_argument("--cache", default="/tmp/gcc_tpu_graph_readouts.npz",
                    help="npz cache of the chip encode pass; when present "
                         "the whole sweep runs host-only (variant "
                         "iteration never re-touches the chip)")
    ap.add_argument("--full", action="store_true",
                    help="full variant grid (default: the headline set "
                         "— score/composite/layercat/in_pooled_mean)")
    args = ap.parse_args()
    ckpts = sorted(set(sum((glob.glob(p) for p in args.ckpt), [])))
    if not ckpts:
        sys.exit(f"no checkpoint matches {args.ckpt}")

    from graph_benchmark import build_graph_benchmark, degree_histogram_embeddings

    from gcc_tpu.tasks.graph_classification import evaluate_graph_embeddings

    graphs, y = build_graph_benchmark(args.graphs_per_class)
    print(f"benchmark: {len(graphs)} graphs, 6 classes, "
          f"{len(ckpts)} ckpt(s)", flush=True)
    dh = degree_histogram_embeddings(graphs)
    counts = np.bincount(y)

    def get_readouts(ckpt):
        if len(ckpts) == 1 and args.cache and os.path.exists(args.cache):
            z = np.load(args.cache)
            if z["ckpt"] != ckpt:
                sys.exit(f"cache {args.cache} is for {z['ckpt']}, not "
                         f"{ckpt} — delete it to re-encode")
            print(f"loaded cached readouts from {args.cache}", flush=True)
            return {"score": z["score"],
                    "pooled": [z[f"pooled{i}"]
                               for i in range(int(z["n_pooled"]))],
                    "n_nodes": z["n_nodes"]}
        from types import SimpleNamespace

        from gcc_tpu.cli import _enable_compilation_cache
        from gcc_tpu.generate import generate_graph_readouts
        from gcc_tpu.training.checkpoint import load_checkpoint, load_config

        _enable_compilation_cache()
        cfg = load_config(os.path.dirname(ckpt))
        state = SimpleNamespace(**load_checkpoint(ckpt))
        # Weights enter the cached jit as arguments — N checkpoints at
        # one config share ONE compiled encode program.
        ro = generate_graph_readouts(cfg, state, graphs, n_max=args.n_max,
                                     e_max=args.e_max)
        if len(ckpts) == 1 and args.cache:
            np.savez(args.cache, ckpt=ckpt, score=ro["score"],
                     n_nodes=ro["n_nodes"], n_pooled=len(ro["pooled"]),
                     **{f"pooled{i}": p for i, p in enumerate(ro["pooled"])})
            print(f"cached readouts to {args.cache}", flush=True)
        return ro

    HEADLINE = ("score", "inmean+convl2", "layercat", "in_pooled_mean")
    all_out = []
    for ckpt in ckpts:
        print(f"\n=== {ckpt}", flush=True)
        ro = get_readouts(ckpt)
        rows = {}

        def ev(name, emb, std, rows=None):
            key = f"{name}{'/std' if std else ''}"
            rows[key] = evaluate_graph_embeddings(emb, y, standardize=std)[
                "Micro-F1"]
            print(f"{key:24s} {rows[key]:.4f}", flush=True)

        ev("degree-hist", dh, False, rows=rows)
        if args.full:
            ev("degree-hist", dh, True, rows=rows)
        variants = assemble_variants(ro)
        if not args.full:
            variants = {k: v for k, v in variants.items() if k in HEADLINE}
        for name, emb in variants.items():
            for std in ((False, True) if args.full else (False,)):
                ev(name, emb, std, rows=rows)
        # Complementarity probe for the best GCC-alone variant.
        best = max((k for k in rows if not k.startswith("degree-hist")),
                   key=lambda k: rows[k])
        bname = best.split("/")[0]
        ev(f"{bname}+dh", np.concatenate([variants[bname], dh], axis=1),
           best.endswith("/std"), rows=rows)
        rows["majority"] = float(counts.max() / counts.sum())
        print(f"best GCC-alone: {best} = {rows[best]:.4f}", flush=True)
        all_out.append({"ckpt": ckpt, "results": rows, "best": best})
    with open(args.out, "w") as f:
        json.dump(all_out if len(all_out) > 1 else all_out[0], f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
