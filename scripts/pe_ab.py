#!/usr/bin/env python
"""Controlled PE-fidelity A/B: exact eigh vs production subspace PE,
through the FULL pretrain -> frozen-embedding role-transfer pipeline
(VERDICT r1 item 2).

Arms (same data stream per seed — cfg.seed drives the sampler, and the
PE method only changes the device program — so deltas are paired):
  * eigh        — exact dense eigendecomposition (reference-equivalent,
                  tests/test_pe_arpack_oracle.py pins it to ARPACK).
  * subspace    — production path: guards=16 + generalized RR.
  * subspace-g0 — round-1 guardless path (GCC_TPU_PE_GUARDS=0).

Each (arm, seed) runs in its own subprocess: sequential chip access, and
env-derived kernel config (GCC_TPU_PE_GUARDS) is baked at trace time.

Usage:
  python scripts/pe_ab.py [--seeds 0 1 2] [--epochs 16] [--motifs 200]
  python scripts/pe_ab.py --child --method subspace --seed 0 --out DIR ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# subspace-g0-stacked: the production guardless PE with the reference's
# random batch composition (emit="stacked") instead of size routing —
# the routed-vs-stacked downstream comparison (VERDICT r3 item 1) runs
# it against the subspace-g0 arms on the same seeds.
# subspace-g0-div: guardless PE on the family-DIVERSE corpus
# (graph/corpus.synthetic_corpus_diverse) — the corpus-diversity arm of
# the graph-transfer attribution (VERDICT r4 item 1). Same seeds pair
# against subspace-g0 (identical config, corpus is the only change).
# subspace-g0-bf16: guardless PE with the round-5 bytes levers on
# (GCC_TPU_ADJ_DTYPE=bf16 + GCC_TPU_JACOBI_V_DTYPE=bf16) — the
# downstream gate for docs/PERF.md levers 2-3.
ARMS = ("subspace", "eigh", "subspace-g0", "subspace-g0-stacked",
        "subspace-g0-div", "subspace-g0-bf16")
DIVERSE_CORPUS = "/tmp/gcc_tpu_corpus_diverse"


def child(args):
    import glob

    import numpy as np

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.config import (ContrastConfig, EncoderConfig, SamplerConfig,
                                TrainConfig)
    from gcc_tpu.graph.corpus import synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig
    from gcc_tpu.training.loop import run_pretrain

    _enable_compilation_cache()
    pe_method = "eigh" if args.method == "eigh" else "subspace"
    corpus = os.environ.get("GCC_TPU_BENCH_CORPUS", "/tmp/gcc_tpu_bench_corpus")
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        synthetic_corpus(corpus, num_graphs=6, nodes_per_graph=100_000,
                         avg_degree=12, seed=0)
    cfg = TrainConfig(
        batch_size=32,
        epochs=args.epochs,
        seed=args.seed,
        num_samples=2000,
        num_workers=1,
        sampler=SamplerConfig(rw_hops=256),
        contrast=ContrastConfig(moco=True, nce_k=16384),
        encoder=EncoderConfig(pe_method=pe_method),
    )
    emit = "stacked" if args.method.endswith("stacked") else "routed"
    pcfg = PipelineConfig(
        batch_size=32, n_max=256, e_max=2048, num_samples=2000,
        num_workers=1, mode="thread", emit=emit, super_batch=62,
        n_small=128,
    )
    # Resume: if a FINISHED run already exists in args.out, skip straight
    # to eval — a crash in the eval phase must not cost the ~40-minute
    # training+compile again. 'current' alone is not a completion marker
    # (loop.py writes it every epoch); require the full step count.
    expected_steps = args.epochs * (cfg.num_samples
                                    * max(1, cfg.num_workers)
                                    // cfg.batch_size)
    run_dir = None
    for ck in glob.glob(os.path.join(args.out, "*", "current")):
        cand = os.path.dirname(ck)
        mpath = os.path.join(cand, "metrics.jsonl")
        if not os.path.exists(mpath):
            continue
        # Tolerate a truncated trailing line: a killed run (the exact
        # scenario this resume targets) can leave a partial JSON record.
        losses = []
        for l in open(mpath):
            try:
                losses.append(json.loads(l)["loss"])
            except (json.JSONDecodeError, KeyError):
                continue
        if len(losses) >= expected_steps:
            run_dir = cand
            break
    t0 = time.time()
    if run_dir is not None:
        per_epoch = max(1, len(losses) // max(1, args.epochs))
        avg_loss = float(np.mean(losses[-per_epoch:]))
        print(f"[child] reusing finished run {run_dir} "
              f"({len(losses)} steps)", flush=True)
    else:
        summary = run_pretrain(cfg, corpus, args.out, pcfg=pcfg,
                               steps_per_call=62)
        run_dir = summary["run_dir"]
        avg_loss = summary.get("avg_loss")
    train_s = time.time() - t0

    # Frozen-embedding role transfer (scripts/role_benchmark.py protocol).
    # Eval-time PE is pinned to exact eigh FOR EVERY ARM (and any guards
    # override is dropped) so the arms differ only in the weights that
    # training-time PE produced — the eval-side PE approximation is held
    # out of the comparison entirely.
    import dataclasses
    from types import SimpleNamespace

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from role_benchmark import build_role_graph, build_role_graph_v2

    from gcc_tpu.generate import generate_embeddings, node_subgraphs
    from gcc_tpu.tasks import evaluate_node_embeddings
    from gcc_tpu.training.checkpoint import load_checkpoint, load_config

    os.environ.pop("GCC_TPU_PE_GUARDS", None)
    # The bytes levers are TRAINING-arm knobs; eval featurization is
    # pinned to the common f32/eigh program for every arm.
    os.environ.pop("GCC_TPU_ADJ_DTYPE", None)
    os.environ.pop("GCC_TPU_JACOBI_V_DTYPE", None)
    if args.bench == "v2":
        # Sub-ceiling 9-class benchmark (VERDICT r3 item 1): arm deltas
        # are measured where the eval has headroom, not at 0.98-1.0.
        g, y = build_role_graph_v2()
    else:
        g, y = build_role_graph(args.motifs)
    ckpt = os.path.join(run_dir, "current")
    lcfg = load_config(os.path.dirname(ckpt))
    lcfg = dataclasses.replace(
        lcfg, encoder=dataclasses.replace(lcfg.encoder, pe_method="eigh"))
    state = SimpleNamespace(**load_checkpoint(ckpt))
    subs_q, subs_k = node_subgraphs(g, lcfg, 256, 2048, two_views=True)
    emb = generate_embeddings(lcfg, state, subs_q, n_max=256, e_max=2048,
                              subgraphs_k=subs_k)
    res = evaluate_node_embeddings(emb, y)
    out = {
        "bench": args.bench,
        "method": args.method, "seed": args.seed,
        "avg_loss": avg_loss,
        "train_s": round(train_s, 1),
        "role": res,
        "eval_nodes": int(g.num_nodes),
        "eval_pe": "eigh",
    }
    res_name = ("pe_ab.json" if args.bench == "v1"
                else f"pe_ab_{args.bench}.json")
    with open(os.path.join(args.out, res_name), "w") as f:
        json.dump(out, f)
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--method", choices=ARMS, default="subspace")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--motifs", type=int, default=200)
    ap.add_argument("--bench", choices=["v1", "v2"], default="v2",
                    help="role benchmark version for the eval phase "
                         "(v2: 9-class sub-ceiling graph; v1 kept for "
                         "the r3 series)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--root", default="/tmp/gcc_tpu_pe_ab")
    ap.add_argument("--arms", nargs="+", default=list(ARMS[:3]))
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    os.makedirs(args.root, exist_ok=True)
    results = []
    for seed in args.seeds:
        for arm in args.arms:
            out = os.path.join(args.root, f"{arm}_s{seed}")
            done = os.path.join(out, "pe_ab.json" if args.bench == "v1"
                                else f"pe_ab_{args.bench}.json")
            if os.path.exists(done):
                results.append(json.load(open(done)))
                print(f"[pe_ab] cached {arm} seed={seed}", flush=True)
                continue
            env = dict(os.environ)
            # Pin guards explicitly per arm so the A/B stays valid even if
            # the library default changes (the retune this run informs).
            env["GCC_TPU_PE_GUARDS"] = ("0" if arm.startswith("subspace-g0")
                                        else "16")
            if arm.endswith("-div"):
                from gcc_tpu.graph.corpus import synthetic_corpus_diverse

                if not os.path.exists(os.path.join(DIVERSE_CORPUS,
                                                   "manifest.json")):
                    synthetic_corpus_diverse(DIVERSE_CORPUS, seed=0)
                env["GCC_TPU_BENCH_CORPUS"] = DIVERSE_CORPUS
            if arm.endswith("-bf16"):
                env["GCC_TPU_ADJ_DTYPE"] = "bf16"
                env["GCC_TPU_JACOBI_V_DTYPE"] = "bf16"
            cmd = [sys.executable, os.path.abspath(__file__), "--child",
                   "--method", arm, "--seed", str(seed), "--out", out,
                   "--epochs", str(args.epochs), "--bench", args.bench,
                   "--motifs", str(args.motifs)]
            print(f"[pe_ab] running {arm} seed={seed} ...", flush=True)
            t0 = time.time()
            p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                               timeout=7200)
            if p.returncode != 0:
                print(p.stdout[-3000:])
                print(p.stderr[-3000:])
                raise SystemExit(f"child {arm} s{seed} failed")
            results.append(json.load(open(done)))
            print(f"[pe_ab] {arm} seed={seed} done in {time.time()-t0:.0f}s: "
                  f"{results[-1]['role']}", flush=True)

    print("\n=== PE A/B summary (micro-F1, paired by seed) ===")
    by_arm = {}
    for r in results:
        f1 = r["role"]["Micro-F1"]
        by_arm.setdefault(r["method"], {})[r["seed"]] = (f1, r["avg_loss"])
    for arm, rows in by_arm.items():
        f1s = [v[0] for v in rows.values()]
        import numpy as np

        print(f"{arm:12s} f1 mean {np.mean(f1s):.4f} ± {np.std(f1s):.4f}  "
              + " ".join(f"s{s}:{v[0]:.4f}" for s, v in sorted(rows.items())))
    with open(os.path.join(
            args.root,
            "summary.json" if args.bench == "v1"
            else f"summary_{args.bench}.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
