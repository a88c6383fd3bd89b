#!/usr/bin/env python
"""E2E canonical-length pretrain + v2 role-transfer eval (VERDICT r3
item 7: the reference treats E2E as a co-equal headline config, but the
longest recorded E2E training here was 320 steps of loss descent).

Trains the reference E2E headline config (batch 256, K=255 in-batch
negatives, README.md:71-75 / train.py:396-401) for the canonical 100
epochs with the round-4 size-routed sub-forward step, then runs the
same frozen-embedding v2 role transfer as scripts/pe_ab.py (eval PE
pinned to exact eigh), producing a transfer score directly comparable
to the MoCo arms' 0.75-0.77.

Usage: timeout 7200 python scripts/e2e_canonical.py [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gcc_tpu_e2e_canonical")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--num-samples", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig
    from gcc_tpu.training.loop import run_pretrain

    _enable_compilation_cache()
    corpus = os.environ.get("GCC_TPU_BENCH_CORPUS",
                            "/tmp/gcc_tpu_bench_corpus")
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        synthetic_corpus(corpus, num_graphs=6, nodes_per_graph=100_000,
                         avg_degree=12, seed=0)
    b = 256
    cfg = TrainConfig(
        batch_size=b,
        epochs=args.epochs,
        seed=args.seed,
        num_samples=args.num_samples,
        num_workers=1,
        sampler=SamplerConfig(rw_hops=256),
        contrast=ContrastConfig(moco=False, nce_k=b - 1),
    )
    pcfg = PipelineConfig(
        batch_size=b, n_max=256, e_max=2048, num_samples=args.num_samples,
        num_workers=1, mode="thread", emit="stacked", super_batch=8,
    )
    t0 = time.time()
    summary = run_pretrain(cfg, corpus, args.out, pcfg=pcfg,
                           steps_per_call=8)
    train_s = time.time() - t0
    print(f"trained {summary['steps']} steps in {train_s:.0f}s, "
          f"avg loss {summary['avg_loss']:.4f}", flush=True)

    # Frozen-embedding v2 role transfer (pe_ab.py protocol: eval PE
    # pinned to exact eigh; two independent views averaged).
    import dataclasses
    from types import SimpleNamespace

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from role_benchmark import build_role_graph_v2

    from gcc_tpu.generate import generate_embeddings, node_subgraphs
    from gcc_tpu.tasks import evaluate_node_embeddings
    from gcc_tpu.training.checkpoint import load_checkpoint, load_config

    g, y = build_role_graph_v2()
    ckpt = os.path.join(summary["run_dir"], "current")
    lcfg = load_config(os.path.dirname(ckpt))
    lcfg = dataclasses.replace(
        lcfg, encoder=dataclasses.replace(lcfg.encoder, pe_method="eigh"))
    state = SimpleNamespace(**load_checkpoint(ckpt))
    subs_q, subs_k = node_subgraphs(g, lcfg, 256, 2048, two_views=True)
    emb = generate_embeddings(lcfg, state, subs_q, n_max=256, e_max=2048,
                              subgraphs_k=subs_k)
    res = evaluate_node_embeddings(emb, y)
    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(summary["run_dir"],
                                         "metrics.jsonl"))]
    out = {
        "config": f"e2e b={b} k={b-1} epochs={args.epochs} "
                  f"steps={summary['steps']} split=default",
        "loss_first_epoch": round(float(np.mean(losses[:32])), 4),
        "avg_loss_final_epoch": round(float(np.mean(losses[-32:])), 4),
        "train_s": round(train_s, 1),
        "role_v2": res,
        "run_dir": summary["run_dir"],
    }
    print("E2E_CANONICAL " + json.dumps(out), flush=True)
    with open(os.path.join(args.out, "e2e_canonical.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
