#!/usr/bin/env python
"""Sub-ceiling finetune benchmark (VERDICT r4 item 6).

The finetune protocol (reference train.py:175-297: encoder + linear
head, CE, clip-by-value 1, warmup LR, 10-fold CV) was validated only at
1.0 micro-F1 on a synthetic fixture — no headroom to discriminate
regressions. This instrument runs the SAME protocol on the 9-class
role-v2 graph (scripts/role_benchmark.build_role_graph_v2), where the
frozen-embedding floor is known (GCC logreg 0.74-0.78) and the classes
are confusable by construction, so scores land mid-range and move with
real changes.

Arms:
  pretrained  encoder initialized from --ckpt (the protocol under test)
  scratch     random init, same schedule — the discriminating gap:
              pretraining must buy accuracy through the finetune path,
              mirroring the reference's pretrain-vs-scratch claim
              (paper Table 4 "GCC (rand)" rows).

Usage:
  python scripts/finetune_benchmark.py --ckpt <ckpt> [--cpu]
      [--blocks 60] [--epochs 10] [--folds 0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--blocks", type=int, default=60,
                    help="role-v2 blocks (60 → ~3.2k nodes)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--folds", type=int, nargs="+", default=[0])
    ap.add_argument("--n-max", type=int, default=256)
    ap.add_argument("--e-max", type=int, default=2048)
    ap.add_argument("--arms", nargs="+",
                    default=["pretrained", "scratch"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/gcc_tpu_finetune_benchmark.json")
    args = ap.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=1").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from types import SimpleNamespace

    from role_benchmark import build_role_graph_v2

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.training.checkpoint import load_checkpoint, load_config
    from gcc_tpu.training.finetune import NodeLabeledData, run_finetune_cv

    _enable_compilation_cache()
    ckpts = sorted(glob.glob(args.ckpt))
    if not ckpts:
        sys.exit(f"no checkpoint matches {args.ckpt}")
    ckpt = ckpts[0]
    g, y = build_role_graph_v2(blocks=args.blocks)
    print(f"role-v2 finetune: {g.num_nodes} nodes, {y.shape[1]} classes, "
          f"{args.epochs} epochs, folds {args.folds}", flush=True)

    cfg = load_config(os.path.dirname(ckpt))
    cfg = dataclasses.replace(cfg, epochs=args.epochs)
    state = SimpleNamespace(**load_checkpoint(ckpt))
    data = NodeLabeledData(g, y, cfg, n_max=args.n_max, e_max=args.e_max)

    results = {}
    for arm in args.arms:
        t0 = time.time()
        if arm == "pretrained":
            res = run_finetune_cv(cfg, data, state.params,
                                  state.batch_stats, folds=args.folds)
        else:
            res = run_finetune_cv(cfg, data, None, None, folds=args.folds)
        results[arm] = res
        print(f"{arm:11s} {res}  ({time.time() - t0:.0f}s)", flush=True)
    with open(args.out, "w") as f:
        json.dump({"ckpt": ckpt, "blocks": args.blocks,
                   "epochs": args.epochs, "folds": args.folds,
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
