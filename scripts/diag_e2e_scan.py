"""Device-resident sweep of the E2E dispatch depth (VERDICT r4 item 5).

The MoCo config swept steps-per-dispatch and settled on scan64
(docs/PERF.md "64 steps per dispatch"); the E2E headline config still
dispatches at scan8 with an ~8% wall-vs-device fringe (8.2 vs 7.6
ms/step). This sweeps scan 8/16/32/64 for the PRODUCTION split E2E step
(batch 256, K=255 in-batch negatives, split "128:240"): one stacked
64-segment item is sampled once, sliced to each depth, and all four
programs re-step their device batch round-robin (relay phases cancel).

ms/step here is DEVICE+dispatch cost; the wall win comes from fewer
relay round-trips per step — compare against bench.py e2e runs.

Usage: timeout 7200 python scripts/diag_e2e_scan.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import create_pretrain_state, make_packed_multi_step

    corpus_dir = os.environ.get("GCC_TPU_BENCH_CORPUS",
                                "/tmp/gcc_tpu_bench_corpus")
    if not os.path.exists(os.path.join(corpus_dir, "manifest.json")):
        synthetic_corpus(corpus_dir, num_graphs=6, nodes_per_graph=100_000,
                         avg_degree=12, seed=0)
    store = CorpusStore.open(corpus_dir)
    b = 256
    depths = [8, 16, 32, 64]
    cfg = TrainConfig(
        batch_size=b,
        sampler=SamplerConfig(rw_hops=256),
        contrast=ContrastConfig(moco=False, nce_k=b - 1),
    )
    pcfg = PipelineConfig(
        batch_size=b, n_max=256, e_max=2048,
        num_samples=10_000, num_workers=0, emit="stacked",
        super_batch=max(depths),
    )
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=256)

        fns = {}
        for spc in depths:
            bq = jax.tree_util.tree_map(lambda x: x[:spc], sq)
            bk = jax.tree_util.tree_map(lambda x: x[:spc], sk)
            batch = jax.device_put((bq, bk))
            step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                      n_max=256)
            packed = pack(state)
            t0 = time.time()
            packed, m = step_fn(packed, *batch)
            loss0 = float(np.asarray(m["loss"])[-1])
            print(f"scan{spc}: compiled in {time.time() - t0:.0f}s, "
                  f"loss {loss0:.4f}", flush=True)
            fns[spc] = [step_fn, packed, batch]

        for trial in range(5):
            for spc in depths:
                step_fn, packed, batch = fns[spc]
                n_calls = max(2, 16 // (spc // 8))
                t0 = time.time()
                for _ in range(n_calls):
                    packed, m = step_fn(packed, *batch)
                _ = float(np.asarray(m["loss"])[-1])
                dt = time.time() - t0
                fns[spc][1] = packed
                print(f"scan{spc} trial {trial}: "
                      f"{1e3 * dt / (n_calls * spc):.3f} ms/step",
                      flush=True)


if __name__ == "__main__":
    main()
