"""Device-resident A/B of the E2E size-routed sub-forward split
(config.py ContrastConfig.e2e_split; VERDICT r3 item 2).

Re-steps the SAME device batch (reference E2E headline: batch 256,
K=255 in-batch negatives, stacked emission, scan8) through the split
and unsplit step programs round-robin, so relay fast/slow phases cancel
(the diag_step_ab protocol — single bench numbers are phase-dependent).

Usage: timeout 3600 python scripts/diag_e2e_split.py
"""

from __future__ import annotations

import dataclasses
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
    b, spc = 256, 8
    base = TrainConfig(
        batch_size=b,
        sampler=SamplerConfig(rw_hops=256),
        contrast=ContrastConfig(moco=False, nce_k=b - 1),
    )
    pcfg = PipelineConfig(
        batch_size=b, n_max=256, e_max=2048,
        num_samples=10_000, num_workers=0, emit="stacked",
        super_batch=spc,
    )
    variants = [
        ("split3_80_128", "80:224,128:20"),
        ("split2_128", "128:240"),
        ("unsplit", ""),
    ]
    with PretrainPipeline(store, base.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        n_large = int(((np.asarray(sq.meta)[:, 0, :] > 128)
                       | (np.asarray(sk.meta)[:, 0, :] > 128)).sum())
        print(f"batch: {spc}x{b} pairs, {n_large} large "
              f"({100 * n_large / (spc * b):.2f}%)", flush=True)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), base,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=256)
        batch = jax.device_put((sq, sk))

        fns = {}
        for name, c_s in variants:
            cfg = dataclasses.replace(
                base, contrast=dataclasses.replace(base.contrast,
                                                   e2e_split=c_s))
            step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                      n_max=256)
            packed = pack(state)
            t0 = time.time()
            packed, m = step_fn(packed, *batch)
            loss0 = float(np.asarray(m["loss"])[-1])
            ov = (np.asarray(m["e2e_split_overflow"]).sum()
                  if "e2e_split_overflow" in m else 0)
            print(f"{name}: compiled in {time.time() - t0:.0f}s, "
                  f"loss {loss0:.4f}, overflow {int(ov)}", flush=True)
            fns[name] = [step_fn, packed]

        for trial in range(5):
            for name, _ in variants:
                step_fn, packed = fns[name]
                n_calls = 8
                t0 = time.time()
                for _ in range(n_calls):
                    packed, m = step_fn(packed, *batch)
                _ = float(np.asarray(m["loss"])[-1])
                dt = time.time() - t0
                fns[name][1] = packed
                print(f"{name} trial {trial}: "
                      f"{1e3 * dt / (n_calls * spc):.3f} ms/step",
                      flush=True)


if __name__ == "__main__":
    main()
