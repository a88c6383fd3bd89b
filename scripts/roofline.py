#!/usr/bin/env python
"""Roofline grounding for the head bench (VERDICT r3 item 3/4).

Compiles the PRODUCTION train-step program (the same make_packed_multi_step
callable bench.py dispatches, at the canonical routed MoCo config) for the
real chip and pulls XLA's cost analysis of the OPTIMIZED program: exact
FLOPs and HBM bytes-accessed per dispatch. From those and the v5e's
public peaks it computes the two classical roofline floors

    t_flops = FLOPs / peak_FLOPs        (194.8 TFLOP/s bf16 on v5e)
    t_hbm   = bytes / HBM_bandwidth     (819 GB/s on v5e)

plus the measured device-resident step time (the same in-process loop
protocol as scripts/diag_step_ab.py — relay fast/slow phases cancel),
and reports step-floor-ms, the achieved ratio, and MFU. Output feeds
docs/PERF.md "Roofline" and the constants in bench.py vs_roofline.

The third, non-classical term — the scan body's serial dependency chain
— is reported as measured-minus-floor and cross-checked against the
fusion count of the compiled program (docs/PERF.md: op-count cuts were
wall-neutral, so the body is latency-bound, not throughput-bound).

Usage: timeout 3600 python scripts/roofline.py [moco|e2e]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e public peaks (Google Cloud TPU docs): 197 TFLOP/s bf16,
# 394 TOP/s int8, HBM 16 GB at 819 GB/s. f32 matmul on the MXU runs
# via bf16 passes (1-pass by default), so bf16 peak is the right
# optimistic bound for every dot in this program.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9

BATCH_SIZE = 32
N_MAX = 256
E_MAX = 2048
RW_HOPS = 256
NCE_K = 16384
SCAN = 64
CONFIG = "moco"


def main():
    global BATCH_SIZE, NCE_K, SCAN, CONFIG
    if len(sys.argv) > 1:
        CONFIG = sys.argv[1]
    if CONFIG == "e2e":
        # Reference E2E headline (batch 256, in-batch negatives) with the
        # round-4 size-routed sub-forward split (the production program).
        BATCH_SIZE, NCE_K, SCAN = 256, 255, 8
    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

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
    moco = CONFIG != "e2e"
    cfg = TrainConfig(
        batch_size=BATCH_SIZE,
        sampler=SamplerConfig(rw_hops=RW_HOPS),
        contrast=ContrastConfig(moco=moco, nce_k=NCE_K),
    )
    pcfg = PipelineConfig(
        batch_size=BATCH_SIZE, n_max=N_MAX, e_max=E_MAX,
        num_samples=10_000, num_workers=1, prefetch=4,
        threads_per_worker=1, mode="thread",
        emit="routed" if moco else "stacked", super_batch=SCAN,
        n_small=128,
    )
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        bq, bk = next(pipe)
        print("pipeline up; initializing state", flush=True)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], bq)),
            total_steps=100_000, n_max=N_MAX,
        )
        step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                  n_max=N_MAX)
        packed = pack(state)
        # moco: grab a small-bucket (n_small=128) item — 99% of
        # production dispatches run this program; it is the head-bench
        # step. e2e: the stacked item IS the production (split) step.
        while moco and bq.n_max != 128:
            bq, bk = next(pipe)
        sq, sk = jax.device_put(bq), jax.device_put(bk)

        print("lowering + compiling (AOT, relay compile: minutes)",
              flush=True)
        t0 = time.time()
        lowered = step_fn.lower(packed, sq, sk)
        compiled = lowered.compile()
        print(f"compiled in {time.time() - t0:.0f}s", flush=True)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_call = float(ca.get("flops", float("nan")))
        bytes_call = float(ca.get("bytes accessed", float("nan")))
        print(f"cost_analysis keys: {sorted(ca)[:30]}", flush=True)

        # Fusion/op census of the optimized program (for the serial-
        # dependency discussion): counts per opcode.
        try:
            hlo = compiled.as_text()
            fusions = hlo.count("fusion(")
            while_ops = hlo.count("while(")
            print(f"optimized HLO: {len(hlo.splitlines())} lines, "
                  f"{fusions} fusion calls, {while_ops} while ops",
                  flush=True)
        except Exception as e:  # relay may not expose text
            print(f"(no HLO text: {e})", flush=True)
            fusions = None

        # Measured device-resident step: re-step the same device batch
        # in-process (no host sampling in the loop), median of trials.
        # Uses the AOT executable directly — calling the jitted step_fn
        # would trigger a SECOND relay compile for its own cache entry.
        print("measuring device-resident step", flush=True)
        scratch, m = compiled(packed, sq, sk)  # settle
        _ = float(np.asarray(m["loss"])[-1])
        trials = []
        for _t in range(5):
            t0 = time.time()
            for _ in range(24):
                scratch, m = compiled(scratch, sq, sk)
            _ = float(np.asarray(m["loss"])[-1])
            trials.append((time.time() - t0) / (24 * SCAN))
        trials.sort()
        step_s = trials[len(trials) // 2]

    flops_step = flops_call / SCAN
    bytes_step = bytes_call / SCAN
    t_flops = flops_step / PEAK_BF16_FLOPS
    t_hbm = bytes_step / PEAK_HBM_BPS
    floor_s = max(t_flops, t_hbm)
    out = {
        "config": f"{CONFIG} b={BATCH_SIZE} k={NCE_K} scan{SCAN}",
        "flops_per_step": flops_step,
        "hbm_bytes_per_step": bytes_step,
        "t_flops_us": round(t_flops * 1e6, 1),
        "t_hbm_us": round(t_hbm * 1e6, 1),
        "floor_us": round(floor_s * 1e6, 1),
        "measured_step_us": round(step_s * 1e6, 1),
        "measured_trials_us": [round(t * 1e6, 1) for t in trials],
        "ratio_floor_over_measured": round(floor_s / step_s, 4),
        "mfu": round(flops_step / step_s / PEAK_BF16_FLOPS, 5),
        "hbm_util": round(bytes_step / step_s / PEAK_HBM_BPS, 4),
        "fusion_count": fusions,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
