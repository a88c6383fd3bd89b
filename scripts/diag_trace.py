"""Capture a device timeline of the production routed train step and
print the top ops by total device time.

Runs a few 16-step dispatches at the small (128) bucket under
jax.profiler.trace, then parses the trace protobuf/json for TPU-pid 'X'
events (docs/PERF.md "Profiling on this setup").

Usage: timeout 3000 python scripts/diag_trace.py [out_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gcc_trace"
    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import create_pretrain_state, make_packed_multi_step

    store = CorpusStore.open(os.environ.get("GCC_TPU_BENCH_CORPUS",
                                            "/tmp/gcc_tpu_bench_corpus"))
    cfg = TrainConfig(batch_size=bench.BATCH_SIZE,
                      sampler=SamplerConfig(rw_hops=bench.RW_HOPS),
                      contrast=ContrastConfig(moco=True, nce_k=bench.NCE_K))
    pcfg = PipelineConfig(
        batch_size=bench.BATCH_SIZE, n_max=bench.N_MAX, e_max=bench.E_MAX,
        num_samples=10_000, num_workers=0, emit="routed",
        super_batch=int(os.environ.get("GCC_TPU_TRACE_SCAN", "16")),
        n_small=128,
    )
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=bench.N_MAX)
        step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                  n_max=bench.N_MAX)
        packed = pack(state)
        dq, dk = jax.device_put((sq, sk))
        packed, m = step_fn(packed, dq, dk)  # compile
        _ = float(np.asarray(m["loss"])[-1])
        n_disp = max(1, 64 // (jax.tree_util.tree_leaves(sq.edges)[0].shape[0] if hasattr(sq, "edges") else 16))
        with jax.profiler.trace(out_dir):
            for _ in range(n_disp):
                packed, m = step_fn(packed, dq, dk)
            _ = float(np.asarray(m["loss"])[-1])

    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Find TPU device pids: process_name metadata containing "TPU"/"Device".
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:28]
    steps = 64
    print(f"device total {total/1e3/steps*1000:.0f} us/step over {steps} steps "
          f"({len(agg)} distinct ops)")
    for name, dur in top:
        print(f"  {dur/steps:9.1f} us/step  {name[:110]}")


if __name__ == "__main__":
    main()
