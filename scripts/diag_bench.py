"""Decompose bench.py step time into sampler / transfer / device phases.

Runs the exact bench.py configuration and measures, separately:
  1. raw pipeline pair production rate (host only),
  2. device-resident step rate (same device batch re-stepped: dispatch +
     compute, no host work, no transfer),
  3. host-stack + device_put + step (fresh transfer each call, fixed
     pre-sampled pairs),
  4. the full production path (pipeline draw each call).

Measures the PRODUCTION routed/stacked path (one (K, ...) compact item
per dispatch). Usage: timeout 3000 python scripts/diag_bench.py [steps_per_call]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse constants)


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import (
        create_pretrain_state, make_packed_multi_step, stack_batches,
    )

    corpus_dir = os.environ.get("GCC_TPU_BENCH_CORPUS",
                                "/tmp/gcc_tpu_bench_corpus")
    if not os.path.exists(os.path.join(corpus_dir, "manifest.json")):
        synthetic_corpus(corpus_dir, num_graphs=6, nodes_per_graph=100_000,
                         avg_degree=12, seed=0)
    store = CorpusStore.open(corpus_dir)

    cfg = TrainConfig(
        batch_size=bench.BATCH_SIZE,
        sampler=SamplerConfig(rw_hops=bench.RW_HOPS),
        contrast=ContrastConfig(moco=True, nce_k=bench.NCE_K),
    )
    pcfg = PipelineConfig(
        batch_size=bench.BATCH_SIZE, n_max=bench.N_MAX, e_max=bench.E_MAX,
        num_samples=10_000, num_workers=1, prefetch=4,
        threads_per_worker=1, mode="thread",
        emit="routed", super_batch=spc, n_small=128,
    )

    def log(msg):
        print(f"[diag] {msg}", flush=True)

    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        # --- 1. raw pipeline rate (routed stacked items) ----------------
        _ = [next(pipe) for _ in range(4)]  # warm
        n_items = 8
        t0 = time.time()
        items = [next(pipe) for _ in range(n_items)]
        dt = time.time() - t0
        log(f"pipeline: {1e3 * dt / (n_items * spc):.2f} ms/step host-only "
            f"({n_items * spc / dt:.0f} steps/s)")

        bq, bk = items[0]
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], bq)),
            total_steps=100_000, n_max=bench.N_MAX,
        )
        step_fn, pack, _unpack = make_packed_multi_step(
            cfg, enc, tx, state, n_max=bench.N_MAX)
        packed = pack(state)

        stacks = items[:8]

        # warm compile
        dq, dk = jax.device_put(stacks[0][0]), jax.device_put(stacks[0][1])
        packed, metrics = step_fn(packed, dq, dk)
        _ = float(np.asarray(metrics["loss"])[-1])
        log("compiled")

        # --- 2. device-resident rate (reuse same device batch) --------
        n_calls = 12
        t0 = time.time()
        for _ in range(n_calls):
            packed, metrics = step_fn(packed, dq, dk)
        _ = float(np.asarray(metrics["loss"])[-1])
        dt = time.time() - t0
        log(f"device-resident: {1e3 * dt / (n_calls * spc):.2f} ms/step "
            f"({1e3 * dt / n_calls:.1f} ms/call)")

        # --- 3. fresh transfer each call (no sampling) -----------------
        t0 = time.time()
        for i in range(n_calls):
            sq, sk = stacks[i % len(stacks)]
            packed, metrics = step_fn(packed, jax.device_put(sq),
                                      jax.device_put(sk))
        _ = float(np.asarray(metrics["loss"])[-1])
        dt = time.time() - t0
        log(f"with transfer: {1e3 * dt / (n_calls * spc):.2f} ms/step "
            f"({1e3 * dt / n_calls:.1f} ms/call)")

        # --- 3b. transfer-only (device_put, no step) -------------------
        t0 = time.time()
        outs = []
        for i in range(n_calls):
            sq, sk = stacks[i % len(stacks)]
            outs.append(jax.device_put((sq, sk)))
        jax.block_until_ready(outs)
        dt = time.time() - t0
        bytes_per = sum(np.asarray(x).nbytes
                        for x in jax.tree_util.tree_leaves(stacks[0]))
        log(f"transfer-only: {1e3 * dt / n_calls:.2f} ms/call "
            f"({bytes_per / 1e6:.2f} MB/call, "
            f"{bytes_per * n_calls / dt / 1e6:.0f} MB/s)")
        del outs

        # --- 4. full path ----------------------------------------------
        t0 = time.time()
        for _ in range(n_calls):
            sq, sk = next(pipe)
            packed, metrics = step_fn(packed, jax.device_put(sq),
                                      jax.device_put(sk))
        _ = float(np.asarray(metrics["loss"])[-1])
        dt = time.time() - t0
        log(f"full path: {1e3 * dt / (n_calls * spc):.2f} ms/step "
            f"({1e3 * dt / n_calls:.1f} ms/call)")

        # --- 5. full path, double-buffered device_put -------------------
        # (Measured: NO win — the relay serializes transfers with
        # dispatches, so pre-submitting the next item's put just queues
        # ahead of the step. Kept as a diagnostic.)
        nxt = jax.device_put(next(pipe))
        t0 = time.time()
        for _ in range(n_calls):
            cur = nxt
            nxt = jax.device_put(next(pipe))  # submit while device runs
            packed, metrics = step_fn(packed, *cur)
        _ = float(np.asarray(metrics["loss"])[-1])
        dt = time.time() - t0
        log(f"full path (dbl-buffered put): "
            f"{1e3 * dt / (n_calls * spc):.2f} ms/step")


if __name__ == "__main__":
    main()
