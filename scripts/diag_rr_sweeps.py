"""Device-resident A/B of the Jacobi RR sweep count (item 5, round 4).

The roofline analysis (docs/PERF.md "Roofline") pins the head step at
94% of its program's HBM demand, so the remaining lever is demanding
fewer bytes. The largest byte consumer is the Jacobi RR chain: at the
hoisted batch (4096 graphs/dispatch) its (32, 32, B) T/V arrays are
~16 MB each, read+written every one of the 31 rounds/sweep — sweeps
trade bytes (and serial rounds) directly against step time
(features/positional._rr_sweeps; 3 is the r3 default, measured
vector-converged vs 5).

Protocol: same-batch round-robin across programs traced at
GCC_TPU_PE_RR_SWEEPS = 3 / 2 / 1 (relay phases cancel; see
diag_step_ab.py). A downstream v2-benchmark validation gates any
default change (scripts/pe_ab.py protocol).

Usage: timeout 3600 python scripts/diag_rr_sweeps.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    spc = 64
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
    cfg = TrainConfig(batch_size=bench.BATCH_SIZE,
                      sampler=SamplerConfig(rw_hops=bench.RW_HOPS),
                      contrast=ContrastConfig(moco=True, nce_k=bench.NCE_K))
    pcfg = PipelineConfig(
        batch_size=bench.BATCH_SIZE, n_max=bench.N_MAX, e_max=bench.E_MAX,
        num_samples=10_000, num_workers=0, emit="routed",
        super_batch=spc, n_small=128,
    )
    variants = [("sweeps3", "3"), ("sweeps2", "2"), ("sweeps1", "1")]
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        assert sq.n_max == 128, sq.n_max
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=bench.N_MAX)
        batch = jax.device_put((sq, sk))

        fns = {}
        for name, sweeps in variants:
            os.environ["GCC_TPU_PE_RR_SWEEPS"] = sweeps
            step_fn, pack, _ = make_packed_multi_step(
                cfg, enc, tx, state, n_max=bench.N_MAX)
            packed = pack(state)
            t0 = time.time()
            packed, m = step_fn(packed, *batch)
            loss0 = float(np.asarray(m["loss"])[-1])
            print(f"{name}: compiled in {time.time() - t0:.0f}s, "
                  f"loss {loss0:.4f}", flush=True)
            fns[name] = [step_fn, packed]
        os.environ.pop("GCC_TPU_PE_RR_SWEEPS", None)

        for trial in range(5):
            for name, _ in variants:
                step_fn, packed = fns[name]
                n_calls = 24
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


