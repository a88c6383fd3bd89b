"""Device-resident A/B of the routed size buckets: re-step the same
device batch through the small-bucket and large-bucket cache entries of
one packed multi-step program; relay/host load cancels out.

Usage: timeout 3000 python scripts/diag_routed.py [steps_per_call]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    import jax

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import create_pretrain_state, make_packed_multi_step

    corpus_dir = os.environ.get("GCC_TPU_BENCH_CORPUS",
                                "/tmp/gcc_tpu_bench_corpus")
    store = CorpusStore.open(corpus_dir)
    cfg = TrainConfig(batch_size=bench.BATCH_SIZE,
                      sampler=SamplerConfig(rw_hops=bench.RW_HOPS),
                      contrast=ContrastConfig(moco=True, nce_k=bench.NCE_K))
    pcfg = PipelineConfig(
        batch_size=bench.BATCH_SIZE, n_max=bench.N_MAX, e_max=bench.E_MAX,
        num_samples=10_000, num_workers=0, emit="routed",
        super_batch=spc, n_small=n_small,
    )
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        assert sq.n_max == n_small
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=bench.N_MAX)
        step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                  n_max=bench.N_MAX)
        packed = pack(state)
        small = jax.device_put((sq, sk))
        fake = dataclasses.replace(
            sq, n_max=bench.N_MAX,
            edges=np.zeros((spc, pipe.pcfg.e_tot_large), np.uint16))
        large = jax.device_put((fake, fake))

        for name, (bq, bk) in (("small", small), ("large", large)):
            packed, m = step_fn(packed, bq, bk)   # compile
            _ = float(np.asarray(m["loss"])[-1])
            for trial in range(3):
                n_calls = 24
                t0 = time.time()
                for _ in range(n_calls):
                    packed, m = step_fn(packed, bq, bk)
                _ = float(np.asarray(m["loss"])[-1])
                dt = time.time() - t0
                print(f"{name} trial {trial}: "
                      f"{1e3 * dt / (n_calls * spc):.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
