"""Device-resident A/B of the round-5 bytes levers (docs/PERF.md
"Known levers" 2-3): the bf16 adjacency chain (GCC_TPU_ADJ_DTYPE) and
the bf16 Jacobi eigenvector accumulator (GCC_TPU_JACOBI_V_DTYPE).

The round-4 roofline showed the head step executing at 94% of its own
HBM demand — only demanding fewer bytes can move it. The adjacency +
normalized-PE-operator chain is the largest demand; the Jacobi round
chain's V stream is next. Same protocol as diag_step_ab.py: all four
(adj, v) dtype variants re-step the SAME device batch round-robin so
relay fast/slow phases cancel; first-step losses are printed so any
numeric divergence is visible immediately (bf16 adjacency changes
training numerics by design — the downstream gate is the v2 benchmark,
scripts/pe_ab.py --arms subspace-g0 vs the bf16 arm).

Usage: timeout 5400 python scripts/diag_bf16_ab.py [steps_per_call]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
    os.environ["GCC_TPU_PE_GUARDS"] = "0"
    # (name, adj dtype flag, jacobi V dtype flag)
    variants = [
        ("f32_f32", "f32", "f32"),      # round-4 head
        ("bf16adj", "bf16", "f32"),
        ("bf16v", "f32", "bf16"),
        ("bf16both", "bf16", "bf16"),
    ]
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        sq, sk = next(pipe)
        assert sq.n_max == 128, sq.n_max
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.device_put(jax.tree_util.tree_map(lambda x: x[0], sq)),
            total_steps=100_000, n_max=bench.N_MAX)
        batch = jax.device_put((sq, sk))

        fns = {}
        for name, adt, vdt in variants:
            os.environ["GCC_TPU_ADJ_DTYPE"] = adt
            os.environ["GCC_TPU_JACOBI_V_DTYPE"] = vdt
            step_fn, pack, _ = make_packed_multi_step(
                cfg, enc, tx, state, n_max=bench.N_MAX)
            packed = pack(state)
            t0 = time.time()
            try:
                packed, m = step_fn(packed, *batch)  # trace + relay compile
                loss = float(np.asarray(m["loss"])[-1])
            except Exception as e:  # Mosaic crashes only surface here
                print(f"{name}: COMPILE FAILED: {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)
                continue
            print(f"{name}: compiled in {time.time() - t0:.0f}s "
                  f"(loss {loss:.4f})", flush=True)
            fns[name] = [step_fn, packed]

        for trial in range(5):
            for name, _, _ in variants:
                if name not in fns:
                    continue
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
