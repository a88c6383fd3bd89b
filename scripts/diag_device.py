"""Ablate the on-device train-step cost: PE kernel vs rest of the step.

Device-resident timing (no host work): full step, step with PE zeroed
(monkeypatched), PE-only program, and the XLA-fallback PE path.

Usage: timeout 3000 python scripts/diag_device.py [steps_per_call]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from gcc_tpu.training.pretrain import _as_padded  # noqa: E402


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import (
        create_pretrain_state, make_packed_multi_step, stack_batches,
    )
    import gcc_tpu.features.featurize as featurize_mod
    from gcc_tpu.features import featurize_batch

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
        num_samples=10_000, num_workers=1, prefetch=8,
        threads_per_worker=2, mode="thread",
    )

    def log(msg):
        print(f"[diag] {msg}", flush=True)

    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        pairs = [next(pipe) for _ in range(spc)]
        bq, bk = pairs[0]
        sq = stack_batches([q for q, _ in pairs])
        sk = stack_batches([k for _, k in pairs])
        dq, dk = jax.device_put((sq, sk))

        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, jax.device_put(bq),
            total_steps=100_000, n_max=bench.N_MAX,
        )

        def time_calls(fn, *args, n_calls=10, state_arg=None):
            # warm/compile
            if state_arg is not None:
                s, m = fn(state_arg, *args)
                _ = np.asarray(jax.tree_util.tree_leaves(m)[0])
                t0 = time.time()
                for _ in range(n_calls):
                    s, m = fn(s, *args)
                _ = np.asarray(jax.tree_util.tree_leaves(m)[0])
            else:
                out = fn(*args)
                _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
                t0 = time.time()
                for _ in range(n_calls):
                    out = fn(*args)
                _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            return (time.time() - t0) / n_calls

        # --- full step -------------------------------------------------
        step_fn, pack, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                  n_max=bench.N_MAX)
        packed = pack(state)
        dt = time_calls(step_fn, dq, dk, state_arg=packed)
        log(f"full step: {1e3 * dt / spc:.2f} ms/step")

        # --- featurize-only (scan over the K stacked wire batches) -----
        @jax.jit
        def feat_only(bq_stack, bk_stack):
            def body(c, xs):
                q, k = xs
                from gcc_tpu.graph.batch import concat_padded
                both = concat_padded(_as_padded(q, bench.N_MAX),
                                     _as_padded(k, bench.N_MAX))
                f = featurize_batch(both, cfg.encoder.positional_embedding_size,
                                    pe_method=cfg.encoder.pe_method)
                return c + jnp.sum(f.pos[0, 0]), None

            out, _ = jax.lax.scan(body, 0.0, (bq_stack, bk_stack))
            return out

        dt = time_calls(feat_only, dq, dk)
        log(f"featurize-only (PE subspace+pallas): {1e3 * dt / spc:.2f} ms/step")

        # --- featurize with XLA fallback PE -----------------------------
        os.environ["GCC_TPU_PE_PALLAS"] = "0"
        dt = time_calls(jax.jit(feat_only.__wrapped__), dq, dk)
        log(f"featurize-only (PE subspace, XLA ops): {1e3 * dt / spc:.2f} ms/step")
        os.environ["GCC_TPU_PE_PALLAS"] = "1"

        # --- step with PE zeroed ----------------------------------------
        orig = featurize_mod.laplacian_positional_embedding

        def zero_pe(batch, pos_size, adj=None, **kw):
            return jnp.zeros(batch.node_mask.shape + (pos_size,), jnp.float32)

        featurize_mod.laplacian_positional_embedding = zero_pe
        try:
            step0, pack0, _ = make_packed_multi_step(cfg, enc, tx, state,
                                                     n_max=bench.N_MAX)
            packed0 = pack0(state)
            dt = time_calls(step0, dq, dk, state_arg=packed0)
            log(f"step with PE zeroed: {1e3 * dt / spc:.2f} ms/step")
        finally:
            featurize_mod.laplacian_positional_embedding = orig


if __name__ == "__main__":
    main()
