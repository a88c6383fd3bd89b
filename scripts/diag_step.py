"""Decompose the non-featurize train-step cost on the real chip.

Times, device-resident (in-jit fori loops — per-call timings have a
~4.7 ms dispatch floor):
  encoder fwd (q) | fwd+bwd (q) | EMA fwd (k) | optimizer update only
  (precomputed grads) | EMA tree update only | InfoNCE+queue only.

Targets the ~1.4 ms "step with PE zeroed" residue (docs/PERF.md) to
decide whether per-leaf optimizer/EMA op overhead or encoder layer ops
dominate.

Usage: timeout 3000 python scripts/diag_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.contrastive.moco import MoCoQueue, enqueue, moco_logits
    from gcc_tpu.contrastive.losses import nce_softmax_loss
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training.pretrain import (
        create_pretrain_state, featurize_pair,
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
        num_samples=1000, num_workers=0,
    )
    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        bq, bk = next(pipe)
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, jax.device_put(bq),
        total_steps=100_000, n_max=bench.N_MAX,
    )
    feats_q, feats_k = jax.jit(
        lambda a, b: featurize_pair(
            a, b, cfg.encoder.positional_embedding_size,
            cfg.encoder.pe_method, bench.N_MAX)
    )(bq, bk)

    reps = 100
    rng = jax.random.PRNGKey(1)

    def timed(label, make_body, init):
        @jax.jit
        def loop(x):
            def body(i, carry):
                return make_body(carry)
            return jax.lax.fori_loop(0, reps, body, x)

        out = loop(init)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = loop(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"[diag] {label}: {(time.time() - t0) / reps * 1e3:.3f} ms",
              flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(x):
        emb, _ = enc.apply(variables, feats_q, train=True, rngs={"dropout": rng},
                           mutable=["batch_stats"])
        return x + 1e-12 * emb.sum()

    timed("encoder fwd (q)", fwd, jnp.zeros(()))

    def loss_fn(params):
        emb, _ = enc.apply({"params": params,
                            "batch_stats": state.batch_stats},
                           feats_q, train=True, rngs={"dropout": rng},
                           mutable=["batch_stats"])
        return emb.sum()

    grad_fn = jax.grad(loss_fn)

    def fwdbwd(carry):
        g = grad_fn(state.params)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return carry + 1e-12 * leaf.sum()

    timed("encoder fwd+bwd (q)", fwdbwd, jnp.zeros(()))

    grads = jax.jit(grad_fn)(state.params)

    def opt_only(carry):
        opt_state, params = carry
        updates, new_opt = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates)
        return new_opt, params

    timed("optimizer update only", opt_only,
          (state.opt_state, state.params))

    def ema_only(params):
        return jax.tree_util.tree_map(
            lambda e, p: 0.999 * e + 0.001 * p, params, state.params)

    timed("EMA tree update only", ema_only, state.ema_params)

    q_emb = jnp.ones((bench.BATCH_SIZE, 64)) / 8.0
    k_emb = jnp.ones((bench.BATCH_SIZE, 64)) / 8.0

    import jax.numpy as jnp2

    def nce_only(queue):
        logits = moco_logits(queue, q_emb, k_emb, cfg.contrast.nce_t)
        loss = nce_softmax_loss(
            logits, jnp.zeros(bench.BATCH_SIZE, jnp.int32))
        q2 = enqueue(queue, k_emb + 1e-12 * loss)
        return q2

    timed("InfoNCE + queue only", nce_only, state.queue)


if __name__ == "__main__":
    main()
