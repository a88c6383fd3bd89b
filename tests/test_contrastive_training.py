"""Contrastive machinery + fused pretrain step tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcc_tpu.config import (
    ContrastConfig,
    EncoderConfig,
    OptimConfig,
    SamplerConfig,
    TrainConfig,
)
from gcc_tpu.contrastive import (
    enqueue,
    e2e_logits,
    init_queue,
    moco_logits,
    nce_softmax_loss,
)
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.graph.batch import batch_subgraphs
from gcc_tpu.sampling import sample_contrastive_pairs
from gcc_tpu.training import create_pretrain_state, make_train_step
from gcc_tpu.training.schedules import warmup_linear


def test_queue_init_distribution():
    q = init_queue(jax.random.PRNGKey(0), 1024, 64)
    stdv = 1.0 / np.sqrt(64 / 3)
    mem = np.asarray(q.memory)
    assert mem.shape == (1024, 64)
    assert mem.min() >= -stdv and mem.max() <= stdv
    assert abs(mem.mean()) < 0.01


def test_queue_ring_buffer_semantics():
    q = init_queue(jax.random.PRNGKey(0), 8, 2)
    k1 = jnp.ones((3, 2)) * 1
    k2 = jnp.ones((3, 2)) * 2
    k3 = jnp.ones((3, 2)) * 3
    q = enqueue(q, k1)
    assert int(q.index) == 3
    q = enqueue(q, k2)
    q = enqueue(q, k3)
    # After 9 writes into K=8: positions 0..7 filled, position 8 wraps to 0.
    assert int(q.index) == 1
    mem = np.asarray(q.memory)
    np.testing.assert_allclose(mem[0], [3, 3])  # wrapped last write
    np.testing.assert_allclose(mem[1], [1, 1])
    np.testing.assert_allclose(mem[3], [2, 2])
    np.testing.assert_allclose(mem[6], [3, 3])


def test_moco_logits_layout():
    q = init_queue(jax.random.PRNGKey(0), 16, 4)
    qe = jnp.ones((2, 4))
    ke = jnp.ones((2, 4)) * 2
    logits = moco_logits(q, qe, ke, temperature=0.5)
    assert logits.shape == (2, 17)
    np.testing.assert_allclose(np.asarray(logits)[:, 0], 8 / 0.5)


def test_nce_loss_matches_ce():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 9)))
    labels = jnp.zeros(4, jnp.int32)
    loss = nce_softmax_loss(logits, labels)
    ref = -np.mean(
        [np.log(np.exp(l[0]) / np.exp(l).sum()) for l in np.asarray(logits)]
    )
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_e2e_logits_diagonal_positive():
    fq = jnp.eye(3, 8)
    fk = jnp.eye(3, 8) * 2
    logits = e2e_logits(fq, fk, 0.07)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(logits)), 2 / 0.07, rtol=1e-5
    )


def test_legacy_nce_probs_matches_reference_recipe():
    """Oracle for the dead legacy branch (reference memory_moco.py:45-52):
    out = exp(raw/T); Z = out.mean() * n_data on the estimating batch;
    probs = out / Z; a later batch reuses the frozen Z."""
    from gcc_tpu.contrastive import legacy_nce_probs

    rng = np.random.default_rng(3)
    raw = rng.normal(size=(4, 9)).astype(np.float32)
    # t large enough that exp(raw/t) stays in the normal f32 range (XLA
    # flushes denormals to zero, which a strict allclose would flag).
    t, n_data = 0.5, 1234
    logits = jnp.asarray(raw / t)  # moco_logits output is already /T
    probs, z = legacy_nce_probs(logits, n_data, z=-1.0)
    exp = np.exp(raw / t)
    z_ref = exp.mean() * n_data
    np.testing.assert_allclose(float(z), z_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), exp / z_ref, rtol=1e-5)
    # Frozen Z on a subsequent batch.
    raw2 = rng.normal(size=(4, 9)).astype(np.float32)
    probs2, z2 = legacy_nce_probs(jnp.asarray(raw2 / t), n_data, z=z)
    np.testing.assert_allclose(float(z2), z_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs2), np.exp(raw2 / t) / z_ref,
                               rtol=1e-5)


def test_use_softmax_false_trains_with_frozen_z(monkeypatch):
    """Legacy non-softmax NCE as a real training branch (reference
    memory_moco.py:45-52): step-1 loss matches an independently composed
    oracle (explicit q/k forwards -> moco_logits -> legacy_nce_probs ->
    CE), Z is estimated on the first step and FROZEN on the second, and
    the merged-qk step agrees with the unmerged one."""
    import jax.numpy as jnp

    from gcc_tpu.contrastive import legacy_nce_probs, moco_logits
    from gcc_tpu.contrastive import nce_softmax_loss
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.training.pretrain import make_train_step

    rng = np.random.default_rng(11)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=8,
        num_samples=40,
        num_workers=2,
        sampler=SamplerConfig(rw_hops=12),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64, use_softmax=False),
        optim=OptimConfig(learning_rate=0.01),
    )
    qs, ks = sample_contrastive_pairs(
        g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=0
    )
    bq = batch_subgraphs(qs, n_max=32, e_max=256)
    bk = batch_subgraphs(ks, n_max=32, e_max=256)
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, bq, total_steps=100
    )
    assert float(state.nce_z) < 0
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    # Oracle: replicate the unmerged branch's forwards with the step's
    # exact rng splits, then compose the tested loss pieces explicitly.
    rng0, _ = jax.random.split(state.dropout_rng)
    rng_q, rng_k = jax.random.split(rng0)
    fq = featurize_batch(bq, cfg.encoder.positional_embedding_size)
    fk = featurize_batch(bk, cfg.encoder.positional_embedding_size)
    k_emb, _ = enc.apply(
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
        fk, train=True, mutable=["batch_stats"], rngs={"dropout": rng_k},
    )
    q_emb, _ = enc.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        fq, train=True, mutable=["batch_stats"], rngs={"dropout": rng_q},
    )
    logits = moco_logits(state.queue, q_emb, k_emb, cfg.contrast.nce_t)
    probs, z_oracle = legacy_nce_probs(
        logits, cfg.num_samples * cfg.num_workers, z=-1.0)
    loss_oracle = nce_softmax_loss(
        probs, jnp.zeros(probs.shape[0], jnp.int32))

    monkeypatch.setenv("GCC_TPU_MERGED_QK", "0")
    s1, m1 = make_train_step(cfg, enc, tx)(copy(state), bq, bk)
    np.testing.assert_allclose(float(m1["loss"]), float(loss_oracle),
                               rtol=1e-4)
    np.testing.assert_allclose(float(s1.nce_z), float(z_oracle), rtol=1e-4)
    assert float(s1.nce_z) > 0

    # Merged path agrees.
    monkeypatch.setenv("GCC_TPU_MERGED_QK", "1")
    s1m, m1m = make_train_step(cfg, enc, tx)(copy(state), bq, bk)
    np.testing.assert_allclose(float(m1m["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s1m.nce_z), float(s1.nce_z), rtol=1e-5)

    # Second step freezes Z (params changed, so a re-estimate would not
    # reproduce the same value).
    monkeypatch.setenv("GCC_TPU_MERGED_QK", "0")
    s2, m2 = make_train_step(cfg, enc, tx)(copy(s1), bq, bk)
    np.testing.assert_allclose(float(s2.nce_z), float(s1.nce_z), rtol=0,
                               atol=0)
    assert np.isfinite(float(m2["loss"]))


def test_warmup_linear():
    np.testing.assert_allclose(float(warmup_linear(0.05, 0.1)), 0.5)
    np.testing.assert_allclose(float(warmup_linear(0.1, 0.1)), 1.0)
    np.testing.assert_allclose(float(warmup_linear(0.55, 0.1)), 0.5)
    np.testing.assert_allclose(float(warmup_linear(1.0, 0.1)), 0.0)


def _toy_pipeline(moco: bool, steps: int = 12):
    rng = np.random.default_rng(0)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=12),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=moco, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    qs, ks = sample_contrastive_pairs(
        g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=0
    )
    bq = batch_subgraphs(qs, n_max=32, e_max=256)
    bk = batch_subgraphs(ks, n_max=32, e_max=256)
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, bq, total_steps=100
    )
    step_fn = make_train_step(cfg, enc, tx)
    losses = []
    for i in range(steps):
        qs, ks = sample_contrastive_pairs(
            g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=i + 1
        )
        bq = batch_subgraphs(qs, n_max=32, e_max=256)
        bk = batch_subgraphs(ks, n_max=32, e_max=256)
        state, metrics = step_fn(state, bq, bk)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_pretrain_step_e2e_loss_decreases():
    losses, state = _toy_pipeline(moco=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_pretrain_step_moco_trains():
    # MoCo over a short horizon is noisy (warmup LR, near-frozen key
    # encoder): require finite losses, no blow-up, and moving parameters.
    losses, state = _toy_pipeline(moco=True, steps=20)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) + 0.5, losses
    assert int(state.step) == 20


def test_moco_updates_ema_and_queue():
    _, state = _toy_pipeline(moco=True, steps=3)
    # Queue pointer advanced 3 * 8 = 24 positions.
    assert int(state.queue.index) == 24
    # EMA params moved away from exact copy of params but stayed close.
    p = jax.tree_util.tree_leaves(state.params)
    e = jax.tree_util.tree_leaves(state.ema_params)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(p, e)]
    assert max(diffs) > 0


def test_merged_qk_step_matches_unmerged(monkeypatch):
    """The vmapped merged q/k forward (pretrain.py _merged_qk, default on)
    must be per-lane identical to the round-1 two-apply form: same loss,
    same updated params / EMA / BN stats / queue after one step."""
    rng = np.random.default_rng(7)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=12),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    qs, ks = sample_contrastive_pairs(
        g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=0
    )
    bq = batch_subgraphs(qs, n_max=32, e_max=256)
    bk = batch_subgraphs(ks, n_max=32, e_max=256)
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, bq, total_steps=100
    )
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    results = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GCC_TPU_MERGED_QK", flag)
        # make_train_step donates state — feed each variant its own copy.
        results[flag] = make_train_step(cfg, enc, tx)(copy(state), bq, bk)

    (s0, m0), (s1, m1) = results["0"], results["1"]
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m0["prob"]), float(m1["prob"]),
                               rtol=1e-4, atol=1e-6)
    for name in ("params", "ema_params", "batch_stats", "ema_batch_stats"):
        a = jax.tree_util.tree_leaves(getattr(s0, name))
        b = jax.tree_util.tree_leaves(getattr(s1, name))
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0.queue.memory),
                               np.asarray(s1.queue.memory), atol=1e-5)


def test_multi_step_matches_sequential_single_steps():
    from gcc_tpu.training import make_train_multi_step, stack_batches

    rng = np.random.default_rng(0)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=12),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    pairs = []
    for i in range(4):
        qs, ks = sample_contrastive_pairs(
            g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=i
        )
        pairs.append((batch_subgraphs(qs, n_max=32, e_max=256),
                      batch_subgraphs(ks, n_max=32, e_max=256)))

    state1, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, pairs[0][0], total_steps=100)
    single = make_train_step(cfg, enc, tx)
    losses_single = []
    for bq, bk in pairs:
        state1, m = single(state1, bq, bk)
        losses_single.append(float(m["loss"]))

    state2, enc2, tx2 = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, pairs[0][0], total_steps=100)
    multi = make_train_multi_step(cfg, enc2, tx2)
    sq = stack_batches([p[0] for p in pairs])
    sk = stack_batches([p[1] for p in pairs])
    state2, metrics = multi(state2, sq, sk)
    losses_multi = np.asarray(metrics["loss"]).tolist()

    np.testing.assert_allclose(losses_multi, losses_single, rtol=1e-4)
    assert int(state2.step) == 4
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_multi_step_matches_unpacked():
    """Packed-state dispatch (training/packed.py) is bit-compatible with
    the plain multi-step path: same losses, same final state."""
    from gcc_tpu.training import (
        make_packed_multi_step, make_train_multi_step, stack_batches,
    )

    rng = np.random.default_rng(0)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=12),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    pairs = []
    for i in range(4):
        qs, ks = sample_contrastive_pairs(
            g, rng.integers(0, 300, 8), cfg.sampler, rng_seed=i
        )
        pairs.append((batch_subgraphs(qs, n_max=32, e_max=256),
                      batch_subgraphs(ks, n_max=32, e_max=256)))
    sq = stack_batches([p[0] for p in pairs])
    sk = stack_batches([p[1] for p in pairs])

    state1, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, pairs[0][0], total_steps=100)
    multi = make_train_multi_step(cfg, enc, tx)
    state1, m1 = multi(state1, sq, sk)

    state2, enc2, tx2 = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, pairs[0][0], total_steps=100)
    step_fn, pack, unpack = make_packed_multi_step(
        cfg, enc2, tx2, state2)
    packed = pack(state2)
    packed, m2 = step_fn(packed, sq, sk)
    state2 = unpack(packed)

    np.testing.assert_allclose(np.asarray(m2["loss"]),
                               np.asarray(m1["loss"]), rtol=1e-6)
    assert int(state2.step) == 4
    assert int(state2.queue.index) == int(state1.queue.index)
    for a, b in zip(jax.tree_util.tree_leaves(state1),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_featurize_stacked_matches_per_step():
    """The hoisted K-step featurization must equal per-step featurize
    (it is the same per-graph math, batched across scan steps)."""
    from gcc_tpu.training import stack_batches
    from gcc_tpu.training.pretrain import featurize_pair, featurize_stacked

    rng = np.random.default_rng(1)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1500), rng.integers(0, 300, 1500),
        num_nodes=300, symmetrize=True,
    )
    scfg = SamplerConfig(rw_hops=12)
    pairs = []
    for i in range(3):
        qs, ks = sample_contrastive_pairs(
            g, rng.integers(0, 300, 8), scfg, rng_seed=10 + i
        )
        pairs.append((batch_subgraphs(qs, n_max=32, e_max=256),
                      batch_subgraphs(ks, n_max=32, e_max=256)))
    sq = stack_batches([p[0] for p in pairs])
    sk = stack_batches([p[1] for p in pairs])

    stacked = jax.jit(
        lambda a, b: featurize_stacked(a, b, 8, "eigh", None)
    )(sq, sk)

    for i, (bq, bk) in enumerate(pairs):
        fq, fk = jax.jit(
            lambda a, b: featurize_pair(a, b, 8, "eigh", None)
        )(bq, bk)
        bsz = bq.node_mask.shape[0]
        step = jax.tree_util.tree_map(lambda x: x[i], stacked)
        for name, ours, ref in [
            ("q", jax.tree_util.tree_map(lambda x: x[:bsz], step), fq),
            ("k", jax.tree_util.tree_map(lambda x: x[bsz:], step), fk),
        ]:
            for la, lb in zip(jax.tree_util.tree_leaves(ours),
                              jax.tree_util.tree_leaves(ref)):
                np.testing.assert_allclose(
                    np.asarray(la), np.asarray(lb), atol=1e-5,
                    err_msg=f"step {i} view {name}")


def test_hoist_featurize_toggle_equivalence(monkeypatch):
    """The in-scan featurize fallback (GCC_TPU_HOIST_FEATURIZE=0) must
    train to the same state as the default hoisted form (identical
    per-graph math, different program structure)."""
    from gcc_tpu.training import make_train_multi_step
    from gcc_tpu.training.pretrain import stack_batches

    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    rng = np.random.default_rng(2)
    g = CSRGraph.from_edges(
        rng.integers(0, 200, 1000), rng.integers(0, 200, 1000),
        num_nodes=200, symmetrize=True,
    )
    scfg = cfg.sampler
    pairs = []
    for i in range(2):
        qs, ks = sample_contrastive_pairs(
            g, rng.integers(0, 200, cfg.batch_size), scfg, rng_seed=20 + i
        )
        pairs.append((batch_subgraphs(qs, n_max=32, e_max=256),
                      batch_subgraphs(ks, n_max=32, e_max=256)))
    sq = stack_batches([p[0] for p in pairs])
    sk = stack_batches([p[1] for p in pairs])

    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GCC_TPU_HOIST_FEATURIZE", flag)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, pairs[0][0], total_steps=100,
            n_max=32,
        )
        fn = make_train_multi_step(cfg, enc, tx, n_max=32)
        state, metrics = fn(state, sq, sk)
        results[flag] = (state, np.asarray(metrics["loss"]))
    np.testing.assert_allclose(results["1"][1], results["0"][1], atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results["1"][0]),
                    jax.tree_util.tree_leaves(results["0"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_routed_bucket_invariance():
    """The same wire content tagged with different n_max buckets (the
    routing tag, graph/batch.py) produces the same loss: padding-size
    invariance of featurize + encoder + contrast. Uses pe_method="eigh"
    (the subspace PE's fixed random init basis depends on N, so buckets
    differ by the usual clustered-spectrum ambiguity there)."""
    import dataclasses

    from gcc_tpu.graph.batch import CompactWireBatch, pack_edge_ids
    from gcc_tpu.sampling import sample_contrastive_pairs

    rng = np.random.default_rng(2)
    g = CSRGraph.from_edges(
        rng.integers(0, 300, 1200), rng.integers(0, 300, 1200),
        num_nodes=300, symmetrize=True,
    )
    cfg = TrainConfig(
        batch_size=6,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )

    def wire(subs, n_max_tag, e_tot=512):
        src = np.concatenate([s.src for s in subs]).astype(np.int32)
        dst = np.concatenate([s.dst for s in subs]).astype(np.int32)
        packed, bits = pack_edge_ids(src, dst, 256)
        edges = np.zeros(e_tot, np.uint16)
        edges[: packed.size] = packed
        meta = np.stack([
            np.array([s.num_nodes for s in subs], np.int32),
            np.array([len(s.src) for s in subs], np.int32),
            np.zeros(len(subs), np.int32),
        ])
        return CompactWireBatch(edges=edges, meta=meta, e_max=256,
                                id_bits=bits, n_max=n_max_tag)

    qs, ks = sample_contrastive_pairs(
        g, rng.integers(0, 300, 6), cfg.sampler, rng_seed=3
    )
    assert max(s.num_nodes for s in qs + ks) <= 32
    bq32, bk32 = wire(qs, 32), wire(ks, 32)
    bq64, bk64 = wire(qs, 64), wire(ks, 64)

    # Feature-level invariance: degrees/masks/seed EXACT across buckets;
    # PE equal except within (near-)degenerate eigenspaces, where eigh at
    # different padded sizes may pick different orthonormal bases (the
    # same ambiguity the reference's ARPACK has across runs,
    # data_util.py random v0 — leaf-node orbits of RWR subgraphs make
    # such degeneracies routine).
    from gcc_tpu.training.pretrain import featurize_pair

    f32 = jax.jit(lambda a, b: featurize_pair(a, b, 8, "eigh", None))(
        bq32, bk32)
    f64 = jax.jit(lambda a, b: featurize_pair(a, b, 8, "eigh", None))(
        bq64, bk64)
    for a, b in zip(f32, f64):
        n32 = a.node_mask.shape[1]
        np.testing.assert_array_equal(np.asarray(a.degrees),
                                      np.asarray(b.degrees)[:, :n32])
        np.testing.assert_array_equal(np.asarray(a.node_mask),
                                      np.asarray(b.node_mask)[:, :n32])
        # PE is compared only through the loss below: even the
        # rotation-insensitive Gram P·Pᵀ is ambiguous when a degenerate
        # eigenvalue cluster straddles the top-k cutoff (the retained
        # subspace itself then depends on the arbitrary in-cluster basis
        # — measured 0.26% of entries off by O(1) on this fixture).

    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, bq32, total_steps=100
    )
    step_fn = make_train_step(cfg, enc, tx)
    state2 = jax.tree_util.tree_map(jnp.copy, state)  # step donates input
    s32, m32 = step_fn(state, bq32, bk32)
    s64, m64 = step_fn(state2, bq64, bk64)
    np.testing.assert_allclose(float(m32["loss"]), float(m64["loss"]),
                               rtol=2e-2)
    assert np.isfinite(float(m32["grad_norm"]))
    assert np.isfinite(float(m64["grad_norm"]))


def _mk_wire_stack(pairs_per_step, n_max_tag, e_tot=1024):
    """Stack K steps of subgraph-pair lists into (K, ...) compact wires."""
    import dataclasses as _dc

    from gcc_tpu.graph.batch import CompactWireBatch, pack_edge_ids

    def one(subs):
        src = np.concatenate([s.src for s in subs]).astype(np.int32)
        dst = np.concatenate([s.dst for s in subs]).astype(np.int32)
        packed, bits = pack_edge_ids(src, dst, 256)
        edges = np.zeros(e_tot, np.uint16)
        edges[: packed.size] = packed
        meta = np.stack([
            np.array([s.num_nodes for s in subs], np.int32),
            np.array([len(s.src) for s in subs], np.int32),
            np.array([getattr(s, "seed", 0) or 0 for s in subs], np.int32),
        ])
        return edges, meta, bits

    qs = [one([q for q, _ in step]) for step in pairs_per_step]
    ks = [one([k for _, k in step]) for step in pairs_per_step]
    bits = qs[0][2]
    mk = lambda items: CompactWireBatch(
        edges=np.stack([e for e, _, _ in items]),
        meta=np.stack([m for _, m, _ in items]),
        e_max=256, id_bits=bits, n_max=n_max_tag,
    )
    return mk(qs), mk(ks)


def _random_subgraph(rng, n, seed_pos=0):
    from gcc_tpu.graph.batch import Subgraph

    e = 3 * n
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    s = np.concatenate([src[keep], dst[keep]]).astype(np.int32)
    d = np.concatenate([dst[keep], src[keep]]).astype(np.int32)
    return Subgraph(src=s, dst=d, num_nodes=n, seed=seed_pos)


@pytest.mark.parametrize("classes", [
    ((32, 4), (64, 2)),
    ((24, 2), (32, 2), (64, 2)),
])
def test_featurize_e2e_split_routes_exactly(classes):
    """featurize_e2e_split's slotting + multi-bucket adjacency scatter
    must reproduce, per graph, exactly the adjacency/degrees/masks/seed
    the unsplit full-bucket featurize computes (PE derives from the
    adjacency through the shared solver and is compared elsewhere —
    bucket-size PE ambiguity notes in test_routed_bucket_invariance)."""
    from gcc_tpu.training.pretrain import (
        featurize_e2e_split, featurize_stacked,
    )

    rng = np.random.default_rng(0)
    k_steps, b, n_max = 2, 6, 64
    sizes = [[(10, 12), (40, 9), (20, 20), (8, 8), (30, 44), (16, 9)],
             [(12, 10), (11, 13), (50, 21), (9, 30), (22, 22), (31, 32)]]
    pairs_per_step = [
        [( _random_subgraph(rng, nq, seed_pos=1),
           _random_subgraph(rng, nk, seed_pos=2)) for nq, nk in step]
        for step in sizes
    ]
    wq, wk = _mk_wire_stack(pairs_per_step, 0)
    feats_all, overflow = jax.jit(
        lambda a, b: featurize_e2e_split(a, b, 8, "eigh", classes, n_max)
    )(wq, wk)
    ref = jax.jit(
        lambda a, b: featurize_stacked(a, b, 8, "eigh", n_max))(wq, wk)
    assert np.asarray(overflow).tolist() == [0, 0]

    bounds = [0]
    for _, cap in classes:
        bounds.append(bounds[-1] + cap)
    nq = np.stack([[p[0].num_nodes for p in st] for st in pairs_per_step])
    nk = np.stack([[p[1].num_nodes for p in st] for st in pairs_per_step])
    mx = np.maximum(nq, nk)
    cls_of = sum((mx > n_b).astype(int) for n_b, _ in classes[:-1])
    for t in range(k_steps):
        order = np.argsort(cls_of[t], kind="stable")
        rank = np.argsort(order, kind="stable")
        for g in range(b):
            r = rank[g]
            k = next(i for i in range(len(classes))
                     if r < bounds[i + 1])
            feats = feats_all[k]
            n_b, c_b = classes[k]
            row = r - bounds[k]
            for side, off_ref in ((0, 0), (1, b)):
                frow = jax.tree_util.tree_map(
                    lambda x: np.asarray(x[t][side * c_b + row]), feats)
                rrow = jax.tree_util.tree_map(
                    lambda x: np.asarray(x[t][off_ref + g]), ref)
                np.testing.assert_array_equal(frow.degrees,
                                              rrow.degrees[:n_b])
                np.testing.assert_array_equal(frow.node_mask,
                                              rrow.node_mask[:n_b])
                np.testing.assert_array_equal(frow.seed_flag,
                                              rrow.seed_flag[:n_b])
                np.testing.assert_array_equal(frow.adj,
                                              rrow.adj[:n_b, :n_b])
                assert rrow.adj[n_b:].sum() == 0
                assert np.isfinite(frow.pos).all()


def test_e2e_split_step_trains_and_reports_overflow():
    """The split E2E multi-step runs the production dispatch shape, its
    loss tracks the unsplit path (BN groups differ by documented
    design — compare leniently), and large-class overflow is counted."""
    import dataclasses

    from gcc_tpu.training import create_pretrain_state
    from gcc_tpu.training.packed import make_packed_multi_step

    rng = np.random.default_rng(1)
    b, n_small, n_max = 6, 32, 64
    sizes = [[(10, 12), (40, 9), (20, 20), (8, 8), (30, 44), (16, 9)]]
    pairs = [[(_random_subgraph(rng, nq, 1), _random_subgraph(rng, nk, 2))
              for nq, nk in st] for st in sizes]
    wq, wk = _mk_wire_stack(pairs, 0)

    base = TrainConfig(
        batch_size=b,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=False, nce_k=b - 1,
                                e2e_split="32:4"),
        optim=OptimConfig(learning_rate=0.01),
    )
    results = {}
    for split in (True, False):
        cfg = base if split else dataclasses.replace(
            base, contrast=dataclasses.replace(base.contrast,
                                               e2e_split=""))
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg,
            jax.tree_util.tree_map(lambda x: x[0], wq),
            total_steps=100, n_max=n_max,
        )
        step_fn, pack, unpack = make_packed_multi_step(cfg, enc, tx, state,
                                                       n_max=n_max)
        packed, metrics = step_fn(pack(state), wq, wk)
        results[split] = metrics
    m_split, m_ref = results[True], results[False]
    assert np.asarray(m_split["e2e_split_overflow"]).tolist() == [0]
    assert "e2e_split_overflow" not in m_ref
    l_s, l_r = float(m_split["loss"][0]), float(m_ref["loss"][0])
    assert np.isfinite(l_s) and np.isfinite(l_r)

    # Manual reference: the SAME 4-sub-forward BN grouping (q-small,
    # q-large, k-small, k-large in slot order) applied to the unsplit
    # full-bucket features. Pins the split machinery (feature routing +
    # forward order + rng chain) to an explicitly-constructed oracle;
    # the remaining delta vs the unsplit loss is the documented
    # size-grouped-BN deviation (large at batch 6 with a 2-pair group;
    # vanishing at the production 240/16 capacities).
    from gcc_tpu.contrastive import e2e_logits as _e2e_logits
    from gcc_tpu.training.pretrain import featurize_stacked

    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), base,
        jax.tree_util.tree_map(lambda x: x[0], wq),
        total_steps=100, n_max=n_max,
    )
    ref_feats = jax.jit(
        lambda a, b: featurize_stacked(a, b, 8, "eigh", n_max))(wq, wk)
    f0 = jax.tree_util.tree_map(lambda x: x[0], ref_feats)
    nq = np.array([p[0].num_nodes for p in pairs[0]])
    nk = np.array([p[1].num_nodes for p in pairs[0]])
    order = np.argsort((nq > n_small) | (nk > n_small), kind="stable")
    c_small = 4

    def manual_loss():
        rng, _ = jax.random.split(state.dropout_rng)
        rngs = jax.random.split(rng, 4)
        take = lambda rows, off: jax.tree_util.tree_map(
            lambda x: x[np.asarray(rows) + off], f0)
        groups = [(order[:c_small], 0), (order[c_small:], 0),
                  (order[:c_small], b), (order[c_small:], b)]
        stats = state.batch_stats
        embs = []
        for (rows, off), r in zip(groups, rngs):
            e, mut = enc.apply(
                {"params": state.params, "batch_stats": stats},
                take(rows, off), train=True, mutable=["batch_stats"],
                rngs={"dropout": r},
            )
            stats = mut["batch_stats"]
            embs.append(e)
        q_emb = jnp.concatenate(embs[:2])
        k_emb = jnp.concatenate(embs[2:])
        logits = _e2e_logits(q_emb, k_emb, base.contrast.nce_t)
        labels = jnp.arange(q_emb.shape[0], dtype=jnp.int32)
        return float(nce_softmax_loss(logits, labels))

    # Tolerance covers only the PE bucket-size ambiguity (32 vs 64 —
    # see test_routed_bucket_invariance); the grouping math is pinned.
    np.testing.assert_allclose(l_s, manual_loss(), rtol=2e-2)

    # Overflow case: 4 large pairs into c_large=2 slots — counted, and
    # the program still runs (truncated encodes, finite loss).
    sizes_of = [[(40, 12), (40, 9), (40, 20), (8, 8), (30, 44), (16, 9)]]
    pairs_of = [[(_random_subgraph(rng, nq, 1), _random_subgraph(rng, nk, 2))
                 for nq, nk in st] for st in sizes_of]
    wq2, wk2 = _mk_wire_stack(pairs_of, 0)
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), base,
        jax.tree_util.tree_map(lambda x: x[0], wq2),
        total_steps=100, n_max=n_max,
    )
    step_fn, pack, _ = make_packed_multi_step(base, enc, tx, state,
                                              n_max=n_max)
    _, metrics = step_fn(pack(state), wq2, wk2)
    assert np.asarray(metrics["e2e_split_overflow"]).tolist() == [2]
    assert np.isfinite(float(metrics["loss"][0]))


def test_parse_e2e_split_edge_cases():
    """Spec parsing: valid specs gain the full-bucket remainder class;
    inapplicable specs (capacity >= batch, non-ascending or duplicate
    buckets, bucket >= n_max, empty, missing n_max) disable cleanly."""
    from gcc_tpu.training.pretrain import parse_e2e_split

    assert parse_e2e_split("128:240", 256, 256) == ((128, 240), (256, 16))
    assert parse_e2e_split("80:224,128:20", 256, 256) == (
        (80, 224), (128, 20), (256, 12))
    assert parse_e2e_split("", 256, 256) is None
    assert parse_e2e_split("128:240", 256, None) is None
    assert parse_e2e_split("128:240", 240, 256) is None   # no remainder
    assert parse_e2e_split("128:256", 256, 256) is None   # cap >= batch
    assert parse_e2e_split("128:100,80:100", 256, 256) is None  # order
    assert parse_e2e_split("128:100,128:100", 256, 256) is None  # dup
    assert parse_e2e_split("256:100", 256, 256) is None   # >= n_max
    assert parse_e2e_split("128:0", 256, 256) is None     # empty class
