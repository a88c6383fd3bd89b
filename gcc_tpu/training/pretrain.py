"""Contrastive pre-training: state container + fused train step.

The reference's per-step sequence — two encoder forwards, contrast
logits, InfoNCE loss, backward, grad clip, warmup-linear Adam step, EMA
momentum update, queue enqueue (train.py:350-478) — compiles here into a
single XLA program per size bucket, including the on-device batch
featurization (positional embedding etc.) that the reference does on CPU
in DataLoader workers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gcc_tpu.config import TrainConfig
from gcc_tpu.contrastive import (
    MoCoQueue,
    e2e_logits,
    enqueue,
    init_queue,
    legacy_nce_probs,
    moco_logits,
    nce_softmax_loss,
)
from gcc_tpu.features import featurize_batch
from gcc_tpu.graph.batch import (
    CompactWireBatch,
    PaddedSubgraphBatch,
    WireBatch,
    concat_padded,
    expand_compact,
    expand_wire,
)
from gcc_tpu.models import GraphEncoder
from gcc_tpu.training.optim import build_optimizer
from gcc_tpu.training.schedules import make_lr_schedule


class PretrainState(NamedTuple):
    params: Any
    batch_stats: Any
    ema_params: Any        # key-encoder parameters (MoCo momentum copy)
    ema_batch_stats: Any   # key encoder keeps its own BN buffers
    queue: MoCoQueue
    opt_state: Any
    step: jax.Array
    dropout_rng: jax.Array
    # Legacy non-softmax NCE normalizer Z (reference memory_moco.py:45-52):
    # < 0 means "not yet estimated"; set from the first batch and frozen
    # thereafter. Unused (passes through) when use_softmax=True.
    nce_z: jax.Array


def _as_padded(batch, n_max: int | None) -> PaddedSubgraphBatch:
    if isinstance(batch, CompactWireBatch):
        n_max = batch.n_max or n_max  # routed batches carry their bucket
        assert n_max is not None, "n_max required to expand a wire batch"
        return expand_compact(batch, n_max)
    if isinstance(batch, WireBatch):
        assert n_max is not None, "n_max required to expand a WireBatch"
        return expand_wire(batch, n_max)
    return batch


def create_pretrain_state(
    rng: jax.Array, cfg: TrainConfig, sample_batch,
    total_steps: int, n_max: int | None = None,
) -> tuple[PretrainState, GraphEncoder, optax.GradientTransformation]:
    """Initialize encoder params (EMA = exact copy, reference
    moment_update(m=0) train.py:623-624), queue, optimizer.

    sample_batch may be a PaddedSubgraphBatch or a WireBatch (+ n_max)."""
    enc = GraphEncoder(cfg.encoder)
    init_rng, queue_rng, dropout_rng = jax.random.split(rng, 3)

    # One jitted program for featurize+init: eager per-op dispatch is
    # pathologically slow through remote-TPU relays.
    @jax.jit
    def _init(batch):
        feats = featurize_batch(
            _as_padded(batch, n_max), cfg.encoder.positional_embedding_size,
            pe_method=cfg.encoder.pe_method,
        )
        return enc.init(init_rng, feats, train=False)

    variables = _init(sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    queue = init_queue(queue_rng, cfg.contrast.nce_k, cfg.encoder.output_size)
    tx = build_optimizer(
        cfg.optim,
        make_lr_schedule(cfg.optim.learning_rate, total_steps,
                         cfg.optim.warmup),
    )
    state = PretrainState(
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        queue=queue,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        dropout_rng=dropout_rng,
        nce_z=jnp.full((), -1.0, jnp.float32),
    )
    return state, enc, tx


def make_step_from_feats(cfg: TrainConfig, enc: GraphEncoder, tx):
    """Build the (unjitted) train step over pre-featurized batches.

    Featurization is split out so multi-step dispatches can hoist it out
    of the lax.scan and run it batched over all K steps at once (the
    featurize ops are launch-overhead-bound; batching amortizes each op
    K×). Returns step(state, feats_q, feats_k) -> (state, metrics)."""
    moco = cfg.contrast.moco
    temperature = cfg.contrast.nce_t
    alpha = cfg.contrast.alpha
    use_softmax = cfg.contrast.use_softmax
    # Legacy non-softmax NCE (reference memory_moco.py:45-52): the MoCo
    # logits become exp(l/T)/Z probabilities with Z frozen from the first
    # batch, then fed to the SAME CE criterion (the reference feeds the
    # probabilities to NCESoftmaxLoss as if they were logits —
    # train.py:634, criterions.py:5-17 — reproduced faithfully). n_data
    # is the reference's MemoryMoCo outputSize = len(dataset)
    # (train.py:627-628): samples per epoch across workers here. Dead
    # code at reference defaults (use_softmax hardcoded True) but a real
    # selectable branch, per SURVEY §2a. E2E ignores the flag, exactly
    # like the reference (use_softmax lives only in MemoryMoCo).
    # num_workers=0 is the synchronous in-process mode — one logical
    # worker, like loop.py/_spe and pipeline.steps_per_epoch count it.
    n_data = cfg.num_samples * max(1, cfg.num_workers)

    def moco_loss_and_prob(logits, z):
        if use_softmax:
            loss = nce_softmax_loss(
                logits, jnp.zeros(logits.shape[0], jnp.int32))
            return loss, logits[:, 0].mean(), z
        probs, z_used = legacy_nce_probs(logits, n_data, z)
        loss = nce_softmax_loss(
            probs, jnp.zeros(logits.shape[0], jnp.int32))
        return loss, probs[:, 0].mean(), z_used

    def step_from_feats(state: PretrainState, feats_q, feats_k):
        rng, new_rng = jax.random.split(state.dropout_rng)
        rng_q, rng_k = jax.random.split(rng)

        if moco and _merged_qk():
            # Merged q/k forward: the query (grad) and key (EMA) encoders
            # are architecturally identical and mutually independent, but
            # the TPU runs one op at a time, so two separate applies make
            # the scan body's serial dependency chain pay the encoder op
            # count TWICE (the chain is dependency-bound, not FLOP-bound —
            # docs/PERF.md lever 1). Stack (params, ema_params) on a
            # leading lane axis and vmap ONE apply over it: same op
            # count as a single forward, 2x batch per op. The wasted
            # lane-1 backward (zero cotangent through stop_gradient)
            # rides the same batched ops for free. Per-lane math is
            # identical to the unmerged path (test_merged_qk_step).
            stack2 = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.stack([x, y]), a, b)
            feats2 = stack2(feats_q, feats_k)
            stats2 = stack2(state.batch_stats, state.ema_batch_stats)
            # vmap can't carry typed PRNG keys as plain operands — ship
            # raw key data and re-wrap inside (no-op for legacy keys).
            typed = jnp.issubdtype(rng_q.dtype, jax.dtypes.prng_key)
            unkey = jax.random.key_data if typed else (lambda x: x)
            rekey = jax.random.wrap_key_data if typed else (lambda x: x)
            rngs2 = jnp.stack([unkey(rng_q), unkey(rng_k)])

            def loss_fn(params):
                p2 = stack2(params, state.ema_params)

                def fwd(p, s, f, r):
                    return enc.apply(
                        {"params": p, "batch_stats": s}, f, train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": rekey(r)},
                    )

                emb2, mut2 = jax.vmap(fwd)(p2, stats2, feats2, rngs2)
                q_emb = emb2[0]
                k_emb = jax.lax.stop_gradient(emb2[1])
                logits = moco_logits(state.queue, q_emb, k_emb, temperature)
                loss, prob, new_z = moco_loss_and_prob(logits, state.nce_z)
                return loss, (mut2["batch_stats"], k_emb, prob, new_z)

            (loss, (stats2_new, k_emb, prob, new_z)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state.params))
            new_stats = jax.tree_util.tree_map(lambda x: x[0], stats2_new)
            ema_mut = {"batch_stats": jax.tree_util.tree_map(
                lambda x: x[1], stats2_new)}
        elif moco:
            # Key encoder: EMA params, BN kept in train mode (batch stats,
            # running buffers updated — reference train.py:360-365), no
            # gradients.
            k_emb, ema_mut = enc.apply(
                {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats},
                feats_k, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng_k},
            )
            k_emb = jax.lax.stop_gradient(k_emb)

            def loss_fn(params):
                q_emb, mut = enc.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats_q, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng_q},
                )
                logits = moco_logits(state.queue, q_emb, k_emb, temperature)
                loss, prob, new_z = moco_loss_and_prob(logits, state.nce_z)
                return loss, (mut["batch_stats"], prob, new_z)

            (loss, (new_stats, prob, new_z)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        else:
            # E2E: both views through the same encoder, in-batch negatives.
            def loss_fn(params):
                q_emb, mut_q = enc.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats_q, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng_q},
                )
                k_emb, mut_k = enc.apply(
                    {"params": params, "batch_stats": mut_q["batch_stats"]},
                    feats_k, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng_k},
                )
                logits = e2e_logits(q_emb, k_emb, temperature)
                labels = jnp.arange(q_emb.shape[0], dtype=jnp.int32)
                loss = nce_softmax_loss(logits, labels)
                prob = jnp.diagonal(logits).mean()
                return loss, (mut_k["batch_stats"], prob)

            (loss, (new_stats, prob)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        if moco:
            # EMA after the optimizer step (reference train.py:430-431),
            # computed on the raveled vector: the per-leaf tree_map costs
            # ~1 HLO per leaf per step (docs/PERF.md scan-body trace).
            from jax.flatten_util import ravel_pytree

            flat_e, unravel = ravel_pytree(state.ema_params)
            flat_p, _ = ravel_pytree(new_params)
            new_ema = unravel(alpha * flat_e + (1.0 - alpha) * flat_p)
            new_state = state._replace(
                params=new_params,
                batch_stats=new_stats,
                ema_params=new_ema,
                ema_batch_stats=ema_mut["batch_stats"],
                queue=enqueue(state.queue, k_emb),
                opt_state=new_opt_state,
                step=state.step + 1,
                dropout_rng=new_rng,
                nce_z=new_z,
            )
        else:
            new_state = state._replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
                dropout_rng=new_rng,
            )

        # Norm of the raveled gradient (same value as optax.global_norm,
        # one reduce instead of one per leaf).
        from jax.flatten_util import ravel_pytree

        grad_norm = jnp.linalg.norm(ravel_pytree(grads)[0])
        metrics = {"loss": loss, "prob": prob, "grad_norm": grad_norm}
        return new_state, metrics

    return step_from_feats


def _featurize_compact_segments(wires_q: CompactWireBatch,
                                wires_k: CompactWireBatch,
                                pos_size: int, pe_method: str, n_max: int,
                                k_steps: int):
    """Featurize stacked compact wires ((K, E_tot) edges / (K, 3, B)
    meta, or K=1 with unstacked leaves) in one program, adjacency built
    straight from the packed edge buffer — no padded (B, E_max)
    expansion (features/featurize.py featurize_compact). Returns
    BatchFeatures with (K, 2·bsz, ...) leaves, [:bsz] query / [bsz:] key
    per step."""
    from gcc_tpu.features.featurize import featurize_compact

    n_max = wires_q.n_max or n_max  # routed batches carry their bucket
    lift = (lambda x: x[None]) if k_steps == 1 and wires_q.meta.ndim == 2 \
        else (lambda x: x)
    # Segment order q0, k0, q1, k1, ... flattens to graph order
    # (step0 q graphs, step0 k graphs, step1 q graphs, ...), so the
    # (K, 2·bsz) reshape below is a view.
    edges = jnp.stack([lift(wires_q.edges), lift(wires_k.edges)], axis=1)
    meta = jnp.stack([lift(wires_q.meta), lift(wires_k.meta)], axis=1)
    e_tot = edges.shape[-1]
    bsz = meta.shape[-1]
    feats = featurize_compact(
        edges.reshape(2 * k_steps, e_tot), meta.reshape(2 * k_steps, 3, bsz),
        n_max, wires_q.id_bits, pos_size, pe_method, e_cap=wires_q.e_max,
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((k_steps, 2 * bsz) + x.shape[1:]), feats
    )


def parse_e2e_split(spec: str, batch_size: int, n_max: int | None):
    """Parse ContrastConfig.e2e_split ("n0:cap0,n1:cap1") into the full
    class list ((n0, cap0), ..., (n_max, B − Σcap)), or None when the
    spec is empty/inapplicable (Σcap ≥ B, buckets not ascending, or a
    bucket ≥ n_max — tiny test configs auto-disable this way)."""
    if not spec or n_max is None:
        return None
    classes = []
    for part in spec.split(","):
        nb, cap = part.split(":")
        classes.append((int(nb), int(cap)))
    caps = sum(c for _, c in classes)
    buckets = [nb for nb, _ in classes]
    if (caps >= batch_size or any(c <= 0 for _, c in classes)
            or buckets != sorted(buckets) or len(set(buckets)) != len(buckets)
            or buckets[-1] >= n_max):
        return None
    return tuple(classes) + ((n_max, batch_size - caps),)


def featurize_e2e_split(
    wires_q: CompactWireBatch,
    wires_k: CompactWireBatch,
    pos_size: int,
    pe_method: str,
    classes,
    n_max: int | None,
):
    """Size-routed featurization for the E2E objective (VERDICT r3
    item 2): per scan step, pairs are slotted into the ascending size
    ``classes`` = ((n_0, cap_0), ..., (n_max, cap_last)) — a pair's
    class is the first bucket that fits BOTH its subgraphs, and the
    slot ranking (stable argsort by class) assigns the first cap_0
    ranks to the (·, n_0, n_0) sub-program, the next cap_1 to n_1, and
    so on. The E2E batch composition is preserved — the same B pairs
    enter every step, only their encode bucket differs — and the (B, B)
    in-batch NCE is computed downstream on the CONCATENATED embeddings,
    which is loss-identical under the pair permutation (rows and
    columns permute together; the diagonal stays the diagonal).

    Small pairs spill upward freely (a small graph encodes exactly the
    same in a bigger bucket); the reverse spill (more class-k pairs
    than the slots from boundary k up) would truncate and is counted in
    the returned ``overflow`` (per step); capacities are chosen so its
    probability is ~0 at the measured size distribution (docs/PERF.md).

    Returns (feats_tuple, overflow): one BatchFeatures per class with
    leaves (K, 2·cap, ...) — per step [:cap] is the query half,
    [cap:] the key half — and overflow (K,) int32."""
    from gcc_tpu.features.featurize import BatchFeatures, _MaskBatch
    from gcc_tpu.features.positional import laplacian_positional_embedding

    n_max = wires_q.n_max or n_max
    assert n_max is not None, "n_max required to featurize a wire batch"
    k_steps, _, b = wires_q.meta.shape
    assert sum(c for _, c in classes) == b, (classes, b)
    bounds = [0]
    for _, cap in classes:
        bounds.append(bounds[-1] + cap)

    nq = wires_q.meta[:, 0, :]
    nk = wires_k.meta[:, 0, :]
    mx = jnp.maximum(nq, nk)
    cls = jnp.zeros_like(mx)
    for n_b, _ in classes[:-1]:
        cls = cls + (mx > n_b).astype(mx.dtype)          # (K, B)
    order = jnp.argsort(cls, axis=1, stable=True)        # class-ascending
    rank = jnp.argsort(order, axis=1)                    # graph -> slot rank
    # Overflow at any class boundary k: more pairs of class >= k than
    # slots from that boundary up (those pairs would truncate).
    overflow = jnp.zeros(k_steps, jnp.int32)
    for k in range(1, len(classes)):
        over = (cls >= k).sum(axis=1) - (b - bounds[k])
        overflow = jnp.maximum(overflow, jnp.maximum(0, over))

    id_bits = wires_q.id_bits
    mask_bits = (1 << id_bits) - 1
    e_tot = wires_q.edges.shape[-1]
    e_iota = jnp.arange(e_tot, dtype=jnp.int32)
    t_iota = jnp.arange(k_steps, dtype=jnp.int32)

    def bucket_feats(k: int):
        n_b, c_b = classes[k]
        lo, hi = bounds[k], bounds[k + 1]
        # Node-level leaves: gather per-side meta columns into slot order.
        sel = order[:, lo:hi]
        n_nodes = jnp.concatenate(
            [jnp.take_along_axis(nq, sel, axis=1),
             jnp.take_along_axis(nk, sel, axis=1)], axis=1)   # (K, 2c_b)
        seed = jnp.concatenate(
            [jnp.take_along_axis(wires_q.meta[:, 2, :], sel, axis=1),
             jnp.take_along_axis(wires_k.meta[:, 2, :], sel, axis=1)],
            axis=1)
        iota_n = jnp.arange(n_b, dtype=jnp.int32)
        node_mask = (iota_n[None, None, :]
                     < n_nodes[..., None]).astype(jnp.float32)
        seed_flag = (iota_n[None, None, :]
                     == seed[..., None]).astype(jnp.float32) * node_mask

        # Adjacency: one flat scatter-add over both sides' packed edges,
        # routed by slot rank (build_dense_adjacency_compact with a slot
        # indirection; edges of other buckets drop via OOB targets).
        rows_total = k_steps * 2 * c_b
        flat = jnp.zeros(rows_total * n_b * n_b, jnp.float32)
        for side, w in enumerate((wires_q, wires_k)):
            n_edges = w.meta[:, 1, :]
            cum = jnp.cumsum(n_edges, axis=1)
            gid = jnp.minimum(
                jnp.sum((e_iota[None, :, None]
                         >= cum[:, None, :]).astype(jnp.int32), axis=2),
                b - 1,
            )                                   # (K, E_tot)
            live = e_iota[None, :] < cum[:, -1:]
            r = jnp.take_along_axis(rank, gid, axis=1)
            in_b = (r >= lo) & (r < hi)
            row_in_b = r - lo
            packed = w.edges.astype(jnp.int32)
            src = packed & mask_bits
            dst = (packed >> id_bits) & mask_bits
            # Ids beyond this bucket (an overflowed bigger pair forced
            # into a smaller slot) would bleed into neighboring rows —
            # drop those edges; `overflow` reports the event.
            fits = (src < n_b) & (dst < n_b)
            row = (t_iota[:, None] * (2 * c_b) + side * c_b + row_in_b)
            tgt = jnp.where(
                live & in_b & fits,
                row * (n_b * n_b) + dst * n_b + src,
                rows_total * n_b * n_b,
            )
            flat = flat.at[tgt.reshape(-1)].add(1.0, mode="drop")
        adj = flat.reshape(rows_total, n_b, n_b)

        nm_flat = node_mask.reshape(rows_total, n_b)
        nn_flat = n_nodes.reshape(rows_total)
        pos = laplacian_positional_embedding(
            _MaskBatch(node_mask=nm_flat, n_nodes=nn_flat), pos_size,
            adj=adj, method=pe_method, profile="train",
        )
        deg = adj.sum(axis=2).astype(jnp.int32)
        reshape = lambda x: x.reshape((k_steps, 2 * c_b) + x.shape[1:])
        return BatchFeatures(
            pos=reshape(pos),
            degrees=reshape(deg),
            seed_flag=seed_flag,
            node_mask=node_mask,
            adj=reshape(adj),
        )

    return tuple(bucket_feats(k) for k in range(len(classes))), overflow


def make_e2e_split_step(cfg: TrainConfig, enc: GraphEncoder, tx):
    """E2E train step over size-split features (featurize_e2e_split).

    Same objective as the unsplit E2E branch of make_step_from_feats —
    the (B, B) in-batch NCE on q/k embeddings — with the encoder run as
    2·num_classes sub-forwards (all q classes, then all k classes) and
    the embeddings concatenated. Per-VIEW sub-forwards, never mixed:
    putting q and k rows of the same pairs into ONE BatchNorm group
    leaks statistics between the two views and makes the positives
    artificially easy (measured: in-batch loss drops 5.27 → 3.41 on the
    mixed-BN variant — the leakage MoCo's shuffling-BN exists to
    prevent). The only BN deviation left is size-grouped normalization
    batches (the same documented deviation as routed MoCo emission),
    with running buffers threaded q classes → k classes. Learning
    validated end-to-end in docs/PERF.md (E2E split)."""
    temperature = cfg.contrast.nce_t

    def step(state: PretrainState, feats_tuple):
        rng, new_rng = jax.random.split(state.dropout_rng)
        n_cls = len(feats_tuple)
        rngs = jax.random.split(rng, 2 * n_cls)
        half = lambda f, lo, hi: jax.tree_util.tree_map(
            lambda x: x[lo:hi], f)

        def loss_fn(params):
            def fwd(stats, f, r):
                return enc.apply(
                    {"params": params, "batch_stats": stats}, f,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": r},
                )

            stats = state.batch_stats
            q_embs, k_embs = [], []
            for view, out in ((0, q_embs), (1, k_embs)):
                for k, f in enumerate(feats_tuple):
                    c = f.node_mask.shape[0] // 2
                    emb, mut = fwd(stats, half(f, view * c, (view + 1) * c),
                                   rngs[view * n_cls + k])
                    stats = mut["batch_stats"]
                    out.append(emb)
            q_emb = jnp.concatenate(q_embs, axis=0)
            k_emb = jnp.concatenate(k_embs, axis=0)
            logits = e2e_logits(q_emb, k_emb, temperature)
            labels = jnp.arange(q_emb.shape[0], dtype=jnp.int32)
            loss = nce_softmax_loss(logits, labels)
            prob = jnp.diagonal(logits).mean()
            return loss, (stats, prob)

        (loss, (new_stats, prob)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            dropout_rng=new_rng,
        )
        from jax.flatten_util import ravel_pytree

        grad_norm = jnp.linalg.norm(ravel_pytree(grads)[0])
        return new_state, {"loss": loss, "prob": prob,
                           "grad_norm": grad_norm}

    return step


def featurize_stacked_dp(wires_q: CompactWireBatch,
                         wires_k: CompactWireBatch,
                         pos_size: int, pe_method: str, n_max: int | None):
    """Featurize a DP-stacked dispatch: (K, D, e_dev) edges / (K, D, 3, b)
    meta with the device axis D sharded on the mesh "data" axis
    (sampling/pipeline.py PipelineConfig.devices).

    One vmapped featurize over the K scan steps — same "pay the serial
    PE chain once" win as :func:`featurize_stacked` — with the shape
    algebra arranged so GSPMD keeps everything device-local: every
    reshape merges the sharded D axis only with dims to its MINOR side
    ((D, 2, e) → (D·2, e), contiguous per-device blocks), never across a
    major dim, so no reshape forces a cross-device redistribution.

    Returns BatchFeatures with (K, D·2·b, ...) leaves, inner order
    (device, {query,key}, graph) — split per scan step with
    :func:`split_feats_qk_dp`."""
    from gcc_tpu.features.featurize import featurize_compact

    n_max = wires_q.n_max or n_max
    assert n_max is not None, "n_max required to featurize a wire batch"
    _, d, _, b = wires_q.meta.shape
    e_dev = wires_q.edges.shape[-1]
    edges = jnp.stack([wires_q.edges, wires_k.edges], axis=2)  # (K,D,2,E)
    meta = jnp.stack([wires_q.meta, wires_k.meta], axis=2)     # (K,D,2,3,b)

    def one(e, m):
        # allow_fused=False: this route runs under vmap, and a vmapped
        # pallas_call lowers through the batching rule (extra grid dim +
        # batched scalar prefetch) — a lowering nothing validates on
        # chip. The fused kernel is a measured 2.3x LOSS anyway
        # (docs/PERF.md lever 7b); keep the DP route on the XLA chain
        # unconditionally.
        return featurize_compact(
            e.reshape(d * 2, e_dev), m.reshape(d * 2, 3, b),
            n_max, wires_q.id_bits, pos_size, pe_method, e_cap=wires_q.e_max,
            allow_fused=False,
        )

    return jax.vmap(one)(edges, meta)


def split_feats_qk_dp(feats, d: int, b: int):
    """Split one scan step's (D·2·b, ...) feature leaves into the
    (D·b, ...) query and key halves (inner order (device, {q,k}, graph);
    the D-major merges keep per-device blocks contiguous)."""
    def take(x, v):
        y = x.reshape((d, 2, b) + x.shape[1:])[:, v]
        return y.reshape((d * b,) + x.shape[1:])

    return (jax.tree_util.tree_map(lambda x: take(x, 0), feats),
            jax.tree_util.tree_map(lambda x: take(x, 1), feats))


def featurize_pair(batch_q, batch_k, pos_size: int, pe_method: str,
                   n_max: int | None):
    """Featurize query+key in ONE stacked program (PE dominates step
    time as launch-bound small kernels; fusing halves their count)."""
    if isinstance(batch_q, CompactWireBatch):
        feats = _featurize_compact_segments(batch_q, batch_k, pos_size,
                                            pe_method, n_max, k_steps=1)
        f = jax.tree_util.tree_map(lambda x: x[0], feats)
        bsz = f.node_mask.shape[0] // 2
        return (jax.tree_util.tree_map(lambda x: x[:bsz], f),
                jax.tree_util.tree_map(lambda x: x[bsz:], f))
    batch_q = _as_padded(batch_q, n_max)
    batch_k = _as_padded(batch_k, n_max)
    bsz = batch_q.node_mask.shape[0]
    feats_both = featurize_batch(
        concat_padded(batch_q, batch_k), pos_size, pe_method=pe_method
    )
    feats_q = jax.tree_util.tree_map(lambda x: x[:bsz], feats_both)
    feats_k = jax.tree_util.tree_map(lambda x: x[bsz:], feats_both)
    return feats_q, feats_k


def featurize_stacked(batches_q, batches_k, pos_size: int, pe_method: str,
                      n_max: int | None):
    """Featurize a whole K-step dispatch in one batched program.

    batches_q/k: stacked (K, ...) wire/padded pytrees. Returns a
    BatchFeatures pytree with leaves (K, 2·bsz, ...) — per scan step,
    [:bsz] is the query half and [bsz:] the key half. Featurization is
    per-graph (PE, degrees, seed flag), so batching across steps is
    mathematically identical to per-step featurize while paying each
    SERIAL featurize op once instead of K times. This matters because
    the PE finish is a 155-round Jacobi chain of small ops
    (ops/jacobi.py): per-step inside the scan the chain runs K times;
    hoisted, it runs once on K×-wider tensors. (When the finish was
    XLA's eigh custom call this hoist measured 3% SLOWER — the call was
    FLOP-bound and the 8× dense-adjacency working set cost more than it
    saved; with the op-count-bound Jacobi finish it wins ~20%,
    docs/PERF.md.)"""
    k_steps = jax.tree_util.tree_leaves(batches_q)[0].shape[0]
    if isinstance(batches_q, CompactWireBatch):
        return _featurize_compact_segments(batches_q, batches_k, pos_size,
                                           pe_method, n_max, k_steps)
    padded = []
    for i in range(k_steps):
        take = lambda x: x[i]
        padded.append(_as_padded(jax.tree_util.tree_map(take, batches_q),
                                 n_max))
        padded.append(_as_padded(jax.tree_util.tree_map(take, batches_k),
                                 n_max))
    from gcc_tpu.graph.batch import concat_padded_many

    feats = featurize_batch(concat_padded_many(padded), pos_size,
                            pe_method=pe_method)
    per_step = padded[0].node_mask.shape[0] * 2
    return jax.tree_util.tree_map(
        lambda x: x.reshape((k_steps, per_step) + x.shape[1:]), feats
    )


def make_train_step(cfg: TrainConfig, enc: GraphEncoder, tx,
                    n_max: int | None = None):
    """Build the jitted pretrain step. Recompiles per (N_max, E_max) bucket.

    Accepts PaddedSubgraphBatch or WireBatch inputs (the latter are
    expanded on device, keeping the host→device transfer compact)."""
    step = make_step_from_feats(cfg, enc, tx)
    pos_size = cfg.encoder.positional_embedding_size
    pe_method = cfg.encoder.pe_method

    def train_step(state: PretrainState, batch_q, batch_k):
        feats_q, feats_k = featurize_pair(batch_q, batch_k, pos_size,
                                          pe_method, n_max)
        return step(state, feats_q, feats_k)

    train_step.__raw__ = True
    return jax.jit(train_step, donate_argnums=(0,))


def make_train_multi_step(cfg: TrainConfig, enc: GraphEncoder, tx,
                          n_max: int | None = None):
    """K steps per device call via lax.scan over stacked batches.

    On remote-TPU relays each call pays per-leaf RPC overhead on the
    ~100-leaf training state; scanning K steps inside one program
    amortizes dispatch and host→device transfer by K. Batches are
    WireBatch pytrees with a leading (K, ...) dim (see
    :func:`stack_batches`); returns (state, metrics) with metrics
    leaves stacked (K,)."""
    step = make_step_from_feats(cfg, enc, tx)
    pos_size = cfg.encoder.positional_embedding_size
    pe_method = cfg.encoder.pe_method

    def multi_step(state, batches_q, batches_k):
        if _hoist_featurize():
            # One batched featurize program over all K steps, then scan
            # the encoder/optimizer over the precomputed features: the
            # PE finish is a serial 155-round Jacobi chain, paid once
            # instead of K times (docs/PERF.md).
            feats = featurize_stacked(batches_q, batches_k, pos_size,
                                      pe_method, n_max)
            bsz = feats.node_mask.shape[1] // 2

            def body_h(state, f):
                fq = jax.tree_util.tree_map(lambda x: x[:bsz], f)
                fk = jax.tree_util.tree_map(lambda x: x[bsz:], f)
                return step(state, fq, fk)

            return jax.lax.scan(body_h, state, feats)

        def body(state, xs):
            bq, bk = xs
            fq, fk = featurize_pair(bq, bk, pos_size, pe_method, n_max)
            return step(state, fq, fk)

        return jax.lax.scan(body, state, (batches_q, batches_k))

    return jax.jit(multi_step, donate_argnums=(0,))


def _merged_qk() -> bool:
    """Merge the MoCo query/key forwards into one vmapped apply over
    stacked (params, ema_params) (default on): halves the scan body's
    serial encoder op count — the chain is dependency-bound, so 2x-batch
    ops cost ~the same as 1x (docs/PERF.md lever 1 / session 4). Set
    GCC_TPU_MERGED_QK=0 for the two-apply round-1 form. Per-lane math is
    identical (tests/test_contrastive_training.py
    test_merged_qk_step_matches_unmerged)."""
    import os

    return os.environ.get("GCC_TPU_MERGED_QK", "1") == "1"


def _hoist_featurize() -> bool:
    """Hoist featurization out of the K-step scan (default on): wins
    ~20% with the op-count-bound Jacobi PE finish; set
    GCC_TPU_HOIST_FEATURIZE=0 for the in-scan form (docs/PERF.md)."""
    import os

    return os.environ.get("GCC_TPU_HOIST_FEATURIZE", "1") == "1"


def stack_batches(batches):
    """Stack a list of same-bucket WireBatch/PaddedSubgraphBatch pytrees
    along a new leading axis (host-side numpy)."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches
    )
