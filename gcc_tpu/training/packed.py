"""Packed-state dispatch: flatten the training state across the RPC boundary.

The PretrainState pytree has ~258 leaves (5-layer GIN params + BN
buffers + EMA copies + Adam moments + queue). On remote-TPU relays every
dispatch pays per-leaf RPC overhead on donated inputs and returned
buffer handles — ~0.1 ms/leaf, i.e. ~25 ms/dispatch of pure bookkeeping
that dwarfs the ~3 ms of device compute per step (docs/PERF.md).

This module packs the state into ONE flat 1-D array per dtype at the
dispatch boundary (3 arrays: f32/i32/u32) and unpacks it inside the
jitted program with static slices — a ~5 MB on-device copy (~10 us),
traded for removing ~250 leaves of per-dispatch RPC chatter. The
reference has no analog (single-process CUDA, train.py:350-478); this is
purely a remote-dispatch optimization and is bit-identical to the
unpacked path (tests/test_contrastive_training.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from gcc_tpu.config import TrainConfig
from gcc_tpu.graph.batch import CompactWireBatch
from gcc_tpu.training.pretrain import (
    _hoist_featurize,
    featurize_e2e_split,
    featurize_pair,
    featurize_stacked,
    featurize_stacked_dp,
    make_e2e_split_step,
    make_step_from_feats,
    parse_e2e_split,
    split_feats_qk_dp,
)


def _scan_unroll() -> int:
    """lax.scan unroll factor for the K-step dispatch
    (GCC_TPU_SCAN_UNROLL, default 1). The step chain is serial in the
    training state, but unrolling exposes adjacent steps' independent
    ops (step t's queue/EMA/metrics tail vs step t+1's forward) to
    XLA's scheduler. Measured (docs/PERF.md round-5 unroll section):
    unroll=2 is the first positive mover of the latency-pinned step —
    0.630 -> 0.620 ms/step device-resident on the production routed
    bucket (unroll=4 in between, large bucket neutral), with the role-v2
    downstream gate exactly equal (0.7663 paired seed). Default stays 1:
    the win is ~1.7% on a step the host wall already hides, unrolled
    programs are only reassociation-equal (~2e-5 state drift vs the
    unroll=1 programs every recorded A/B and the packed==unpacked
    1e-6 test are anchored to), and the scan-body compile doubles."""
    import os

    return max(1, int(os.environ.get("GCC_TPU_SCAN_UNROLL", "1")))


def make_state_packer(
    template_state: Any,
) -> tuple[Callable[[Any], tuple], Callable[[tuple], Any]]:
    """Build (pack, unpack) for pytrees shaped like ``template_state``.

    pack(state) -> tuple of 1-D arrays, one per distinct leaf dtype (in
    first-seen flatten order). unpack is its exact inverse. Both are pure
    and jit-compatible (all offsets static).
    """
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    specs = [(tuple(l.shape), jnp.dtype(l.dtype)) for l in leaves]
    groups: dict[Any, list[int]] = {}
    for i, (_, dt) in enumerate(specs):
        groups.setdefault(dt, []).append(i)
    dtypes = list(groups)

    def pack(state):
        ls = jax.tree_util.tree_flatten(state)[0]
        return tuple(
            jnp.concatenate([jnp.ravel(ls[i]) for i in groups[dt]])
            for dt in dtypes
        )

    def unpack(packed):
        out: list[Any] = [None] * len(specs)
        for vec, dt in zip(packed, dtypes):
            off = 0
            for i in groups[dt]:
                shape = specs[i][0]
                size = int(np.prod(shape, dtype=np.int64)) if shape else 1
                out[i] = jax.lax.slice(vec, (off,), (off + size,)).reshape(shape)
                off += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack


def make_packed_multi_step(
    cfg: TrainConfig, enc, tx, template_state, n_max: int | None = None,
):
    """K-steps-per-dispatch train step over a packed state.

    Returns (step_fn, pack_fn, unpack_fn):
      * step_fn(packed, batches_q, batches_k) -> (packed, metrics) with
        the packed tuple donated; batches are stacked (K, ...) pytrees
        (see :func:`gcc_tpu.training.pretrain.stack_batches`).
      * pack_fn — jitted host->packed conversion (call once at start).
      * unpack_fn — jitted packed->PretrainState (for checkpoints/eval).
    """
    pack, unpack = make_state_packer(template_state)
    step = make_step_from_feats(cfg, enc, tx)
    pos_size = cfg.encoder.positional_embedding_size
    pe_method = cfg.encoder.pe_method
    # E2E size-routed sub-forwards (config.py ContrastConfig.e2e_split):
    # enabled for the E2E objective with a non-empty spec; requires the
    # stacked compact wire (checked per batch below — DP-sharded wires,
    # padded layouts, and unstacked single-step dispatches keep the
    # unsplit path). The class list is parsed per batch against the
    # WIRE's actual batch width and bucket tag (TrainConfig and
    # PipelineConfig batch sizes are set independently by callers;
    # every other featurize path takes b from the wire too).
    use_split = bool(not cfg.contrast.moco and cfg.contrast.e2e_split)
    step_split = make_e2e_split_step(cfg, enc, tx) if use_split else None

    def multi_step(packed, batches_q, batches_k):
        state = unpack(packed)

        meta = getattr(batches_q, "meta", None)
        if (use_split and isinstance(batches_q, CompactWireBatch)
                and meta is not None and meta.ndim == 3):
            classes = parse_e2e_split(cfg.contrast.e2e_split,
                                      int(meta.shape[-1]),
                                      batches_q.n_max or n_max)
            if classes:
                feats, overflow = featurize_e2e_split(
                    batches_q, batches_k, pos_size, pe_method,
                    classes=classes, n_max=n_max,
                )
                state, metrics = jax.lax.scan(step_split, state, feats,
                                              unroll=_scan_unroll())
                metrics["e2e_split_overflow"] = overflow
                return pack(state), metrics
        if meta is not None and meta.ndim == 4:
            # DP-stacked wire ((K, D, ...) leaves, device axis sharded on
            # the mesh "data" axis — pipeline.py PipelineConfig.devices).
            # The packed state is replicated (incl. the 4 MB MoCo queue —
            # replication keeps the enqueue collective-free; the
            # row-sharded-queue alternative lives in
            # parallel/data_parallel.py for large-K setups); GSPMD turns
            # the batched per-graph work into per-device work and inserts
            # the grad/BN psums from the input shardings alone.
            d, b = meta.shape[1], meta.shape[3]
            feats = featurize_stacked_dp(batches_q, batches_k, pos_size,
                                         pe_method, n_max)

            def body_dp(st, f):
                fq, fk = split_feats_qk_dp(f, d, b)
                return step(st, fq, fk)

            state, metrics = jax.lax.scan(body_dp, state, feats,
                                          unroll=_scan_unroll())
            return pack(state), metrics

        if _hoist_featurize():
            # One batched featurize over all K steps — the PE finish is
            # a serial Jacobi chain whose op count doesn't grow with
            # batch, so hoisting pays it once instead of K times. (With
            # the old eigh finish this measured slower; see docs/PERF.md
            # for both datapoints.)
            feats = featurize_stacked(batches_q, batches_k, pos_size,
                                      pe_method, n_max)
            bsz = feats.node_mask.shape[1] // 2

            def body_h(st, f):
                fq = jax.tree_util.tree_map(lambda x: x[:bsz], f)
                fk = jax.tree_util.tree_map(lambda x: x[bsz:], f)
                return step(st, fq, fk)

            state, metrics = jax.lax.scan(body_h, state, feats,
                                          unroll=_scan_unroll())
            return pack(state), metrics

        def body(st, xs):
            bq, bk = xs
            fq, fk = featurize_pair(bq, bk, pos_size, pe_method, n_max)
            return step(st, fq, fk)

        state, metrics = jax.lax.scan(body, state, (batches_q, batches_k),
                                      unroll=_scan_unroll())
        return pack(state), metrics

    return (
        jax.jit(multi_step, donate_argnums=(0,)),
        jax.jit(pack),
        jax.jit(unpack),
    )
