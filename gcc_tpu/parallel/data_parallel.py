"""Data-parallel sharding for the pretrain step.

Scale-out model (SURVEY.md §2c — the reference is single-GPU; this is
the added capability): batch sharded over the "data" mesh axis,
parameters/optimizer/EMA replicated (64-hidden model: replication is
free, gradients psum via GSPMD), MoCo queue memory sharded over "data"
rows so each device stores K/D negatives — logits against all negatives
materialize through an ICI all-gather that XLA inserts from the sharding
annotations, and each device's enqueue touches only its own rows modulo
the ring arithmetic.

The train-step *math* is identical to the single-device step (it is the
same traced function); this module only supplies sharding placements, so
single-chip and N-chip runs are bit-identical up to reduction order.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcc_tpu.training.pretrain import PretrainState


def batch_sharding(mesh: Mesh, axis: str = "data"):
    """Sharding tree for WireBatch/PaddedSubgraphBatch leaves: dim 0 is
    the batch dim for every field."""
    return NamedSharding(mesh, P(axis))


def state_shardings(mesh: Mesh, state: PretrainState) -> PretrainState:
    """Placement tree: queue memory row-sharded, everything else
    replicated."""
    repl = NamedSharding(mesh, P())
    def place(x):
        return repl

    placements = jax.tree_util.tree_map(place, state)
    placements = placements._replace(
        queue=state.queue._replace(
            memory=NamedSharding(mesh, P("data")),
            index=repl,
        )
    )
    return placements


def shard_state(mesh: Mesh, state: PretrainState) -> PretrainState:
    return jax.device_put(state, state_shardings(mesh, state))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    from gcc_tpu.graph.batch import CompactWireBatch

    if isinstance(batch, CompactWireBatch):
        if batch.meta.ndim == 4:
            # DP-stacked wire ((K, D, e_dev) edges / (K, D, 3, b) meta,
            # sampling/pipeline.py PipelineConfig.devices): shard the
            # explicit device axis. This is the production DP path —
            # run_pretrain(dp_devices=N) wires it automatically.
            return jax.device_put(
                batch, NamedSharding(mesh, P(None, axis))
            )
        # A flat single-segment edge buffer has no device axis to shard.
        raise ValueError(
            "this CompactWireBatch has no device axis: emit it with "
            "PipelineConfig(devices=N) (stacked/routed), use WireBatch "
            "(compact_wire=False), or expand to PaddedSubgraphBatch "
            "before shard_batch."
        )
    return jax.device_put(batch, batch_sharding(mesh, axis))


def make_combined_train_step(cfg, enc, tx, mesh: Mesh, pg,
                             n_max: int | None = None):
    """ONE jitted program on the combined (data, part) mesh: the DP
    train step (batch sharded over "data", params/queue placed by
    state_shardings) AND a giant-graph partitioned aggregation over
    "part" (SURVEY.md §7 stage 7: the {data, partition} axes compose in
    a single XLA program — e.g. pretraining while a corpus-scale
    embedding refresh rides the part axis; exercised by
    tests/test_parallel.py::test_combined_data_part_mesh and
    __graft_entry__.dryrun_multichip).

    Returns step(state, batch_q, batch_k, h) ->
    (new_state, metrics, aggregated) where h is (N, F) sharded over
    "part" on the same mesh."""
    from gcc_tpu.parallel.partitioned import partitioned_aggregate
    from gcc_tpu.training.pretrain import make_train_step

    jitted = make_train_step(cfg, enc, tx, n_max=n_max)
    raw = jitted.__wrapped__

    def combined(state, batch_q, batch_k, h):
        new_state, metrics = raw(state, batch_q, batch_k)
        agg = partitioned_aggregate(pg, h, mesh, axis="part")
        return new_state, metrics, agg

    return jax.jit(combined, donate_argnums=(0,))


def make_dp_train_step(cfg, enc, tx, mesh: Mesh, n_max: int | None = None):
    """The standard train step jitted with explicit DP shardings."""
    from gcc_tpu.training.pretrain import make_train_step

    # make_train_step returns a jitted fn; rebuild the raw fn with
    # shardings by reaching for its wrapped python function.
    jitted = make_train_step(cfg, enc, tx, n_max=n_max)
    raw = jitted.__wrapped__

    def wrapper(state, batch_q, batch_k):
        return raw(state, batch_q, batch_k)

    return jax.jit(wrapper, donate_argnums=(0,))
