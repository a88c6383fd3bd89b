"""Child process for the 2-process jax.distributed CPU cluster test
(tests/test_parallel.py::test_two_process_distributed_dp_step).

Each of the two processes owns 4 virtual CPU devices, initializes the
distributed runtime (parallel/multihost.py), builds the 8-device global
mesh, contributes its host-local half of a deterministic batch via
host_local_batch_to_global, and takes one DP train step. The parent
compares the printed loss against a single-process reference — this is
SURVEY.md §4's "fake multi-host" requirement exercised with real
multi-process collectives over localhost gRPC.

Invoked as: python distributed_child.py <process_id> <coordinator>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def toy_wire_pair(bsz=8, n=12, e_max=64, seed=0):
    """Deterministic WireBatch pair — identical in every process and in
    the parent's reference computation."""
    from gcc_tpu.graph.batch import WireBatch

    rng = np.random.default_rng(seed)

    def one(s):
        r = np.random.default_rng(s)
        return WireBatch(
            src=r.integers(0, n, (bsz, e_max)).astype(np.int16),
            dst=r.integers(0, n, (bsz, e_max)).astype(np.int16),
            n_nodes=np.full(bsz, n, np.int32),
            n_edges=r.integers(e_max // 2, e_max, bsz).astype(np.int32),
            seed_pos=np.zeros(bsz, np.int32),
        )

    return one(int(rng.integers(1 << 30))), one(int(rng.integers(1 << 30)))


def build_state_and_step(mesh=None):
    from gcc_tpu.config import ContrastConfig, EncoderConfig, OptimConfig, \
        SamplerConfig, TrainConfig
    from gcc_tpu.training import create_pretrain_state

    cfg = TrainConfig(
        batch_size=8,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=64),
        optim=OptimConfig(learning_rate=0.01),
    )
    bq, bk = toy_wire_pair()
    state, enc, tx = create_pretrain_state(
        jax.random.PRNGKey(0), cfg, bq, total_steps=10, n_max=16)
    return cfg, state, enc, tx, bq, bk


def main():
    process_id = int(sys.argv[1])
    coordinator = sys.argv[2]

    from gcc_tpu.parallel.multihost import (
        host_local_batch_to_global, initialize_multihost,
    )

    initialize_multihost(coordinator=coordinator, num_processes=2,
                         process_id=process_id)
    assert jax.process_count() == 2
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == 8 and n_local == 4, (n_global, n_local)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcc_tpu.parallel.data_parallel import make_dp_train_step
    from gcc_tpu.parallel.mesh import make_mesh

    cfg, state, enc, tx, bq, bk = build_state_and_step()
    mesh = make_mesh(data=8)

    # Replicated global state: every process holds identical values
    # (same PRNGKey init), so the local data IS the replicated shard.
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state,
    )

    # Host-local half of the batch -> globally sharded batch (each of
    # this host's 4 devices gets one of its 4 rows).
    half = slice(process_id * 4, (process_id + 1) * 4)
    local_q = jax.tree_util.tree_map(lambda x: x[half], bq)
    local_k = jax.tree_util.tree_map(lambda x: x[half], bk)
    gq = host_local_batch_to_global(mesh, local_q)
    gk = host_local_batch_to_global(mesh, local_k)

    step_fn = make_dp_train_step(cfg, enc, tx, mesh, n_max=16)
    new_state, metrics = step_fn(state, gq, gk)
    loss = float(np.asarray(metrics["loss"]))
    prob = float(np.asarray(metrics["prob"]))
    print(json.dumps({"process": process_id, "loss": loss, "prob": prob,
                      "devices": n_global, "local": n_local}))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
