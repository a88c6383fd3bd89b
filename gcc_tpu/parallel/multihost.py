"""Multi-host initialization and per-host pipeline wiring.

On a multi-host TPU slice each host runs this same program: initialize
the jax distributed runtime, build the global ("data", "part") mesh over
all devices, and feed the globally-sharded batch from each host's local
sampler shard (the per-host analog of the reference's per-worker graph
partition, graph_dataset.py:63-76). Single-host runs are a no-op.

This module is exercised single-host in CI (no multi-host hardware in
the dev environment); the mesh/sharding path it configures is identical
to the 8-virtual-device tests in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import numpy as np

from gcc_tpu.parallel.mesh import make_mesh


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology.
    Safe to call on single-host (no-op without coordinator info)."""
    if coordinator is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch_to_global(mesh, batch, axis: str = "data",
                               spec=None):
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host contributes its local batch shard; the returned global
    arrays are sharded over `axis` without any cross-host copy
    (jax.make_array_from_process_local_data).

    spec overrides the default P(axis) partitioning — e.g. the
    DP-stacked compact wire carries its device axis at dim 1
    ((K, D, e_dev) edges / (K, D, 3, b) meta), so run_pretrain passes
    P(None, axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis) if spec is None else spec)

    def convert(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(convert, batch)


def corpus_shard_for_host(graph_sizes, num_hosts: int | None = None,
                          host_id: int | None = None) -> list[int]:
    """Greedy size-balanced corpus assignment for this host (the
    multi-host extension of the reference's worker partition)."""
    from gcc_tpu.graph.corpus import partition_graphs

    num_hosts = num_hosts if num_hosts is not None else jax.process_count()
    host_id = host_id if host_id is not None else jax.process_index()
    jobs = partition_graphs(graph_sizes, num_hosts)
    return jobs[host_id]
