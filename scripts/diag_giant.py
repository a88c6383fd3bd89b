#!/usr/bin/env python
"""On-chip end-to-end timing of the giant-graph GIN encode path.

Times `giant_gin_encode` (5-layer GIN, per-layer readout heads) on one
chip over a part=1 mesh at the partitioned path's operating points, for
the dense row-block schedule (DensePartitionedGraph — the
measured-preferred form, docs/PERF.md "Partitioned aggregation") and
the segment-sum schedule (PartitionedGraph). Collectives degenerate on
one device, so this isolates the shard-LOCAL per-device cost the
multi-chip schedule pays per encode; the table complements the
per-aggregation microbench in diag_partitioned.py with the full
encoder chain (4 aggregations + MLPs + BN + readouts).

Timed inside one jitted fori_loop (the per-call relay floor is ~4.7 ms;
the encode output perturbs the next iteration's features so XLA cannot
elide the chain). Output feeds docs/PERF.md "Giant-graph encode".

Usage: timeout 3000 python scripts/diag_giant.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 16
F_IN = 49  # pos 32 + deg-emb 16 + seed 1 (canonical featurizer width)


def main():
    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    from gcc_tpu.config import EncoderConfig
    from gcc_tpu.models import GraphEncoder
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.parallel import (make_mesh, partition_dense,
                                  partition_edges, shard_dense_partition)
    from gcc_tpu.parallel.giant import giant_gin_encode
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Canonical encoder params (init once on a toy batch).
    cfg = EncoderConfig()
    enc = GraphEncoder(cfg)
    rng = np.random.default_rng(0)
    s = rng.integers(0, 24, 96).astype(np.int32)
    d = rng.integers(0, 24, 96).astype(np.int32)
    toy = batch_subgraphs([Subgraph(src=s, dst=d, num_nodes=24)],
                          n_max=32, e_max=256)
    feats = jax.jit(
        lambda b: featurize_batch(b, cfg.positional_embedding_size))(toy)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    params = jax.device_put(variables["params"])
    stats = jax.device_put(variables["batch_stats"])

    mesh = make_mesh(data=1, part=1, devices=jax.devices()[:1])

    for n, deg in ((4096, 8), (8192, 8), (8192, 32)):
        e = n * deg
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        h0 = rng.normal(size=(n, F_IN)).astype(np.float32)
        mask = np.ones(n, np.float32)

        schedules = {
            "dense": shard_dense_partition(
                partition_dense(src, dst, num_nodes=n, num_devices=1), mesh),
            "segment": partition_edges(src, dst, num_nodes=n, num_devices=1),
        }
        for name, pg in schedules.items():
            # The partition arrays MUST be jit arguments: closed over,
            # they bake into the serialized program and blow the remote
            # compile relay's request-size cap (HTTP 413 at 64 MB —
            # the closed-over-constant hazard, CLAUDE.md). num_nodes
            # stays a static python int via pg_arrays/rebuild.
            arr_fields = [f for f in pg._fields if f != "num_nodes"]
            pg_arrays = {f: jax.device_put(jnp.asarray(getattr(pg, f)))
                         for f in arr_fields}
            if name == "dense":
                pg_arrays["adj"] = pg.adj  # keep the sharded placement

            @jax.jit
            def run(p, st, h, m, pa):
                pg_t = type(pg)(num_nodes=pg.num_nodes, **pa)

                def body(_, carry):
                    emb = giant_gin_encode(p, st, pg_t, carry, m, mesh,
                                           num_layers=cfg.num_layers)
                    # Perturb features with the embedding so the chain
                    # has a data dependence (cannot be elided), without
                    # drifting the magnitude.
                    return carry * (1.0 + 1e-6 * emb[0])

                return jax.lax.fori_loop(0, REPS, body, h)

            args = (params, stats, jax.device_put(jnp.asarray(h0)),
                    jax.device_put(jnp.asarray(mask)), pg_arrays)
            out = run(*args)
            np.asarray(out)  # compile + settle
            trials = []
            for _ in range(5):
                t0 = time.time()
                out = run(*args)
                np.asarray(out)
                trials.append((time.time() - t0) / REPS)
            trials.sort()
            med = trials[len(trials) // 2]
            print(f"n={n:5d} deg={deg:2d} E={e:6d} {name:7s}: "
                  f"{med * 1e3:7.2f} ms/encode "
                  f"({4 * e / med / 1e6:7.1f}M edge-msgs/s over 4 layers)",
                  flush=True)


if __name__ == "__main__":
    main()
