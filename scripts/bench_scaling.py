#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (BASELINE.json north star:
≥80% efficiency 1→N).

Measures steady-state MoCo step time for the same per-device batch at
mesh sizes 1..N ("weak scaling": global batch grows with N; perfect
scaling = flat step time). On a real pod slice run one process per host
(gcc_tpu.parallel.multihost); on the dev box it validates the sharded
program over the virtual CPU mesh (mechanics, not speed):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n-max", type=int, default=64)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < max(args.devices):
        jax.config.update("jax_platforms", "cpu")
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass

    import numpy as np

    from __graft_entry__ import _toy_batch
    from gcc_tpu.config import ContrastConfig, SamplerConfig, TrainConfig
    from gcc_tpu.parallel import make_mesh
    from gcc_tpu.parallel.data_parallel import (
        make_dp_train_step, shard_batch, shard_state,
    )
    from gcc_tpu.training import create_pretrain_state

    results = {}
    base_time = None
    for n_dev in args.devices:
        bsz = args.per_device_batch * n_dev
        mesh = make_mesh(data=n_dev, part=1, devices=jax.devices()[:n_dev])
        cfg = TrainConfig(
            batch_size=bsz,
            contrast=ContrastConfig(moco=True, nce_k=128 * n_dev),
            sampler=SamplerConfig(rw_hops=8),
        )
        bq = _toy_batch(batch_size=bsz, n=args.n_max // 2, n_max=args.n_max,
                        e_max=args.n_max * 8, seed=1)
        bk = _toy_batch(batch_size=bsz, n=args.n_max // 2, n_max=args.n_max,
                        e_max=args.n_max * 8, seed=2)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, bq, total_steps=1000,
            n_max=args.n_max,
        )
        state = shard_state(mesh, state)
        step = make_dp_train_step(cfg, enc, tx, mesh, n_max=args.n_max)
        dq, dk = shard_batch(mesh, bq), shard_batch(mesh, bk)
        state, m = step(state, dq, dk)
        _ = float(np.asarray(m["loss"]))
        t0 = time.time()
        for _i in range(args.steps):
            state, m = step(state, dq, dk)
        _ = float(np.asarray(m["loss"]))
        dt = (time.time() - t0) / args.steps
        if base_time is None:
            base_time = dt
        results[n_dev] = {
            "step_ms": round(dt * 1000, 2),
            "efficiency": round(base_time / dt, 3),
        }
        print(f"devices={n_dev} batch={bsz}: {dt * 1000:.2f} ms/step, "
              f"weak-scaling efficiency {base_time / dt:.2f}", flush=True)
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
