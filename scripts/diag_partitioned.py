#!/usr/bin/env python
"""On-chip measurement of the partitioned/giant-graph aggregation path
(VERDICT r1 item 4): single-chip timings of

  1. the local segment-sum work one partition shard performs per
     aggregation (edges/s at the giant-graph operating points),
  2. the dense (N, N) MXU path vs the gather/segment-sum path on the
     SAME graph — the dense<->sparse crossover that sets the bucket
     policy (when to leave the padded-dense path), and
  3. the ring schedule's per-hop overhead: D bucket-sliced segment-sums
     vs one fused segment-sum over the same edges (the single-chip
     component of the latency-hiding schedule; the ICI permute itself
     needs a real multi-chip slice).

All timings run INSIDE one jitted fori_loop (per-call relay floor is
~4.7 ms; sub-ms kernels must be chained device-resident —
docs/PERF.md). Output feeds docs/PERF.md "Partitioned aggregation".

Usage: timeout 3000 python scripts/diag_partitioned.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

F = 64      # hidden size (canonical GIN)
REPS = 64   # aggregations per timed dispatch


def ring_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    return src, dst


def timed_loop(fn, h0, *operands, reps=REPS, trials=5):
    """Median seconds per fn application, chained inside one dispatch."""

    @jax.jit
    def run(h, ops):
        def body(_, carry):
            out = fn(carry, *ops)
            # Chain output -> input (XLA can't elide) and renormalize so
            # 64 aggregations don't overflow to inf (cost: one (N, F)
            # reduction per rep, « the E·F gather work being timed).
            return out * jax.lax.rsqrt(jnp.mean(out * out) + 1.0)

        return jax.lax.fori_loop(0, reps, body, h)

    ops = tuple(jax.device_put(o) for o in operands)
    h = jax.device_put(h0)
    out = run(h, ops)
    np.asarray(out)  # compile + settle
    best = []
    for _ in range(trials):
        t0 = time.time()
        out = run(h, ops)
        np.asarray(out)
        best.append((time.time() - t0) / reps)
    best.sort()
    return best[len(best) // 2]


def main():
    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    rows = []

    # --- 1+2: dense vs segment aggregation crossover --------------------
    for n in (256, 512, 1024, 2048, 4096, 8192):
        for avg_deg in (8, 32):
            src, dst = ring_graph(n, avg_deg)
            e = len(src)
            h0 = np.random.default_rng(1).standard_normal((n, F)).astype(
                np.float32)

            # segment path: gather + segment_sum (the partitioned shard's
            # local work with weights folded in)
            w = np.ones(e, np.float32)

            def seg(h, s, d, w):
                return jax.ops.segment_sum(h[s] * w[:, None], d,
                                           num_segments=n)

            t_seg = timed_loop(seg, h0, src, dst, w)

            # dense path: one (N, N) @ (N, F) MXU matmul (adjacency built
            # once outside the loop — the featurize cost is shared across
            # the GIN layers in production)
            adj = np.zeros((n, n), np.float32)
            np.add.at(adj, (dst, src), 1.0)

            def dense(h, a):
                return jax.lax.dot_general(
                    a, h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            t_dense = timed_loop(dense, h0, adj) if n <= 8192 else None
            rows.append((n, avg_deg, e, t_seg, t_dense))
            print(f"n={n:5d} deg={avg_deg:2d} E={e:6d}: "
                  f"segment {t_seg * 1e6:8.1f} us ({e / t_seg / 1e6:8.1f}M edges/s)  "
                  f"dense {t_dense * 1e6:8.1f} us ({e / t_dense / 1e6:8.1f}M edges/s)",
                  flush=True)

    # --- 3: ring schedule overhead (single-chip component) --------------
    print("\nring-schedule local-work overhead (D hop-sliced segment-sums "
          "vs 1 fused):", flush=True)
    n, avg_deg = 4096, 8
    src, dst = ring_graph(n, avg_deg)
    e = len(src)
    h0 = np.random.default_rng(1).standard_normal((n, F)).astype(np.float32)
    w = np.ones(e, np.float32)

    def seg(h, s, d, w):
        return jax.ops.segment_sum(h[s] * w[:, None], d, num_segments=n)

    t1 = timed_loop(seg, h0, src, dst, w)
    for d_cnt in (4, 8):
        # split edges into d_cnt buckets (the ring consumes one per hop)
        eb = -(-e // d_cnt)
        sb = np.zeros((d_cnt, eb), np.int32)
        db = np.zeros((d_cnt, eb), np.int32)
        wb = np.zeros((d_cnt, eb), np.float32)
        for i in range(d_cnt):
            sl = slice(i, e, d_cnt)
            cnt = len(range(i, e, d_cnt))
            sb[i, :cnt] = src[sl]
            db[i, :cnt] = dst[sl]
            wb[i, :cnt] = 1.0

        def ring_local(h, sb, db, wb):
            def hop(t, acc):
                s = jax.lax.dynamic_index_in_dim(sb, t, keepdims=False)
                d = jax.lax.dynamic_index_in_dim(db, t, keepdims=False)
                ww = jax.lax.dynamic_index_in_dim(wb, t, keepdims=False)
                return acc + jax.ops.segment_sum(h[s] * ww[:, None], d,
                                                 num_segments=n)

            return jax.lax.fori_loop(0, d_cnt, hop, jnp.zeros_like(h))

        t_d = timed_loop(ring_local, h0, sb, db, wb)
        print(f"D={d_cnt}: {t_d * 1e6:8.1f} us vs fused {t1 * 1e6:8.1f} us "
              f"-> overhead {100 * (t_d / t1 - 1):.0f}% "
              f"({(t_d - t1) / d_cnt * 1e6:.1f} us/hop available for "
              f"hiding one ppermute)", flush=True)


if __name__ == "__main__":
    main()
