"""Probe: cost of a STATIC row/col permutation of a VMEM tile in Mosaic.

Three candidate lowerings for the Jacobi round re-pairing inside a fused
kernel, timed in one jitted fori loop each (per-call timing has a
~4.7 ms dispatch floor):
  A. x[perm_const] static-index gather on a VMEM value
  B. one-hot matmul (the current experimental kernel's approach)
  C. two static half-slices + interleave writes (tournament structure)

Usage: timeout 3000 python scripts/diag_permute.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.ops.jacobi import half_layout_perms

    _enable_compilation_cache()

    b, n = 256, 32
    rounds = 124  # 4 sweeps' worth of permutes
    perms = half_layout_perms(n)
    perm0 = jnp.asarray(perms[0])
    onehot = np.zeros((n, n), np.float32)
    onehot[np.arange(n), np.asarray(perms[0])] = 1.0
    onehot_t = jnp.asarray(onehot.T.copy())

    def kern_take(x_ref, o_ref, perm):
        def body(_, __):
            o_ref[...] = x_ref[...][:, perm, :]
            x_ref[...] = o_ref[...]
            return 0
        jax.lax.fori_loop(0, rounds, body, 0)

    def kern_dot(x_ref, o_ref, pt):
        hi = jax.lax.Precision.HIGHEST
        def body(_, __):
            x = x_ref[...]
            o_ref[...] = jnp.dot(
                x.reshape(b * n, n), pt,
                preferred_element_type=jnp.float32, precision=hi,
            ).reshape(b, n, n)
            x_ref[...] = o_ref[...]
            return 0
        jax.lax.fori_loop(0, rounds, body, 0)

    def kern_base(x_ref, o_ref):
        # loop floor baseline: one elementwise op per round
        def body(_, __):
            o_ref[...] = x_ref[...] + 1.0
            x_ref[...] = o_ref[...]
            return 0
        jax.lax.fori_loop(0, rounds, body, 0)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, n, n)).astype(np.float32))

    def run(kernel, *consts):
        f = pl.pallas_call(
            functools.partial(kernel, *([] if not consts else [])) if False
            else (lambda xr, orr: kernel(xr, orr, *consts)),
            out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        g = jax.jit(f)
        y = g(x); y.block_until_ready()
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            y = g(x)
            y.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best / rounds * 1e6  # us per permute

    for name, kern, consts in (
        ("baseline(add)", kern_base, ()),
        ("one-hot dot", kern_dot, (onehot_t,)),
        ("static take", kern_take, (perm0,)),
    ):
        try:
            us = run(kern, *consts)
            print(f"{name:16s}: {us:7.2f} us/round  (B={b}, n={n})", flush=True)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
