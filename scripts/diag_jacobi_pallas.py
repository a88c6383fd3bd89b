"""Chip A/B: fused Pallas Jacobi kernel vs the XLA-op formulation at the
production RR shape ((K*2*B, 32, 32) per dispatch), timed as whole jitted
programs (per-call dispatch floor amortized by a fori chain inside).

Usage: timeout 3000 python scripts/diag_jacobi_pallas.py [batch] [sweeps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.ops.jacobi import jacobi_eigh
    from gcc_tpu.ops.jacobi_pallas import jacobi_eigh_tpu

    _enable_compilation_cache()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((b, 32, 32)).astype(np.float32)
    a = (a + a.transpose(0, 2, 1)) / 2
    a = jnp.asarray(a)

    reps = 8

    def chain(fn):
        @jax.jit
        def run(x):
            def body(_, c):
                w, v = fn(c)
                # feed back so XLA can't elide; keep symmetric-ish
                return c + 1e-6 * jnp.einsum("bij,bj,bkj->bik", v, w, v)
            return jax.lax.fori_loop(0, reps, body, x)
        return run

    for name, fn in (
        ("xla jacobi", lambda x: jacobi_eigh(x, sweeps=sweeps,
                                             descending=True)),
        ("pallas jacobi", lambda x: jacobi_eigh_tpu(x, sweeps=sweeps,
                                                    descending=True)),
    ):
        f = chain(fn)
        y = f(a)
        np.asarray(y)  # sync
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            y = f(a)
            np.asarray(y)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s}: {best / reps * 1e3:7.3f} ms/call "
              f"(B={b}, sweeps={sweeps})", flush=True)

    # compiled correctness cross-check
    w1, v1 = jax.jit(lambda x: jacobi_eigh(x, sweeps=5, descending=True))(a)
    w2, v2 = jax.jit(lambda x: jacobi_eigh_tpu(x, sweeps=5,
                                               descending=True))(a)
    dw = float(jnp.max(jnp.abs(w1 - w2)))
    # vectors may differ by sign; compare per-column |dot|
    dots = jnp.abs(jnp.sum(v1 * v2, axis=1))
    print(f"max |dw| {dw:.2e}; min col |dot| {float(dots.min()):.5f}")


if __name__ == "__main__":
    main()
