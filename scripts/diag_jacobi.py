"""Diagnose the Rayleigh-Ritz eigensolver cost on the real chip.

Times, all device-resident inside one jitted fori_loop (per-call
timings through the relay have a ~4.7 ms dispatch floor, so sub-5ms
kernels cannot be timed call-by-call):

  1. XLA's `jnp.linalg.eigh` on the PE finish's (64, 32, 32) batch,
  2. the XLA-ops parallel-order Jacobi (ops/jacobi.py) at 5/4 sweeps,
  3. (optional, --pallas) the experimental fused kernel
     (ops/jacobi_pallas.py) — see its docstring for current blockers.

Findings feeding the production default are recorded in docs/PERF.md
("Session 2 findings").

Usage: timeout 3000 python scripts/diag_jacobi.py [--pallas]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gcc_tpu.cli import _enable_compilation_cache
    from gcc_tpu.ops.jacobi import jacobi_eigh

    _enable_compilation_cache()

    B, K = 64, 32
    rng = np.random.default_rng(0)
    a = rng.standard_normal((B, K, K)).astype(np.float32)
    t_sym = jnp.asarray((a + a.transpose(0, 2, 1)) / 2)
    reps = 50

    def timed(label, inner):
        @jax.jit
        def loop(t):
            def body(i, carry):
                w, u = inner(carry)
                return carry + 1e-12 * (u + jnp.swapaxes(u, 1, 2))
            return jax.lax.fori_loop(0, reps, body, t)

        t0 = time.time()
        out = loop(t_sym)
        _ = np.asarray(out)
        comp = time.time() - t0
        t0 = time.time()
        out = loop(out)
        _ = np.asarray(out)
        print(f"[diag] {label}: {(time.time() - t0) / reps * 1e3:.3f} "
              f"ms/iter (compile {comp:.0f}s)", flush=True)

    timed("xla eigh (64,32,32)", jnp.linalg.eigh)
    timed("jacobi s5 (XLA ops)", lambda t: jacobi_eigh(t, sweeps=5))
    timed("jacobi s4 (XLA ops)", lambda t: jacobi_eigh(t, sweeps=4))
    if "--pallas" in sys.argv:
        from gcc_tpu.ops.jacobi_pallas import jacobi_eigh_tpu

        timed("jacobi kernel s5 (pallas)",
              lambda t: jacobi_eigh_tpu(t, sweeps=5))


if __name__ == "__main__":
    main()
