"""Fused Pallas kernel for the positional-embedding subspace iteration.

The XLA implementation of the block orthogonal iteration issues ~35
small kernels per call (24 power-iteration matmuls + Newton-Schulz
orthogonalizations); at (B, 256, 256) each op is ~256 MFLOP — pure
launch overhead on TPU (~0.2ms/op, ~9ms total). This kernel runs the
whole iteration for one graph per grid step entirely in VMEM: M
(N×N ≤ 1MB) is loaded once, the 24 MXU matmuls and NS orthogonalizations
chain with no HBM round-trips, and the only outputs are the converged
basis Q. The exact CholeskyQR + Rayleigh-Ritz finish stays in XLA (4
small ops on (B, k, k)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pe_kernel(m_ref, q0_ref, out_ref, *, iters: int, orth_every: int,
               ns_steps: int, k: int):
    m = m_ref[0]
    inv_sqrt_k = 1.0 / (k ** 0.5)
    rounds = max(1, iters // orth_every)

    # One round = orth_every power-iteration matmuls + a Newton-Schulz
    # re-orthonormalization. A fori_loop keeps the Mosaic program small
    # (the fully unrolled version compiles ~6x slower remotely).
    def round_body(_, q):
        for _ in range(orth_every):
            q = jnp.dot(m, q, preferred_element_type=jnp.float32)
        # Column normalize, then Newton-Schulz: Q ← (3Q − Q QᵀQ)/2.
        norm = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True))
        q = q / jnp.maximum(norm, 1e-20) * inv_sqrt_k
        for _ in range(ns_steps):
            # Contract over the node dim without an explicit transpose
            # (in-kernel transposes are a Mosaic hazard).
            gram = jax.lax.dot_general(
                q, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            q = 1.5 * q - 0.5 * jnp.dot(
                q, gram, preferred_element_type=jnp.float32
            )
        return q

    out_ref[0] = jax.lax.fori_loop(0, rounds, round_body, q0_ref[0])


@functools.partial(jax.jit, static_argnames=("iters", "orth_every",
                                             "ns_steps"))
def pe_subspace_iterate(m: jax.Array, q0: jax.Array, iters: int = 24,
                        orth_every: int = 4, ns_steps: int = 3) -> jax.Array:
    """Run the fused subspace iteration: m (B, N, N), q0 (B, N, k) → (B, N, k).

    No VJP is defined — positional embeddings are input features
    (stop-gradient), never differentiated."""
    b, n, k = q0.shape
    kernel = functools.partial(_pe_kernel, iters=iters,
                               orth_every=orth_every, ns_steps=ns_steps, k=k)
    flops = 2 * n * n * k * iters + (iters // orth_every) * ns_steps * 4 * n * k * k
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops, bytes_accessed=b * (n * n + 2 * n * k) * 4,
            transcendentals=0,
        ),
    )(m, q0)
