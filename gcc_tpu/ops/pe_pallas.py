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
               ns_steps: int, k: int, graphs_per_block: int):
    """Basis stored TRANSPOSED as Qᵀ (k, N): with k=32 and N=256+, this
    puts the large dim on the 128-lane axis (Qᵀ@M is (k,N)@(N,N) with
    full lanes) instead of wasting 3/4 of the MXU on a k-lane layout.
    M is symmetric, so Qᵀ←QᵀM computes (MQ)ᵀ with no transposes.

    `graphs_per_block` graphs are processed per grid step — the kernel
    is per-program-overhead-bound at these sizes, so fewer, fatter
    programs win."""
    inv_sqrt_k = 1.0 / (k ** 0.5)
    rounds = max(1, iters // orth_every)
    m = m_ref[...]    # (G, N, N)
    q0 = q0_ref[...]  # (G, k, N)

    # Batched dot_generals over the G graphs in the block: one Mosaic op
    # covers all G matmuls per iteration, shortening the serial
    # small-matmul chain (the kernel's wall-time is issue-latency-bound).
    def bmm(a, b):  # (G, x, N) @ (G, N, y)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # One round = orth_every power-iteration matmuls + a Newton-Schulz
    # re-orthonormalization. fori_loop keeps the Mosaic program small
    # (full unrolling compiles ~6x slower remotely).
    def round_body(_, qt):
        for _ in range(orth_every):
            qt = bmm(qt, m)
        # Column normalize (rows of Qᵀ), then Newton-Schulz:
        # Q ← (3Q − Q QᵀQ)/2 ⇔ Qᵀ ← 1.5 Qᵀ − 0.5 G Qᵀ, G = Qᵀ·Q.
        norm = jnp.sqrt(jnp.sum(qt * qt, axis=2, keepdims=True))
        qt = qt / jnp.maximum(norm, 1e-20) * inv_sqrt_k
        for _ in range(ns_steps):
            gram = jax.lax.dot_general(
                qt, qt, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            qt = 1.5 * qt - 0.5 * jax.lax.dot_general(
                gram, qt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        return qt

    out_ref[...] = jax.lax.fori_loop(0, rounds, round_body, q0)


@functools.partial(jax.jit, static_argnames=("iters", "orth_every",
                                             "ns_steps"))
def pe_subspace_iterate(m: jax.Array, q0: jax.Array, iters: int = 24,
                        orth_every: int = 4, ns_steps: int = 3) -> jax.Array:
    """Run the fused subspace iteration: m (B, N, N), q0 (B, N, k) → (B, N, k).

    No VJP is defined — positional embeddings are input features
    (stop-gradient), never differentiated."""
    b, n, k = q0.shape
    # Fatter programs amortize per-grid-step overhead; cap VMEM at
    # ~4MB of M blocks per program.
    gpb = max(1, min(b, (4 << 20) // (n * n * 4)))
    while b % gpb:
        gpb -= 1
    kernel = functools.partial(_pe_kernel, iters=iters,
                               orth_every=orth_every, ns_steps=ns_steps,
                               k=k, graphs_per_block=gpb)
    flops = 2 * n * n * k * iters + (iters // orth_every) * ns_steps * 4 * n * k * k
    q0t = jnp.swapaxes(q0, 1, 2)  # kernel works on Qᵀ (k, N)
    out_t = pl.pallas_call(
        kernel,
        grid=(b // gpb,),
        in_specs=[
            pl.BlockSpec((gpb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, k, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gpb, k, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops, bytes_accessed=b * (n * n + 2 * n * k) * 4,
            transcendentals=0,
        ),
    )(m, q0t)
    return jnp.swapaxes(out_t, 1, 2)
