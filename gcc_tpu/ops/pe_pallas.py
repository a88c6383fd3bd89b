"""Fused Pallas kernel for the positional-embedding subspace iteration.

The XLA implementation of the block orthogonal iteration issues ~35
small kernels per call (24 power-iteration matmuls + Newton-Schulz
orthogonalizations); at (B, 256, 256) each op is ~256 MFLOP — pure
launch overhead on TPU (~0.2ms/op, ~9ms total). This kernel runs the
whole iteration for one graph per grid step entirely in VMEM: M
(N×N ≤ 1MB) is loaded once, the MXU matmuls and NS orthogonalizations
chain with no HBM round-trips, and the only outputs are the converged
basis Q. The exact CholeskyQR + Rayleigh-Ritz finish stays in XLA (4
small ops on (B, k, k)).

Precision: the iteration is FLOP-bound at f32 MXU rate (measured
~44us per (G=16, 32, 256)x(256, 256) batched matmul — exactly the f32
roofline). Power/NS matmuls therefore run with bfloat16 INPUTS and f32
ACCUMULATION (native MXU rate, ~4x f32), followed by `polish` full-f32
power steps that contract the ~1e-2 bf16 rounding noise out of the
subspace, and a full-f32 Newton-Schulz finish (8 steps) so the caller's
Rayleigh-Ritz sees a near-orthonormal basis (see _pe_kernel; guarded
bases are additionally whitened exactly by the caller's generalized
RR). The reference's ARPACK path has looser guarantees than this
(random v0, sign-indeterminate, zero-PE on non-convergence —
data_util.py:242-263).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pe_kernel(m_ref, q0_ref, out_ref, *, iters: int, orth_every: int,
               ns_steps: int, k: int, graphs_per_block: int,
               power_dtype=jnp.bfloat16, polish: int = 2,
               final_ns: int = 8):
    """Basis stored TRANSPOSED as Qᵀ (k, N): with k=32 and N=256+, this
    puts the large dim on the 128-lane axis (Qᵀ@M is (k,N)@(N,N) with
    full lanes) instead of wasting 3/4 of the MXU on a k-lane layout.
    M is symmetric, so Qᵀ←QᵀM computes (MQ)ᵀ with no transposes.

    `graphs_per_block` graphs are processed per grid step — the kernel
    is per-program-overhead-bound at these sizes, so fewer, fatter
    programs win."""
    rounds = max(1, iters // orth_every)
    m = m_ref[...]    # (G, N, N) f32 (or bf16 under GCC_TPU_ADJ_DTYPE —
    #                    the HBM read halves; compute below is unchanged)
    m_lo = m.astype(power_dtype)
    m = m.astype(jnp.float32)  # f32 polish math (in-VMEM convert)
    q0 = q0_ref[...]  # (G, k, N) f32

    # Batched dot_generals over the G graphs in the block: one Mosaic op
    # covers all G matmuls per iteration, shortening the serial
    # small-matmul chain. Inputs cast to `power_dtype`, f32 accumulate.
    def bmm(a, b):  # (G, x, N) @ (G, N, y)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bmm_lo(a, b_lo):
        return bmm(a.astype(power_dtype), b_lo)

    def colunit(qt):
        norm = jnp.sqrt(jnp.sum(qt * qt, axis=2, keepdims=True))
        return qt / jnp.maximum(norm, 1e-20)

    def bgram(qt, lo: bool):
        a = qt.astype(power_dtype) if lo else qt
        return jax.lax.dot_general(
            a, a, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def ns_orth(qt, steps: int, lo: bool):
        # Newton-Schulz orthonormalization, Q ← (3Q − Q QᵀQ)/2, i.e.
        # Qᵀ ← 1.5 Qᵀ − 0.5 G Qᵀ with G = Qᵀ·Q (rows of Qᵀ are columns
        # of Q). Convergence needs σ_max(Q) ≤ √3 AND is only quadratic
        # near σ = 1: scale unit columns by the Gershgorin bound
        # σ_max² ≤ ‖QᵀQ‖_∞ so σ_max lands just below 1. This actually
        # orthogonalizes correlated bases (a fixed 1/√k scale keeps NS in
        # its linear regime where column correlations barely contract),
        # and rank-deficient graphs (n_b < k small components, dependent
        # columns with σ_max up to √(k/n_b)) stay convergent — zero
        # singular values remain zero instead of blowing up.
        qt = colunit(qt)
        gram = bgram(qt, lo)
        bound = jnp.max(jnp.sum(jnp.abs(gram), axis=2), axis=1)  # (G,)
        scale = jax.lax.rsqrt(jnp.maximum(bound, 1e-20))
        qt = qt * scale[:, None, None]
        gram = gram * (scale * scale)[:, None, None]
        for i in range(steps):
            if i:
                gram = bgram(qt, lo)
            corr = (bmm_lo(gram, qt.astype(power_dtype)) if lo
                    else bmm(gram, qt))
            qt = 1.5 * qt - 0.5 * corr
        return qt

    # One round = orth_every power-iteration matmuls + a Newton-Schulz
    # re-orthonormalization. fori_loop keeps the Mosaic program small
    # (full unrolling compiles ~6x slower remotely).
    def round_body(_, qt):
        for _ in range(orth_every):
            qt = bmm_lo(qt, m_lo)
        return ns_orth(qt, ns_steps, lo=True)

    qt = jax.lax.fori_loop(0, rounds, round_body, q0)
    # Full-f32 polish steps: power iteration contracts the bf16 rounding
    # noise (outside the dominant subspace) injected by the rounds above.
    for _ in range(polish):
        qt = colunit(bmm(qt, m))

    # Full-f32 Newton-Schulz finish with `final_ns` steps (default 8):
    # Rayleigh-Ritz silently assumes QᵀQ = I, and the round-1 finish
    # (ns_steps=4) left ‖QᵀQ−I‖ ≈ 0.1 — the polish power steps
    # re-correlate columns to σ_min ~ 0.5 and 4 NS steps don't converge
    # from there — so the RR rotation MIXED eigenvectors (measured
    # median |cos| vs the ARPACK oracle 0.70 on 150-500-node subgraphs,
    # tests/test_pe_arpack_oracle.py). 8 steps reach ~1e-4 from σ ≥ 0.3.
    # NS-on-Q is UNCONDITIONALLY stable (σ' = 1.5σ − 0.5σ³ maps [0, √3]
    # into [0, 1]; no inverse anywhere) — a Löwdin/Denman-Beavers
    # S^{-1/2} finish was tried and converges faster per-flop, but being
    # an inverse iteration it blew up to 1e20 in f32 on ill-conditioned
    # Grams (rank-deficient graphs, deep guard columns). Bases that NS
    # leaves unconverged (σ_min « 0.3, only with guard columns) are
    # re-whitened EXACTLY by the caller's generalized Rayleigh-Ritz
    # (features/positional.py _subspace_topk).
    if final_ns:
        qt = ns_orth(qt, final_ns, lo=False)
    out_ref[...] = qt


@functools.partial(jax.jit, static_argnames=("iters", "orth_every",
                                             "ns_steps", "power_dtype",
                                             "polish", "final_ns",
                                             "interpret"))
def pe_subspace_iterate(m: jax.Array, q0: jax.Array, iters: int = 24,
                        orth_every: int = 4, ns_steps: int = 4,
                        power_dtype=jnp.bfloat16,
                        polish: int = 2, final_ns: int = 8,
                        interpret: bool = False) -> jax.Array:
    """Run the fused subspace iteration: m (B, N, N), q0 (B, N, k) → (B, N, k).

    Returns a near-orthonormal basis (`final_ns` f32 Newton-Schulz
    finish steps; exact whitening of tough cases happens in the caller's
    generalized Rayleigh-Ritz).

    No VJP is defined — positional embeddings are input features
    (stop-gradient), never differentiated."""
    b, n, k = q0.shape
    # Fatter programs amortize per-grid-step overhead; cap VMEM at
    # ~4MB of M blocks per program (f32 + bf16 copies).
    gpb = max(1, min(b, (4 << 20) // (n * n * 6)))
    while b % gpb:
        gpb -= 1
    kernel = functools.partial(_pe_kernel, iters=iters,
                               orth_every=orth_every, ns_steps=ns_steps,
                               k=k, graphs_per_block=gpb,
                               power_dtype=power_dtype, polish=polish,
                               final_ns=final_ns)
    flops = (2 * n * n * k * (iters + polish)
             + ((iters // orth_every) * ns_steps + final_ns) * 4 * n * k * k)
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
        interpret=interpret,
    )(m, q0t)
    return jnp.swapaxes(out_t, 1, 2)
