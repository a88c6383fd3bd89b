"""Fused Pallas kernel: batched Jacobi eigendecomposition (small n).

STATUS: EXPERIMENTAL — correct (oracle-tested in interpret mode and in
compiled probes) but NOT yet wired into the production PE path; the
production Rayleigh-Ritz finish uses the XLA formulation
(ops/jacobi.py, ~3.5 ms at the canonical batch vs ~4.4 ms for XLA's
eigh custom call). The measured blockers and the on-chip ablation data
that shape this kernel are recorded in docs/PERF.md:
  * a Mosaic fori_loop costs ~14 us/iteration regardless of body
    (155 rounds -> 2.1 ms floor), so rounds must be unrolled in chunks;
  * unrolled-round bodies inflate Mosaic's scoped-vmem stack analysis
    (>40 MB for the full kernel at B = 64) — the fix is chunked unroll
    with careful value lifetimes, left for the next round;
  * MXU matmuls inside Pallas default to single-pass bf16 — 155 rounds
    of rotations accumulate O(1) error unless precision=HIGHEST.

Replaces XLA's `jnp.linalg.eigh` in the Rayleigh-Ritz finish of the PE
subspace iteration (features/positional.py). The QR-iteration eigh
custom call costs ~4.4 ms for a (64, 32, 32) batch on v5e — two thirds
of the whole MoCo train step; the same algorithm expressed as XLA ops
(ops/jacobi.py) is ~3.5 ms of pure op-dispatch overhead (155 serial
rounds of ~20 tiny ops).

Algorithm = ops/jacobi.py (parallel-order cyclic Jacobi, round-robin
tournament pivots, quadratic convergence in ~5 sweeps for n = 32), with
TPU-specific structure learned from on-chip ablations (docs/PERF.md):

  * pairs at (j, j + n/2) — contiguous half-split slices, no strided
    even/odd access;
  * ALL state lives in VMEM scratch refs mutated in place: a fori_loop
    carrying (B, n, n) values costs ~14 us/round in carry copies, and
    jnp.concatenate of row/col halves blows Mosaic's scoped-vmem stack
    analysis — slice-assignment into scratch does neither;
  * one fori_loop over all sweeps*(n-1) rounds: the round-robin
    re-pairing permutation is a dynamic VMEM ref load perms[r % (n-1)],
    with the sweep wrap-around folded into entry 0 (the first round is
    applied before the loop);
  * permutations ride the MXU as one-hot matmuls with
    precision=HIGHEST — the MXU's default single-pass bf16 rounding
    accumulates to O(1) error over 155 rounds;
  * final ascending/descending eigenvalue sort is gather-free:
    comparison ranks (index tie-break) build a batched one-hot
    permutation applied with one batched matmul.

No VJP — the PE features are stop-gradient inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcc_tpu.ops.jacobi import (
    _pivot_masks_np,
    _rotation_cs,
    half_layout_perms,
)


@functools.lru_cache(maxsize=None)
def _perm_mats(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-hot permutation matrices for the kernel, TRANSPOSED so they
    apply to columns (X @ Pᵀ permutes cols like gather x[..., perm]).

    Returns (first, cycle, last):
      first (n, n)    — natural order → round-0 layout (pre-loop);
      cycle (n-1,n,n) — entry i applies round (i+1 mod n-1)'s
                        incremental re-pairing; entry n-2 wraps a sweep
                        (last layout → natural → round-0 layout);
      last (n, n)     — round-(n-2) layout → natural order (post-loop).
    """
    perms = half_layout_perms(n)  # n-1 incremental + final inverse

    def onehot_t(p):
        m = np.zeros((n, n), np.float32)
        m[np.arange(n), p] = 1.0
        return m.T.copy()

    first = onehot_t(perms[0])
    back = perms[n - 1]
    wrap = back[perms[0]]  # x[back][perms0] == x[back[perms0]]
    cycle = np.stack(
        [onehot_t(perms[r]) for r in range(1, n - 1)] + [onehot_t(wrap)]
    )
    return first, cycle, onehot_t(back)


def _jacobi_kernel(t_ref, maskl_ref, maskr_ref, first_ref, cycle_ref,
                   last_ref, w_ref, v_ref, a_scr, v_scr, *, n: int,
                   sweeps: int, eps: float):
    b = t_ref.shape[0]
    h = n // 2
    mask_l, mask_r = maskl_ref[...], maskr_ref[...]
    hi = jax.lax.Precision.HIGHEST

    def colmm(x, pt):
        # X @ Pᵀ == x[..., :, perm]; flat (B*n, n) @ (n, n) MXU matmul
        return jnp.dot(
            x.reshape(b * n, n), pt, preferred_element_type=jnp.float32,
            precision=hi,
        ).reshape(b, n, n)

    def permute_sym(x, pt):
        # P X Pᵀ for symmetric X: Y = X Pᵀ, then Yᵀ Pᵀ = (P Y)ᵀ = P Y
        # (P X Pᵀ is symmetric).
        return colmm(jnp.swapaxes(colmm(x, pt), 1, 2), pt)

    # init: A in round-0 layout, V = I in round-0 row layout
    first = first_ref[...]
    a_scr[...] = permute_sym(t_ref[...], first)
    v_scr[...] = colmm(
        jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (b, n, n)), first
    )

    def rotate(_r, __):
        # one Jacobi round in the current half-split layout
        a = a_scr[...]
        ae, ao = a[:, :h, :], a[:, h:, :]
        app = jnp.sum(ae * mask_l, axis=-1)
        aqq = jnp.sum(ao * mask_r, axis=-1)
        apq = jnp.sum(ae * mask_r, axis=-1)
        c, s = _rotation_cs(app, aqq, apq, eps)
        # rows: A <- R~ A, R~ = [[c, -s], [s, c]] per pair
        ce, se = c[:, :, None], s[:, :, None]
        a_scr[:, :h, :] = ce * ae - se * ao
        a_scr[:, h:, :] = se * ae + ce * ao
        # cols: A <- A R~ᵀ (lane-half slices)
        a = a_scr[...]
        al, ar = a[:, :, :h], a[:, :, h:]
        cc, sc = c[:, None, :], s[:, None, :]
        a_scr[:, :, :h] = cc * al - sc * ar
        a_scr[:, :, h:] = sc * al + cc * ar
        # V <- V R~ᵀ (columns track A's basis)
        v = v_scr[...]
        vl, vr = v[:, :, :h], v[:, :, h:]
        v_scr[:, :, :h] = cc * vl - sc * vr
        v_scr[:, :, h:] = sc * vl + cc * vr
        return 0

    def round_body(r, carry):
        rotate(r, carry)
        # re-pair for the next round (entry n-2 wraps the sweep)
        pt = cycle_ref[jax.lax.rem(r, n - 1)]
        a_scr[...] = permute_sym(a_scr[...], pt)
        v_scr[...] = colmm(v_scr[...], pt)
        return 0

    total = sweeps * (n - 1)
    # rounds 0..total-2 rotate then re-pair; the final round rotates
    # then restores natural order with `last`. The eigenvalue sort
    # lives OUTSIDE the kernel (features/positional.py side): its
    # (B, n, n) comparison grids and one-hot dots inflate Mosaic's
    # scoped-vmem stack past the 16 MB limit at useful batch sizes,
    # and as plain XLA it costs ~30 us.
    jax.lax.fori_loop(0, total - 1, round_body, 0)
    rotate(total - 1, 0)
    last = last_ref[...]
    a = permute_sym(a_scr[...], last)
    v = colmm(v_scr[...], last)
    w_ref[...] = jnp.sum(a * jnp.eye(n, dtype=jnp.float32)[None], axis=-1)
    v_ref[...] = v


@functools.partial(jax.jit, static_argnames=("sweeps", "descending",
                                             "interpret"))
def jacobi_eigh_tpu(t: jax.Array, sweeps: int = 5,
                    descending: bool = False,
                    interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Batched symmetric eigendecomposition, fused in one Pallas program.

    t: (B, n, n) symmetric float32, n even (n = 32 for the PE finish).
    Returns (w, v): w (B, n) eigenvalues ascending (descending=True
    flips), v (B, n, n) eigenvectors in columns, t ≈ v diag(w) v^T.
    """
    b, n, n2 = t.shape
    assert n == n2 and n % 2 == 0
    kernel = functools.partial(_jacobi_kernel, n=n, sweeps=sweeps,
                               eps=1e-12)
    rounds = sweeps * (n - 1)
    mask_l, mask_r = _pivot_masks_np(n)
    first, cycle, last = _perm_mats(n)
    # Batch blocks per grid step: Mosaic stack-allocates live loop-body
    # temporaries (~25 values of (bpb, n, n), lane-padded 4x at n = 32).
    bpb = max(1, min(b, 64))
    while b % bpb:
        bpb -= 1
    operands = (
        t,
        jnp.asarray(mask_l),
        jnp.asarray(mask_r),
        jnp.asarray(first),
        jnp.asarray(cycle),
        jnp.asarray(last),
    )
    h = n // 2
    w, v = pl.pallas_call(
        kernel,
        grid=(b // bpb,),
        in_specs=[
            pl.BlockSpec((bpb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((bpb, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bpb, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bpb, n, n), jnp.float32),
                        pltpu.VMEM((bpb, n, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=b * rounds * (6 * n * n * n + 14 * n * n),
            bytes_accessed=b * n * n * 8, transcendentals=b * rounds * n,
        ),
        interpret=interpret,
    )(*operands)
    # Gather-free eigenvalue sort OUTSIDE the kernel (cheap as XLA;
    # fused into the kernel it blows the scoped-vmem stack): comparison
    # ranks with index tie-break -> one-hot permutation via batched dots.
    wk = w[:, :, None]
    wj = w[:, None, :]
    i_idx = jnp.arange(n)
    tie = i_idx[:, None] < i_idx[None, :]
    lt = (wk < wj) | ((wk == wj) & tie)
    rank = jnp.sum(lt.astype(jnp.float32), axis=1)
    if descending:
        rank = (n - 1) - rank
    sel = (rank[:, :, None] ==
           jnp.arange(n, dtype=jnp.float32)[None, None, :]).astype(
               jnp.float32)
    v = jax.lax.dot_general(
        v, sel, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = jax.lax.dot_general(
        w[:, None, :], sel, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]
    return w, v
