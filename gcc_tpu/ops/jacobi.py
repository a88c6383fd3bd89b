"""Batched Jacobi eigendecomposition for small symmetric matrices.

Replaces XLA's `jnp.linalg.eigh` for the Rayleigh-Ritz finish of the
positional-embedding subspace iteration (features/positional.py). XLA's
eigh lowers to a QR-iteration custom call that costs ~4.4 ms for a
(64, 32, 32) batch on TPU v5e — two thirds of the entire MoCo train
step (docs/PERF.md). A parallel-order ("round-robin tournament")
cyclic Jacobi sweeps all n/2 disjoint pivot pairs per round as
elementwise half-block row and column mixes, so one round is a handful
of VPU ops over the whole batch, and ~5 sweeps of n-1 rounds
diagonalize a 32x32 matrix to float32 working precision (quadratic
convergence; Golub & Van Loan §8.5, Brent-Luk ordering). For the PE
finish T = QᵀMQ is already near-diagonal (the subspace iteration has
converged up to clustered-eigenvalue mixing), so 2-3 sweeps suffice
(tests/test_ops_features.py pins the quality).

Layout: pivot pair j lives at rows/cols (j, j + n/2) — "half split" —
so the two pair members are CONTIGUOUS static slices (top half, bottom
half), mixed elementwise: A_top' = c*A_top - s*A_bot etc. After each
round a fixed permutation re-pairs the players (chess-tournament
rotation: player 0 stays, the rest cycle), applied to rows and columns
with constant-index gathers. No (B, n, n) rotation matrices are ever
materialized.

This mirrors the reference's use of ARPACK for subgraph PEs
(gcc/datasets/data_util.py:242-263) only in role; the algorithm choice
is TPU-native (no reference analog).
"""

from __future__ import annotations

import functools

import numpy as np


def tournament_schedule(n: int) -> np.ndarray:
    """Round-robin pairings: (n-1, n/2, 2) int array; round r pairs
    schedule[r, j] = (p, q). Standard circle method: player 0 fixed,
    players 1..n-1 rotate."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [
            tuple(sorted((players[i], players[n - 1 - i])))
            for i in range(n // 2)
        ]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, np.int32)


@functools.lru_cache(maxsize=None)
def half_layout_perms(n: int) -> tuple[np.ndarray, ...]:
    """Half-split layouts per round: layout[r][j] = p_j,
    layout[r][j + n/2] = q_j. Returns n incremental gather-index
    vectors: entry r < n-1 takes the previous round's layout (natural
    order for r = 0) to round r's; the last entry restores natural
    order after round n-2."""
    sched = tournament_schedule(n)
    h = n // 2
    out = []
    prev = np.arange(n, dtype=np.int32)
    for r in range(n - 1):
        layout = np.empty(n, np.int32)
        layout[:h] = sched[r, :, 0]
        layout[h:] = sched[r, :, 1]
        inv_prev = np.empty(n, np.int32)
        inv_prev[prev] = np.arange(n, dtype=np.int32)
        out.append(inv_prev[layout])
        prev = layout
    inv_prev = np.empty(n, np.int32)
    inv_prev[prev] = np.arange(n, dtype=np.int32)
    out.append(inv_prev)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _pivot_masks_np(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n/2, n) masks over the TOP/BOTTOM row blocks of the half-split
    layout: left mask 1 at (j, j), right mask 1 at (j, j + n/2)."""
    h = n // 2
    left = np.zeros((h, n), np.float32)
    right = np.zeros((h, n), np.float32)
    left[np.arange(h), np.arange(h)] = 1.0
    right[np.arange(h), np.arange(h) + h] = 1.0
    return left, right


def _rotation_cs(app, aqq, apq, eps: float):
    """Classic two-sided Jacobi rotation coefficients (vectorized).

    Zeroes A[p,q]: with tau = (aqq - app) / (2 apq),
    t = sign(tau) / (|tau| + sqrt(1 + tau^2)), c = 1/sqrt(1+t^2),
    s = t c. apq ~ 0 -> identity rotation.
    """
    import jax.numpy as jnp

    small = jnp.abs(apq) <= eps * jnp.sqrt(jnp.abs(app * aqq) + eps)
    safe_apq = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0, 1.0, t)  # tau=0 -> 45 degrees
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s


@functools.lru_cache(maxsize=None)
def unsorted_tournament(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Round-robin schedule WITHOUT sorting pair members (circle method
    verbatim). Key property: in the half-split layout, the round-to-
    round re-pairing is ONE CONSTANT position permutation pi, the sweep
    wrap is that same pi, and the layout returns to round-0 form every
    n-1 rounds — so the per-round re-pair is a handful of static slice
    moves instead of a per-round gather table. (Pair-member order does
    not affect the rotation: swapping (p, q) negates tau and s, the
    same orthogonal transform.)

    Returns (layout0, pi): layout0 (n,) maps half-split position -> node
    index for round 0; next_layout[j] = layout[pi[j]].
    """
    assert n % 2 == 0
    h = n // 2
    players = list(range(n))
    layouts = []
    for _ in range(n - 1):
        layouts.append([players[i] for i in range(h)]
                       + [players[n - 1 - i] for i in range(h)])
        players = [players[0]] + [players[-1]] + players[1:-1]
    pis = set()
    for r in range(n - 1):
        cur, nxt = layouts[r], layouts[(r + 1) % (n - 1)]
        inv = {v: k for k, v in enumerate(cur)}
        pis.add(tuple(inv[nxt[j]] for j in range(n)))
    assert len(pis) == 1
    seen = {tuple(sorted((lay[j], lay[j + h]))) for lay in layouts
            for j in range(h)}
    assert len(seen) == n * (n - 1) // 2
    pi = np.asarray(next(iter(pis)), np.int32)
    # The slice decomposition jacobi_eigh uses assumes this exact form.
    expect = np.asarray([0, h] + list(range(1, h - 1))
                        + list(range(h + 1, n)) + [h - 1], np.int32)
    assert np.array_equal(pi, expect), (pi, expect)
    return np.asarray(layouts[0], np.int32), pi


def _v_dtype():
    """Storage dtype for the eigenvector accumulator V across rounds.

    GCC_TPU_JACOBI_V_DTYPE=bf16 halves the V read+write traffic of the
    round chain (docs/PERF.md lever 2: V is one of three (n, n, B)-sized
    streams per round; the chain is HBM-bound). Each round then rounds V
    to bf16 (~0.4% relative) after an f32 rotation — a random-walk error
    of ~sqrt(rounds)·2^-9 ≈ 2% over 155 rounds on the Ritz ROTATION only;
    the Ritz VALUES and their order come from T, which stays f32, so the
    order-stability property the sweep-count A/B showed matters
    downstream is untouched. Default f32."""
    import os

    import jax.numpy as jnp

    return (jnp.bfloat16
            if os.environ.get("GCC_TPU_JACOBI_V_DTYPE") == "bf16"
            else jnp.float32)


def jacobi_eigh(a, sweeps: int = 5, eps: float = 1e-12,
                descending: bool = False, sort: bool = True,
                layout: str = "lane"):
    """Eigendecomposition of a batch of symmetric matrices.

    a: (..., n, n) symmetric, n even. Returns (w, v) like
    jnp.linalg.eigh: w (..., n) ascending (descending=True flips),
    v (..., n, n) with eigenvectors in columns (a ≈ v @ diag(w) @ v^T).

    `sweeps` full parallel-order sweeps of n-1 rounds each; 5 sweeps
    reach float32 working precision for n = 32 from a generic start,
    2-3 when a is already near-diagonal (the Rayleigh-Ritz use).

    layout:
      * "lane" — rounds run on (..., n, n) with n on the 128-lane axis.
        For the PE sizes (n = 32/48) the minor dim lane-pads 2.7-4x, and
        the round chain is HBM-bandwidth-bound — most of each pass moves
        padding.
      * "bm" (batch-minor) — rounds run transposed as (n, n, B) with the
        BATCH on the lane axis: zero padding waste at any n (B is
        thousands in the hoisted featurize), and every slice/concat of
        the round lands on cheap major dims. Two one-off transposes at
        entry/exit. Wins iff B ≫ n. Selected in the PE Rayleigh-Ritz
        finishes via GCC_TPU_JACOBI_LAYOUT (features/positional.py);
        bm ≡ lane pinned by tests/test_ops_features.py
        test_jacobi_eigh_bm_equals_lane.

    Uses the UNSORTED tournament schedule (see
    :func:`unsorted_tournament`): the re-pair between rounds is a
    constant permutation expressed as static slice concatenations
    instead of per-round gather tables. Measured wall-neutral vs the
    gather form on v5e (XLA emits copies for the concats too); kept for
    the simpler structure — one schedule constant, no per-round
    permutation list — and as the basis of the fused-kernel variant
    (ops/jacobi_pallas.py).
    """
    import jax.numpy as jnp

    if layout == "bm":
        return _jacobi_eigh_bm(a, sweeps, eps, descending, sort)
    assert layout == "lane", layout
    n = a.shape[-1]
    assert n % 2 == 0, "jacobi_eigh requires even n (pad odd sizes)"
    h = n // 2
    layout0, _pi = unsorted_tournament(n)
    mask_l, mask_r = (jnp.asarray(m) for m in _pivot_masks_np(n))

    # Natural order -> round-0 layout (one gather; rounds then cycle the
    # layout back to round-0 form every n-1 re-pairs).
    a = a[..., layout0, :][..., :, layout0]
    eye0 = np.eye(n, dtype=np.float32)[np.asarray(layout0)]
    vdt = _v_dtype()
    vt = jnp.broadcast_to(jnp.asarray(eye0, vdt), a.shape)

    def repair(x, axis):
        # Constant re-pair pi = [0, h, 1..h-2, h+1..n-1, h-1] as static
        # slice concatenation (verified against pi in tests).
        idx = [slice(None)] * x.ndim
        def take(lo, hi):
            s = list(idx)
            s[axis] = slice(lo, hi)
            return x[tuple(s)]
        return jnp.concatenate(
            [take(0, 1), take(h, h + 1), take(1, h - 1),
             take(h + 1, n), take(h - 1, h)], axis=axis)

    for _ in range(sweeps * (n - 1)):
        ae, ao = a[..., :h, :], a[..., h:, :]
        # pivots: app = ae[.., j, j], aqq = ao[.., j, j+h],
        # apq = ae[.., j, j+h] — masked reduces with constant
        # one-hots (element gathers serialize on TPU).
        app = jnp.sum(ae * mask_l, axis=-1)
        aqq = jnp.sum(ao * mask_r, axis=-1)
        apq = jnp.sum(ae * mask_r, axis=-1)
        c, s = _rotation_cs(app, aqq, apq, eps)
        # rows: A <- R~ A, R~ = [[c, -s], [s, c]] per pair
        ce, se = c[..., :, None], s[..., :, None]
        a = jnp.concatenate([ce * ae - se * ao, se * ae + ce * ao],
                            axis=-2)
        # cols: A <- A R~^T (same coefficients on the lane halves)
        al, ar = a[..., :, :h], a[..., :, h:]
        cc, sc = c[..., None, :], s[..., None, :]
        a = jnp.concatenate([cc * al - sc * ar, sc * al + cc * ar],
                            axis=-1)
        # eigenvector accumulation: V^T <- R~ V^T (f32 rotation math,
        # stored back in the V dtype — see _v_dtype)
        ve, vo = vt[..., :h, :], vt[..., h:, :]
        vt = jnp.concatenate([ce * ve - se * vo, se * ve + ce * vo],
                             axis=-2).astype(vdt)
        # re-pair for the next round (constant slice moves)
        a = repair(repair(a, a.ndim - 2), a.ndim - 1)
        vt = repair(vt, vt.ndim - 2)

    # Undo the round-0 layout: eigenpair j sits at layout position j.
    inv = np.empty(n, np.int32)
    inv[np.asarray(layout0)] = np.arange(n, dtype=np.int32)
    w = jnp.diagonal(a, axis1=-2, axis2=-1)[..., inv]
    v = jnp.swapaxes(vt, -1, -2).astype(a.dtype)[..., :, inv]
    if not sort:
        return w, v
    return _sort_eig(w, v, n, descending)


def _jacobi_eigh_bm(a, sweeps: int, eps: float, descending: bool,
                    sort: bool):
    """Batch-minor rounds: see :func:`jacobi_eigh` (layout="bm").

    Internally flattens the batch to one trailing axis: a (B, n, n) →
    rounds on (n, n, B) → results transposed back. The sort (one-hot
    permutation matmul) runs batch-major on the MXU as in the lane
    layout."""
    import jax.numpy as jnp

    n = a.shape[-1]
    assert n % 2 == 0, "jacobi_eigh requires even n (pad odd sizes)"
    h = n // 2
    batch_shape = a.shape[:-2]
    layout0, _pi = unsorted_tournament(n)
    mask_l, mask_r = (jnp.asarray(m)[:, :, None] for m in _pivot_masks_np(n))

    a = a.reshape((-1,) + a.shape[-2:])
    a = jnp.transpose(a, (1, 2, 0))  # (n, n, B)
    a = a[layout0][:, layout0]
    eye0 = np.eye(n, dtype=np.float32)[np.asarray(layout0)]
    vdt = _v_dtype()
    vt = jnp.broadcast_to(jnp.asarray(eye0, vdt)[:, :, None], a.shape)

    def repair(x, axis):
        def take(lo, hi):
            s = [slice(None)] * x.ndim
            s[axis] = slice(lo, hi)
            return x[tuple(s)]
        return jnp.concatenate(
            [take(0, 1), take(h, h + 1), take(1, h - 1),
             take(h + 1, n), take(h - 1, h)], axis=axis)

    for _ in range(sweeps * (n - 1)):
        ae, ao = a[:h], a[h:]
        app = jnp.sum(ae * mask_l, axis=1)   # (h, B)
        aqq = jnp.sum(ao * mask_r, axis=1)
        apq = jnp.sum(ae * mask_r, axis=1)
        c, s = _rotation_cs(app, aqq, apq, eps)
        ce, se = c[:, None, :], s[:, None, :]
        a = jnp.concatenate([ce * ae - se * ao, se * ae + ce * ao], axis=0)
        al, ar = a[:, :h], a[:, h:]
        cc, sc = c[None, :, :], s[None, :, :]
        a = jnp.concatenate([cc * al - sc * ar, sc * al + cc * ar], axis=1)
        ve, vo = vt[:h], vt[h:]
        vt = jnp.concatenate([ce * ve - se * vo, se * ve + ce * vo],
                             axis=0).astype(vdt)
        a = repair(repair(a, 0), 1)
        vt = repair(vt, 0)

    inv = np.empty(n, np.int32)
    inv[np.asarray(layout0)] = np.arange(n, dtype=np.int32)
    # Diagonal via a masked reduce (element gathers serialize on TPU),
    # then back to batch-major for the inverse-layout gather + sort.
    eye_m = jnp.asarray(np.eye(n, dtype=np.float32), a.dtype)[:, :, None]
    w = jnp.sum(a * eye_m, axis=1)               # (n, B), layout order
    w = jnp.transpose(w, (1, 0))[..., inv]       # (B, n)
    v = jnp.transpose(vt, (2, 1, 0)).astype(a.dtype)[..., :, inv]
    w = w.reshape(batch_shape + (n,))
    v = v.reshape(batch_shape + (n, n))
    if not sort:
        return w, v
    return _sort_eig(w, v, n, descending)


def _sort_eig(w, v, n: int, descending: bool):
    """Gather-free eigenpair sort (shared by both layouts): comparison
    ranks (index tie-break) build a one-hot permutation applied with one
    batched matmul — argsort + take_along_axis lowers to a serialized
    gather on TPU."""
    import jax.numpy as jnp

    wk = w[..., :, None]
    wj = w[..., None, :]
    if descending:
        less = (wk > wj) | ((wk == wj) & _tri(n, w.dtype))
    else:
        less = (wk < wj) | ((wk == wj) & _tri(n, w.dtype))
    rank = jnp.sum(less.astype(w.dtype), axis=-2)
    sel = (rank[..., :, None] ==
           jnp.arange(n, dtype=w.dtype)[None, :]).astype(w.dtype)
    v = jnp.einsum("...ij,...jr->...ir", v, sel)
    w = jnp.einsum("...j,...jr->...r", w, sel)
    return w, v


def _tri(n: int, dtype):
    """Strictly-lower-triangular bool mask (k < j tie-break)."""
    import jax.numpy as jnp

    i = jnp.arange(n)
    return (i[:, None] < i[None, :])
