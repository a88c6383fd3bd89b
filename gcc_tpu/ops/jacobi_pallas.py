"""Fused Pallas kernel: batched Jacobi eigendecomposition (small n).

STATUS: EXPERIMENTAL — correct (oracle-tested in interpret mode AND
compiled on-chip) but SLOWER than the XLA formulation at production
shapes, so not wired into the PE path. Measured on v5e at
(1024, 32, 32), sweeps=3: ~100 ms/call vs ~2.9 ms/dispatch for the XLA
ops in production. Root cause: Pallas pins the (bpb, n, n) layout with
n = 32 lanes padded 4x, and the ~30 ops per round each re-traverse the
whole padded block through VMEM (~45 GB of VMEM traffic per call),
while XLA fuses the round into a few passes and tiles the batch
dimension into lanes with no padding. Beating XLA here needs a
lane-packed layout (4 matrices per 128-lane group), whose column-half
mixes require a per-group lane swap (partner lane = lane xor 16) — an
in-kernel shuffle Mosaic only exposes as a one-hot matmul, which costs
more than it saves. Kept for the structural insight below, which is
independent of Pallas.

Candidate replacement for the XLA-op formulation (ops/jacobi.py) of the
Rayleigh-Ritz finish in the PE subspace iteration
(features/positional.py).

Key structural insight (vs the earlier experimental kernel, which
re-paired via one-hot MXU matmuls at precision=HIGHEST): with the
UNSORTED round-robin tournament (circle method, pairs (players[i],
players[n-1-i]) without sorting pair members), the round-to-round
re-pairing in the half-split layout is ONE CONSTANT position
permutation, the sweep wrap-around is that same permutation, and the
layout returns to round-0 form after every n-1 rounds. That constant
permutation decomposes into 5 contiguous runs, so the in-kernel
re-pair is 5 static slice moves per axis — no gathers, no dots, no
per-round permutation tables. (Which member of a pair is "p" does not
affect the rotation: swapping (p, q) negates tau and s, giving the
same orthogonal transform.)

Kernel structure (ablation-informed, docs/PERF.md):
  * all state in VMEM scratch refs, mutated with static slice writes
    (jnp.concatenate in loop bodies blows Mosaic's scoped-vmem stack);
  * pair pivots via constant one-hot mask reduces (element gathers
    serialize);
  * one fori_loop over all sweeps*(n-1) rounds — measured loop floor
    at this block size is ~0.6 us/round, no unrolling needed;
  * layout in/out transforms (natural order <-> round-0 layout) and
    the final eigenvalue sort live OUTSIDE the kernel as plain XLA
    (one constant gather each).

No VJP — the PE features are stop-gradient inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcc_tpu.ops.jacobi import _rotation_cs


@functools.lru_cache(maxsize=None)
def _unsorted_tournament(n: int):
    """Circle-method layouts without pair sorting.

    Returns (layout0, moves) where layout0 (n,) is the round-0
    half-split layout (layout0[j], layout0[j + n/2]) = round-0 pair j,
    and moves is a tuple of (dst_start, dst_stop, src_start) contiguous
    runs realizing the CONSTANT incremental position permutation pi
    (next_layout[j] = layout[pi[j]]); the same permutation also wraps
    sweep boundaries, and layout returns to layout0 every n-1 rounds.
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
    assert len(pis) == 1, "unsorted circle method must give a constant perm"
    pi = np.asarray(next(iter(pis)), np.int32)
    # pairs coverage sanity
    seen = {tuple(sorted((lay[j], lay[j + h]))) for lay in layouts
            for j in range(h)}
    assert len(seen) == n * (n - 1) // 2
    moves, start = [], 0
    for j in range(1, n + 1):
        if j == n or pi[j] != pi[j - 1] + 1:
            moves.append((start, j, int(pi[start])))
            start = j
    # The kernel slices mixed half-blocks, so every run must sit inside
    # one half (holds structurally: pi = [0, h, 1..h-2, h+1..n-1, h-1]).
    for d0, d1, s0 in moves:
        assert (d1 - d0 == 1) or (s0 + (d1 - d0) <= h) or (s0 >= h), moves
    return np.asarray(layouts[0], np.int32), tuple(moves)


@functools.lru_cache(maxsize=None)
def _pivot_masks_half(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n/2, n) one-hot masks over the TOP/BOTTOM row blocks of the
    half-split layout: left mask 1 at (j, j), right at (j, j + n/2)."""
    h = n // 2
    left = np.zeros((h, n), np.float32)
    right = np.zeros((h, n), np.float32)
    left[np.arange(h), np.arange(h)] = 1.0
    right[np.arange(h), np.arange(h) + h] = 1.0
    return left, right


def _jacobi_kernel(a0_ref, vt0_ref, maskl_ref, maskr_ref, w_ref, vt_ref,
                   a_scr, v_scr, *, n: int, sweeps: int, eps: float,
                   moves):
    b = a0_ref.shape[0]
    h = n // 2
    mask_l, mask_r = maskl_ref[...], maskr_ref[...]
    a_scr[...] = a0_ref[...]
    v_scr[...] = jnp.broadcast_to(vt0_ref[...], (b, n, n))

    def round_body(_r, carry):
        a = a_scr[...]
        ae, ao = a[:, :h, :], a[:, h:, :]
        app = jnp.sum(ae * mask_l, axis=-1)
        aqq = jnp.sum(ao * mask_r, axis=-1)
        apq = jnp.sum(ae * mask_r, axis=-1)
        c, s = _rotation_cs(app, aqq, apq, eps)
        # Row mix A <- R~ A (R~ = [[c, -s], [s, c]] per pair), written
        # straight into the re-paired row positions: row-permute
        # commutes with the column ops below.
        ce, se = c[:, :, None], s[:, :, None]
        top = ce * ae - se * ao
        bot = se * ae + ce * ao

        def rowmix(src):  # row `src` of the mixed matrix, as a value
            return top[:, src - 0:src + 1, :] if src < h else \
                bot[:, src - h:src - h + 1, :]

        for d0, d1, s0 in moves:
            ln = d1 - d0
            if ln == 1:
                a_scr[:, d0:d1, :] = rowmix(s0)
            elif s0 + ln <= h:
                a_scr[:, d0:d1, :] = top[:, s0:s0 + ln, :]
            else:
                a_scr[:, d0:d1, :] = bot[:, s0 - h:s0 - h + ln, :]
        # Column mix A <- A R~^T, written into re-paired col positions.
        a = a_scr[...]
        al, ar = a[:, :, :h], a[:, :, h:]
        cc, sc = c[:, None, :], s[:, None, :]
        newl = cc * al - sc * ar
        newr = sc * al + cc * ar
        for d0, d1, s0 in moves:
            ln = d1 - d0
            if s0 + ln <= h:
                a_scr[:, :, d0:d1] = newl[:, :, s0:s0 + ln]
            elif s0 >= h:
                a_scr[:, :, d0:d1] = newr[:, :, s0 - h:s0 - h + ln]
            else:  # single-element runs only ever straddle nothing
                a_scr[:, :, d0:d1] = newl[:, :, s0:s0 + ln]
        # V^T rows track A's rows (mix + re-pair).
        v = v_scr[...]
        ve, vo = v[:, :h, :], v[:, h:, :]
        vtop = ce * ve - se * vo
        vbot = se * ve + ce * vo
        for d0, d1, s0 in moves:
            ln = d1 - d0
            if s0 + ln <= h:
                v_scr[:, d0:d1, :] = vtop[:, s0:s0 + ln, :]
            else:
                v_scr[:, d0:d1, :] = vbot[:, s0 - h:s0 - h + ln, :]
        return carry

    jax.lax.fori_loop(0, sweeps * (n - 1), round_body, 0)
    # sweeps*(n-1) re-pairs cycle the layout back to round-0 form.
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (ri == ci).astype(jnp.float32)
    w_ref[...] = jnp.sum(a_scr[...] * eye[None], axis=-1)
    vt_ref[...] = v_scr[...]


@functools.partial(jax.jit, static_argnames=("sweeps", "descending",
                                             "interpret"))
def jacobi_eigh_tpu(t: jax.Array, sweeps: int = 3,
                    descending: bool = False,
                    interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Batched symmetric eigendecomposition, fused in one Pallas program.

    t: (B, n, n) symmetric float32, n even (n = 32 for the PE finish).
    Returns (w, v): w (B, n) eigenvalues ascending (descending=True
    flips), v (B, n, n) eigenvectors in columns, t ≈ v diag(w) v^T.
    """
    b, n, n2 = t.shape
    assert n == n2 and n % 2 == 0
    layout0, moves = _unsorted_tournament(n)
    mask_l, mask_r = _pivot_masks_half(n)
    # Natural order -> round-0 layout, outside the kernel (one constant
    # gather; the kernel ends back in round-0 layout).
    a0 = t[:, layout0, :][:, :, layout0]
    vt0 = jnp.asarray(np.eye(n, dtype=np.float32)[np.asarray(layout0)])

    kernel = functools.partial(_jacobi_kernel, n=n, sweeps=sweeps,
                               eps=1e-12, moves=moves)
    import os

    # Block size: the (bpb, n, n) f32 round-body temporaries are
    # lane-padded 4x at n = 32, and Mosaic stack-allocates ~8 of them
    # live — bpb above ~16 overflows the scoped-vmem budget.
    bpb = max(1, min(b, int(os.environ.get("GCC_TPU_JACOBI_BPB", "16"))))
    while b % bpb:
        bpb -= 1
    w_l, vt = pl.pallas_call(
        kernel,
        grid=(b // bpb,),
        in_specs=[
            pl.BlockSpec((bpb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n // 2, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n // 2, n), lambda i: (0, 0),
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
            flops=b * sweeps * (n - 1) * 20 * n * n,
            bytes_accessed=b * n * n * 12,
            transcendentals=b * sweeps * (n - 1) * n,
        ),
        interpret=interpret,
    )(a0, vt0, jnp.asarray(mask_l), jnp.asarray(mask_r))
    # Undo the round-0 layout (w/vt rows are in layout0 positions):
    # natural w[layout0[j]] = w_l[j]  ->  scatter as a constant gather of
    # the inverse permutation.
    inv = np.empty(n, np.int32)
    inv[np.asarray(layout0)] = np.arange(n, dtype=np.int32)
    w = w_l[:, inv]
    # vt columns were never permuted (they are natural-basis coords);
    # eigenPAIR index = layout position, so v's COLUMN axis gets the
    # same relabeling as w.
    v = jnp.swapaxes(vt, 1, 2)[:, :, inv]
    # Gather-free eigenvalue sort (identical to ops/jacobi.py): ranks
    # with index tie-break -> one-hot permutation via batched dots.
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
