"""Laplacian-eigenvector positional embeddings, computed on device.

The reference computes, per subgraph on the host, the top
k = min(n-2, pos_size) eigenvectors of the normalized adjacency
M = D^{-1/2} A D^{-1/2} with ARPACK, row-L2-normalizes them and zero-pads
to pos_size columns (gcc/datasets/data_util.py:242-281). That per-sample
ARPACK call is the reference's CPU bottleneck (SURVEY.md §3.5).

Here the whole batch is eigendecomposed on the TPU in one fused XLA op
over the dense padded adjacency — subgraphs are bounded by the RWR visit
budget, so dense (B, N, N) is small — which moves the hot loop from host
Fortran to the accelerator and off the input pipeline's critical path.

Deviations from the reference (documented, learning-equivalent):
  * Column order is descending by eigenvalue (largest first, stable
    across graphs). The reference stores ARPACK's ascending-within-k
    order, which places the top eigenvector at column k-1 — a layout
    that *varies with subgraph size*; ours is a fixed permutation of it
    for fixed k.
  * Eigenvector signs are canonicalized (largest-|entry| component made
    positive) instead of inheriting ARPACK's random-v0 signs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcc_tpu.graph.batch import PaddedSubgraphBatch
from gcc_tpu.ops.aggregate import build_dense_adjacency, node_degrees

# Padding nodes get this on the diagonal of M so their eigenvalues sit
# strictly below spec(M) ⊆ [-1, 1] and never enter the top-k.
_PAD_EIGENVALUE = -2.0


def _use_pallas() -> str:
    """Fused Pallas PE path: "compiled" on TPU backends (the XLA op-by-op
    fallback is launch-overhead-bound), "" (fallback) elsewhere. Set
    GCC_TPU_PE_PALLAS=0 to opt out, or =interpret to run the kernel in
    Pallas interpret mode on any backend (oracle tests of the production
    kernel configuration on CPU)."""
    import os

    import jax

    flag = os.environ.get("GCC_TPU_PE_PALLAS", "1")
    if flag == "interpret":
        return "interpret"
    if flag == "1" and jax.default_backend() == "tpu":
        return "compiled"
    return ""


def normalized_adjacency(
    batch: PaddedSubgraphBatch, adj: jax.Array | None = None
) -> jax.Array:
    """M = D^{-1/2} A D^{-1/2} with degree clipped at 1 (data_util.py:273-277),
    padding diagonal pinned at -2 so padded nodes stay out of the top-k."""
    if adj is None:
        adj = build_dense_adjacency(batch)
    # Degrees as adjacency row-sums: bandwidth-only, vs. the edge
    # scatter-add which serializes on the VPU (~1 ms at bucket 256).
    deg = node_degrees(batch, adj)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    # f32 compute (adj promotes against the f32 scales), storage in the
    # adjacency dtype: under GCC_TPU_ADJ_DTYPE=bf16 the materialized
    # (B, N, N) operator halves its HBM footprint.
    m = adj * inv_sqrt[:, :, None] * inv_sqrt[:, None, :]
    n = batch.node_mask.shape[1]
    pad_diag = (1.0 - batch.node_mask) * _PAD_EIGENVALUE
    return (m + pad_diag[:, :, None] * jnp.eye(n, dtype=m.dtype)).astype(
        adj.dtype)


def laplacian_positional_embedding(
    batch: PaddedSubgraphBatch,
    pos_size: int,
    adj: jax.Array | None = None,
    method: str = "eigh",
    iters: int = 16,
    orth_every: int = 4,
    power_dtype=jnp.bfloat16,
    guards: int | None = None,
    m_shift: jax.Array | None = None,
    profile: str = "train",
) -> jax.Array:
    """(B, N_max, pos_size) positional embeddings.

    m_shift: optional precomputed shifted operator for the "subspace"
    method (= normalized adjacency + I on real rows, 0 on the padding
    diagonal — exactly what the fused one-pass featurize kernel emits,
    ops/featurize_pallas.py). When given, the normalize/shift chain here
    is skipped entirely.

    Per graph b with n_b real nodes: the k_b = min(n_b - 2, pos_size)
    leading eigenvectors of M (k_b ≤ 0 → zeros, data_util.py:245-246),
    sign-canonicalized, columns beyond k_b zeroed, rows L2-normalized
    (zero rows stay zero), padding rows zeroed.

    method:
      * "eigh" — exact full eigendecomposition. XLA's eigh lowers to QR
        iteration which is slow on TPU (~90ms for a (32,256,256) batch);
        use for oracle tests and small buckets.
      * "subspace" — shifted block orthogonal iteration (all batched
        MXU matmuls + Newton-Schulz re-orthonormalization every
        ``orth_every`` steps), columns ordered by Rayleigh quotient.
        Approximate in degenerate/clustered subspaces — same ambiguity
        the reference's ARPACK has — and the TPU-native hot path.

    guards: extra iterated columns beyond pos_size ("subspace" only).
        The tail column k converges at rate λ_{k+g+1}/λ_k per step
        instead of λ_{k+1}/λ_k — and on the MXU the column dim pads to
        128 lanes anyway, so the iteration cost is nearly unchanged;
        guards > 0 adds one (k+g, k+g) eigh for the generalized
        Rayleigh-Ritz (see below). Measured ARPACK-oracle fidelity
        (median |cos| over gap-separated columns,
        tests/test_pe_arpack_oracle.py), iters=16: on 150-500-node RWR
        subgraphs g=0 → 0.83 / g=16 → 0.989; on 34-53-node subgraphs
        g=0 → 0.85 / g=16 → 0.93. g=32 iterates too deep into the
        clustered bulk and starts hurting small graphs — keep ≤ 16.
    """
    m = (normalized_adjacency(batch, adj)
         if (m_shift is None or method != "subspace") else None)
    n_max = batch.node_mask.shape[1]
    # A bucket smaller than pos_size can only yield n_max eigenvectors;
    # the remaining columns are zero-padded (k_b ≤ n_b - 2 < pos_size
    # anyway, so the column mask below zeroes them regardless).
    n_vec = min(pos_size, n_max)
    if method == "eigh":
        # eigh: ascending eigenvalues; take the last n_vec columns,
        # largest first.
        _, vecs = jnp.linalg.eigh(m)
        top = vecs[:, :, -1 : -n_vec - 1 : -1]  # (B, N, n_vec), descending
    elif method == "subspace":
        if guards is None:
            guards = _pe_guards(profile)
        top = _subspace_topk(m, batch, n_vec, iters, orth_every,
                             power_dtype=power_dtype, guards=guards,
                             m_shift=m_shift)
    else:
        raise ValueError(f"unknown PE method: {method}")
    if n_vec < pos_size:
        top = jnp.pad(top, ((0, 0), (0, 0), (0, pos_size - n_vec)))

    # Canonicalize sign: make the entry with max |value| positive.
    # Gather-free formulation (argmax + take_along_axis lowers to a slow
    # serialized gather on TPU): select entries attaining the column max
    # |value| and sum them — sign of the sum matches the reference rule
    # except under exact-|value| ties of opposite sign (then it falls
    # back to +, same as the ref==0 case).
    mx = jnp.max(jnp.abs(top), axis=1, keepdims=True)
    ref = jnp.sum(jnp.where(jnp.abs(top) == mx, top, 0.0), axis=1,
                  keepdims=True)
    top = top * jnp.sign(jnp.where(ref == 0, 1.0, ref))

    # Zero out columns >= k_b = min(n_b - 2, pos_size).
    k = jnp.clip(batch.n_nodes - 2, 0, pos_size)  # (B,)
    col = jnp.arange(pos_size)
    top = top * (col[None, None, :] < k[:, None, None])

    # Row-L2 normalize (sklearn normalize semantics: zero rows -> zero).
    norm = jnp.linalg.norm(top, axis=-1, keepdims=True)
    top = top / jnp.where(norm == 0, 1.0, norm)

    return top * batch.node_mask[:, :, None]


def _subspace_topk(
    m: jax.Array,
    batch: PaddedSubgraphBatch,
    k: int,
    iters: int,
    orth_every: int,
    power_dtype=jnp.bfloat16,
    guards: int = 16,
    m_shift: jax.Array | None = None,
) -> jax.Array:
    """Top-k (algebraic) eigenvectors of M via shifted orthogonal iteration.

    Orthogonal iteration converges in |λ| order, so we iterate on
    M + I (spectrum shifted to [0, 2]) which makes modulus order equal
    algebraic order. Padding nodes carry diagonal -2 from
    :func:`normalized_adjacency`, i.e. shifted eigenvalue -1 — modulus 1
    could beat small real eigenvalues, so the padding block is first
    re-pinned to shifted 0 (diag -1 pre-shift) where it sorts last.

    ``guards`` extra columns are iterated and dropped after Rayleigh-Ritz:
    kept tail columns then converge against the gap to λ_{k+guards+1}
    instead of λ_{k+1} — see :func:`laplacian_positional_embedding`.
    """
    import numpy as np

    b, n = batch.node_mask.shape
    k_keep = k
    # Guarded block width: even (the Jacobi RR pairs columns), ≤ n.
    k = min(n, k_keep + max(0, guards))
    k = max(k - (k % 2), k_keep)
    if m_shift is None:
        eye = jnp.eye(n, dtype=m.dtype)
        pad = 1.0 - batch.node_mask
        # normalized_adjacency pinned padding at -2; move it to -1 so
        # the +1 shift sends it to 0 (lowest modulus). Stored in m's
        # dtype (bf16 under GCC_TPU_ADJ_DTYPE; the f32 mask promotes
        # the intermediate, so cast back).
        m_shift = (m + (pad[:, :, None] * eye) + eye).astype(m.dtype)
    # else: the fused featurize kernel already emitted exactly this
    # operator (ops/featurize_pallas.py, equality pinned by test).

    # Deterministic init (PE must be a pure function of the batch): a
    # fixed numpy basis baked into the program as a (n, k) constant —
    # generating it with jax.random.normal would re-run threefry on
    # (B, n, k) every step (~0.5 ms at the canonical bucket).
    q0_const = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, k)), jnp.float32
    )
    q = jnp.broadcast_to(q0_const, (b, n, k)) * batch.node_mask[:, :, None]

    def colnorm(q):
        # Column scale-normalization keeps the Gram matrix conditioned;
        # rank-deficient graphs (n ≤ k) stay finite.
        norm = jnp.linalg.norm(q, axis=1, keepdims=True)
        return q / jnp.maximum(norm, 1e-20)

    eye_k = jnp.eye(k, dtype=m_shift.dtype)

    def orth_ns(q, steps: int = 4):
        # Newton-Schulz orthonormalization: Q ← (3Q − Q QᵀQ)/2 after
        # scaling σ_max just below 1 via the Gershgorin bound
        # σ_max² ≤ ‖QᵀQ‖_∞ (a fixed 1/√k scale keeps NS in its linear
        # regime, where the power iteration's collapse onto the dominant
        # eigenvector outruns the re-orthogonalization — see
        # ops/pe_pallas.py ns_orth). Pure matmuls, no
        # Cholesky/triangular-solve in the hot loop.
        q = colnorm(q)
        gram = jnp.einsum("bni,bnj->bij", q, q)
        bound = jnp.max(jnp.sum(jnp.abs(gram), axis=2), axis=1)
        scale = jax.lax.rsqrt(jnp.maximum(bound, 1e-20))
        q = q * scale[:, None, None]
        gram = gram * (scale * scale)[:, None, None]
        for i in range(steps):
            if i:
                gram = jnp.einsum("bni,bnj->bij", q, q)
            q = 1.5 * q - 0.5 * jnp.einsum("bnk,bkj->bnj", q, gram)
        return jnp.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)

    def orth_chol(q):
        # Exact CholeskyQR for the final basis (one per call).
        q = colnorm(q)
        gram = jnp.einsum("bni,bnj->bij", q, q)
        r = jnp.linalg.cholesky(gram + 1e-5 * eye_k)
        q = jax.lax.linalg.triangular_solve(
            r, q, left_side=False, lower=True, transpose_a=True
        )
        return jnp.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)

    # The fused kernel holds M (N², f32+bf16) in VMEM; beyond ~1k nodes
    # per graph that no longer fits (~16MB VMEM/core) — large buckets use
    # the XLA path.
    pallas_mode = _use_pallas()
    if pallas_mode and n * n * 6 <= (4 << 20):
        # Fused single-kernel iteration (see ops/pe_pallas.py): the XLA
        # op-by-op path is launch-overhead-bound at these sizes. The
        # kernel's f32 Newton-Schulz finish returns a near-orthonormal
        # basis, so Rayleigh-Ritz runs directly — no CholeskyQR pass
        # (cholesky + triangular_solve cost ~0.4 ms/step unfused at
        # bucket 256); guarded bases are whitened exactly below.
        from gcc_tpu.ops.pe_pallas import pe_subspace_iterate

        q = pe_subspace_iterate(m_shift, colnorm(q), iters=iters,
                                orth_every=orth_every,
                                power_dtype=power_dtype,
                                interpret=(pallas_mode == "interpret"))
        q = jnp.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)
    else:
        # Same mixed-precision scheme as the kernel: power/NS matmuls
        # with bf16 inputs + f32 accumulation (the iteration is FLOP-
        # bound at f32 MXU rate), then f32 polish steps to contract the
        # bf16 rounding noise before the exact finish.
        m_lo = m_shift.astype(power_dtype)
        q = orth_chol(q)
        for i in range(iters):
            q = jax.lax.dot_general(
                m_lo, q.astype(power_dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if (i + 1) % orth_every == 0 and i != iters - 1:
                q = orth_ns(q)
        for _ in range(2):  # f32 polish (bf16-stored m converts in-read)
            q = colnorm(jax.lax.dot_general(
                m_shift.astype(jnp.float32), q,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        q = orth_chol(q)

    if k > k_keep:
        # Guarded bases are ill-conditioned in the guard directions (they
        # sit in the clustered spectral bulk), beyond what the kernel's
        # fixed-step Löwdin finish can whiten — and Rayleigh-Ritz on a
        # non-orthonormal basis MIXES eigenvectors. Solve the GENERALIZED
        # problem (T, S) exactly instead: eigendecompose the small Gram
        # S = V·s·Vᵀ and whiten with W = V·s^{-1/2}, so (QW)ᵀ(QW) = I
        # and the plain RR below is exact. One extra (k, k) eigh +
        # one (N, k) matmul, paid only when guards > 0.
        s_g = jnp.einsum("bni,bnj->bij", q, q)
        s_g = 0.5 * (s_g + jnp.swapaxes(s_g, 1, 2))
        s_g = s_g + 1e-5 * jnp.eye(k, dtype=s_g.dtype)
        if _rr_method() == "jacobi" and k % 2 == 0:
            from gcc_tpu.ops.jacobi import jacobi_eigh

            sv, v = jacobi_eigh(s_g, sweeps=_rr_sweeps(), descending=True,
                                layout=_jacobi_layout())
            sv_max = sv[:, :1]
        else:
            sv, v = jnp.linalg.eigh(s_g)
            sv_max = sv[:, -1:]
        # RELATIVE floor: directions whose sv is « the graph's top sv are
        # numerically collapsed (power iteration drove them dependent, or
        # the graph is smaller than the block) — whitening would amplify
        # f32 noise into Ritz directions that scramble the top-k ordering
        # (measured: median |cos| 0.13 on 34-53-node graphs with an
        # absolute clamp). DROP them instead: their T' rows become 0, so
        # their Ritz values sink to the bottom of the (shifted, ≥0)
        # spectrum and never displace genuine columns.
        floor = 0.1 * sv_max
        keep = (sv > floor).astype(q.dtype)
        w = v * (jax.lax.rsqrt(jnp.maximum(sv, floor)) * keep)[:, None, :]
        q = jax.lax.dot_general(
            q, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # Rayleigh-Ritz: rotate the converged subspace onto Ritz vectors —
    # resolves the slow per-column convergence of clustered eigenvalues
    # with one small (k, k) eigendecomposition. Uses m_shift (= M + I
    # off padding): the identity shift changes neither eigenvectors nor
    # order, and q is zero on padding rows so the padding-diagonal
    # difference contributes qᵀΔq = 0 — this avoids keeping a second
    # dense (B, N, N) M alive.
    mq = jax.lax.dot_general(
        m_shift.astype(jnp.float32), q,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    t = jnp.einsum("bni,bnj->bij", q, mq)
    t = 0.5 * (t + jnp.swapaxes(t, 1, 2))
    if _rr_method() == "jacobi" and t.shape[-1] % 2 == 0:
        # Batched parallel-order Jacobi (ops/jacobi.py): XLA's eigh
        # custom call costs ~4.4 ms on a (64, 32, 32) batch on v5e —
        # two thirds of the whole train step; the Jacobi finish is
        # ~3.5 ms as XLA ops and column-exact vs eigh at 5 sweeps
        # (fewer sweeps leave clustered Ritz values mis-ORDERED, which
        # permutes PE columns per graph — oracle test in
        # tests/test_ops_features.py pins equality at the default).
        from gcc_tpu.ops.jacobi import jacobi_eigh

        _, u = jacobi_eigh(t, sweeps=_rr_sweeps(), descending=True,
                           layout=_jacobi_layout())
    else:
        _, u = jnp.linalg.eigh(t)  # ascending
        u = u[:, :, ::-1]  # descending algebraic
    # Rotate onto the top-k_keep Ritz vectors only — the guard columns'
    # Ritz directions are discarded (u sliced before the matmul, so the
    # rotation itself shrinks to (k, k_keep)).
    return jax.lax.dot_general(
        q, u[:, :, :k_keep], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _pe_guards(profile: str = "train") -> int:
    """Default guard-column count for the subspace PE, per profile.

    "train" → 0: the guarded path costs 3.3x on the device step (two
    (48,48) Jacobi chains vs one (32,32) — docs/PERF.md Session 5 A/B)
    and the downstream PE A/B shows training-time fidelity at g=0 does
    not move frozen-embedding transfer.  "eval" → 16: generate/finetune
    featurization is once-per-dataset, and g=16 restores ARPACK-oracle
    fidelity 0.83 → 0.989 where the embeddings are actually consumed.
    GCC_TPU_PE_GUARDS force-overrides both profiles."""
    import os

    env = os.environ.get("GCC_TPU_PE_GUARDS")
    if env is not None:
        return int(env)
    return 16 if profile == "eval" else 0


def _rr_method() -> str:
    """Rayleigh-Ritz finisher: "jacobi" (default) or "eigh" via
    GCC_TPU_PE_RR. The Jacobi finish matches the eigh finish column-
    for-column at the default sweep count and is ~20% faster on TPU
    (docs/PERF.md); eigh remains as the oracle path."""
    import os

    return os.environ.get("GCC_TPU_PE_RR", "jacobi")


def _jacobi_layout() -> str:
    """Memory layout for the RR Jacobi finishes: "bm" (default,
    batch-minor: rounds run as (n, n, B) with the batch on the lane
    axis — zero lane-pad waste when B >> n, as in the hoisted featurize
    where B ≈ 2048 and n = 32-48) or "lane" ((..., n, n) with n on the
    lane axis). Numerically identical (tests/test_ops_features.py
    test_jacobi_eigh_bm_equals_lane); bm measured a stable 0.8% faster
    on the full device step (0.628 vs 0.633 ms across 5 device-resident
    round-robin trials, scripts/diag_step_ab2.py — docs/PERF.md
    Session 5). Select via GCC_TPU_JACOBI_LAYOUT."""
    import os

    return os.environ.get("GCC_TPU_JACOBI_LAYOUT", "bm")


def _rr_sweeps() -> int:
    """Parallel-order Jacobi sweeps for the RR finish (default 3).

    3 sweeps converge the Ritz VECTORS (per-column |cos| vs the exact
    finish is statistically identical to 5 sweeps at the canonical
    config — both limited by the subspace iteration's clustered-spectrum
    ambiguity, not the finish; measured in docs/PERF.md), while 5 make
    the finish column-for-column EXACT vs the eigh finish, including the
    order of near-degenerate Ritz values (the oracle-test setting). The
    Jacobi chain is op-count-bound, so sweeps trade directly against
    step time (~45 us/step each at the canonical config)."""
    import os

    return int(os.environ.get("GCC_TPU_PE_RR_SWEEPS", "3"))
