"""ARPACK-semantics PE oracle on real-scale subgraphs (VERDICT r1 item 2).

Reproduces the reference recipe EXACTLY in scipy
(gcc/datasets/data_util.py:242-281): ``scipy.sparse.linalg.eigsh`` on
D^-1/2 A D^-1/2 with ``which="LA"``, ``k = min(n-2, 32)``,
``ncv = min(n, max(2k+1, 20))``, a random ``v0``, and the retry loop that
doubles ncv on ArpackError — then sklearn-style row L2 normalization and
zero padding to pos_size. The oracle runs on subgraphs sampled by the
PRODUCTION RWR sampler at 100-500-node scale (the reference's real
operating range at rw_hops 256+), not toy graphs.

Alignment of documented deviations (features/positional.py):
  * column order — ours descending vs ARPACK ascending-within-k: a fixed
    reversal for fixed k;
  * signs — canonicalized (max-|entry| component positive) on both sides;
  * degenerate/clustered eigenvalues — the reference's own ARPACK output
    is arbitrary up to rotation inside a cluster, so clustered columns
    are compared via their (row-normalization-compatible) cluster Grams
    G = U_C U_Cᵀ, which are invariant to in-cluster rotation AND to the
    shared row normalization; gap-separated columns compare entrywise.
"""

import numpy as np
import pytest

import jax

from gcc_tpu.config import SamplerConfig
from gcc_tpu.features import featurize_batch, laplacian_positional_embedding
from gcc_tpu.graph.batch import batch_subgraphs
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.sampling.sampler import sample_contrastive_pairs

POS_SIZE = 32
N_MAX = 512
E_MAX = 8192


# --- reference recipe in scipy ------------------------------------------------


def arpack_reference_pe(src, dst, n, pos_size=POS_SIZE, retry=10, rng_seed=0):
    """data_util.py:242-281 verbatim semantics; returns (pe, evals_desc).

    evals_desc are the k ARPACK eigenvalues in descending order (for gap
    analysis); pe is the final (n, pos_size) float32 feature in the
    REFERENCE's layout (ascending-within-k columns, ARPACK signs).
    """
    import scipy.sparse as sp
    from scipy.sparse.linalg import ArpackError, eigsh

    a = sp.coo_matrix(
        (np.ones(len(src)), (np.asarray(dst), np.asarray(src))), shape=(n, n)
    ).tocsr()
    deg = np.asarray(a.sum(axis=1)).ravel()
    norm = sp.diags(np.clip(deg, 1, None) ** -0.5)
    lap = (norm @ a @ norm).astype(np.float64)
    k = min(n - 2, pos_size)
    if k <= 0:
        return np.zeros((n, pos_size), np.float32), np.zeros(0)
    ncv = min(n, max(2 * k + 1, 20))
    v0 = np.random.RandomState(rng_seed).rand(n)
    for i in range(retry):
        try:
            s, u = eigsh(lap, k=k, which="LA", ncv=ncv, v0=v0)
        except ArpackError:  # data_util.py:250-257
            ncv = min(ncv * 2, n)
            if i + 1 == retry:
                s, u = np.zeros(k), np.zeros((n, k))
        else:
            break
    rn = np.linalg.norm(u, axis=1, keepdims=True)
    x = u / np.where(rn == 0, 1.0, rn)  # sklearn normalize: zero rows stay
    out = np.zeros((n, pos_size), np.float32)
    out[:, :k] = x
    return out, s[::-1].copy()


def align_signs(x, to):
    """Flip columns of x so that <x_j, to_j> >= 0.

    ARPACK's eigenvector signs are whatever the random v0 produced
    (data_util.py:246-249) — the reference has NO sign convention — so the
    only meaningful comparison is up to per-column sign. (The device's own
    canonicalization rule is deterministic but can legitimately differ on
    symmetric/localized eigenvectors whose max-|entry| is attained at
    entries of opposite sign.)"""
    dots = np.einsum("nj,nj->j", x, to)
    return x * np.where(dots < 0, -1.0, 1.0)[None, :]


def align_reference_to_device(pe_ref, k, device_pe):
    """Reverse the k real columns to descending order + match signs to the
    device output. Row normalization already happened inside the recipe
    and is invariant to both operations, so this yields the device's
    layout exactly (up to in-cluster rotations)."""
    out = pe_ref.copy()
    out[:, :k] = out[:, :k][:, ::-1]
    return align_signs(out, device_pe)


def eigen_gaps_desc(src, dst, n, k):
    """Descending top-(k+1) dense eigenvalues -> per-column isolation gap."""
    a = np.zeros((n, n))
    np.add.at(a, (np.asarray(dst), np.asarray(src)), 1.0)
    deg = a.sum(axis=1)
    inv = 1.0 / np.sqrt(np.clip(deg, 1, None))
    vals = np.linalg.eigvalsh(a * inv[:, None] * inv[None, :])[::-1]
    gaps = np.empty(k)
    for j in range(k):
        above = vals[j - 1] - vals[j] if j > 0 else np.inf
        below = vals[j] - vals[j + 1] if j + 1 < len(vals) else np.inf
        gaps[j] = min(above, below)
    return vals, gaps


# --- real-scale subgraphs from the production sampler -------------------------


_CACHE = {}


def real_scale_batch():
    """9 RWR subgraphs spanning ~150-500 nodes off a power-law graph.

    Restart prob 0.8 confines RWR to the seed's ball, so reaching the
    reference's big-subgraph regime needs hubs — a zipf-degree graph like
    the reference's social/citation corpora, with seeds picked across the
    degree spectrum (hubs[r] = r-th highest-degree node)."""
    if "batch" in _CACHE:
        return _CACHE["batch"], _CACHE["subs"]
    rng = np.random.default_rng(7)
    n = 8000
    deg_bias = rng.zipf(2.0, n).clip(1, 500).astype(np.float64)
    m = 60_000
    src = rng.choice(n, m, p=deg_bias / deg_bias.sum())
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                            symmetrize=True)
    hubs = np.argsort(np.diff(g.indptr))[::-1]
    subs = []
    for rw_hops, seeds in ((256, (hubs[40], hubs[5])),
                           (1024, (123, hubs[100])),
                           (2048, (hubs[200], 77)),
                           (4096, (42, hubs[400], 2222))):
        cfg = SamplerConfig(rw_hops=rw_hops)
        q, _ = sample_contrastive_pairs(g, np.asarray(seeds, np.int64), cfg,
                                        rng_seed=3)
        subs.extend(q)
    sizes = sorted(s.num_nodes for s in subs)
    assert sizes[0] >= 100 and sizes[-1] <= N_MAX, sizes
    assert sizes[-1] >= 400, sizes  # spans the real operating range
    batch = batch_subgraphs(subs, n_max=N_MAX, e_max=E_MAX)
    _CACHE["batch"], _CACHE["subs"] = batch, subs
    return batch, subs


# --- tests ---------------------------------------------------------------------

GAP_TOL = 1e-3  # cluster threshold: below this, ARPACK itself is rotation-
#                 ambiguous (and f32 device eigenvectors lose digits ~eps/gap)


def test_arpack_matches_dense_topk_eigenvalues():
    # Sanity for the oracle itself: which="LA" on the normalized adjacency
    # returns the top of the DENSE spectrum (the assumption behind the
    # device's dense/batched eigendecomposition replacing ARPACK, N13).
    _, subs = real_scale_batch()
    for s in subs[:3]:
        k = min(s.num_nodes - 2, POS_SIZE)
        _, evals = arpack_reference_pe(s.src, s.dst, s.num_nodes)
        dense, _ = eigen_gaps_desc(s.src, s.dst, s.num_nodes, k)
        np.testing.assert_allclose(evals, dense[:k], atol=1e-8)


def test_device_eigh_pe_matches_arpack_oracle_real_scale():
    batch, subs = real_scale_batch()
    dev = np.asarray(
        jax.jit(lambda b: laplacian_positional_embedding(b, POS_SIZE,
                                                         method="eigh"))(batch)
    )
    for i, s in enumerate(subs):
        n = s.num_nodes
        k = min(n - 2, POS_SIZE)
        ours = dev[i, :n]
        ref_raw, _ = arpack_reference_pe(s.src, s.dst, n)
        ref = align_reference_to_device(ref_raw, k, ours)
        _, gaps = eigen_gaps_desc(s.src, s.dst, n, k)

        # Row norms are invariant to all alignment ambiguity: exact match.
        np.testing.assert_allclose(
            np.linalg.norm(ours, axis=1), np.linalg.norm(ref, axis=1),
            atol=1e-4,
        )

        # Cluster the k columns by eigenvalue gaps; compare each cluster's
        # Gram (rotation- and row-normalization-invariant), and isolated
        # columns entrywise (sign-canonical on both sides).
        j = 0
        isolated = 0
        while j < k:
            j2 = j + 1
            while j2 < k and gaps[j2] < GAP_TOL:
                j2 += 1
            if j2 - j == 1 and gaps[j] >= GAP_TOL:
                np.testing.assert_allclose(
                    ours[:, j], ref[:, j], atol=5e-3,
                    err_msg=f"graph {i} (n={n}) column {j}",
                )
                isolated += 1
            else:
                go = ours[:, j:j2] @ ours[:, j:j2].T
                gr = ref[:, j:j2] @ ref[:, j:j2].T
                np.testing.assert_allclose(
                    go, gr, atol=5e-3,
                    err_msg=f"graph {i} (n={n}) cluster {j}:{j2}",
                )
            j = j2
        # The test must not silently degenerate to Gram-only comparisons.
        assert isolated >= k // 4, f"graph {i}: only {isolated} isolated cols"


def test_production_subspace_pe_fidelity_vs_arpack():
    # Fidelity floor for the production EVAL/GENERATE path (subspace
    # iteration + Jacobi RR, eval profile → guards=16) against the
    # reference's own ARPACK output at real scale. The train profile
    # runs guardless (0.83 median — docs/PERF.md Session 5 retune);
    # columns inside eigenvalue clusters are skipped (ARPACK itself is
    # rotation-ambiguous there — the A/B in docs/PERF.md covers the
    # downstream effect).
    batch, subs = real_scale_batch()
    prod = np.asarray(
        jax.jit(lambda b: laplacian_positional_embedding(
            b, POS_SIZE, method="subspace", profile="eval"))(batch)
    )
    cosines = []
    lead_cosines = []  # leading 8 columns (dominant structure signal)
    for i, s in enumerate(subs):
        n = s.num_nodes
        k = min(n - 2, POS_SIZE)
        ours = prod[i, :n]
        ref_raw, _ = arpack_reference_pe(s.src, s.dst, n)
        ref = align_reference_to_device(ref_raw, k, ours)
        _, gaps = eigen_gaps_desc(s.src, s.dst, n, k)
        for j in range(k):
            if gaps[j] < GAP_TOL:
                continue
            a, b = ours[:, j], ref[:, j]
            c = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            cosines.append(c)
            if j < 8:
                lead_cosines.append(c)
    cosines = np.asarray(cosines)
    assert len(cosines) > 50
    med = np.median(cosines)
    lead = np.median(lead_cosines)
    # Production (guards=16 + generalized RR) measures 0.989/0.998 here;
    # floors leave slack for backend variation, not for regressions to
    # the round-1 guardless path (0.83/0.98).
    assert med > 0.95, f"median |cos| {med:.3f} over {len(cosines)} cols"
    assert lead > 0.98, f"leading-8 median |cos| {lead:.3f}"


def test_full_featurize_encode_matches_scipy_oracle():
    # FULL-path oracle (VERDICT r1 "missing" 1b): scipy-ARPACK PE + numpy
    # degree-embedding/seed-flag concat + numpy GIN forward, vs the device
    # featurize(method="eigh") + GraphEncoder on the same real-scale
    # subgraphs. Graphs whose top-(k) spectrum has clusters are excluded
    # (PE rotation ambiguity makes entrywise input parity meaningless
    # there; the Gram test above covers those columns).
    from test_gin_encoder import CFG, oracle_forward

    from gcc_tpu.models import GraphEncoder

    _, subs = real_scale_batch()
    chosen = []
    for s in subs:
        k = min(s.num_nodes - 2, POS_SIZE)
        _, gaps = eigen_gaps_desc(s.src, s.dst, s.num_nodes, k)
        if (gaps >= GAP_TOL).all():
            chosen.append(s)
    assert len(chosen) >= 2, "need >=2 cluster-free real-scale subgraphs"
    batch = batch_subgraphs(chosen, n_max=N_MAX, e_max=E_MAX)

    feats = jax.jit(
        lambda b: featurize_batch(b, CFG.positional_embedding_size,
                                  pe_method="eigh")
    )(batch)
    enc = GraphEncoder(CFG)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    out = np.asarray(enc.apply(variables, feats, train=False))

    # numpy-side PE: the scipy oracle aligned to the device layout (column
    # order reversed; per-column sign taken from the device since ARPACK's
    # is random — the DIRECTION is still independently computed).
    dev_pos = np.asarray(feats.pos)
    pos = np.zeros(dev_pos.shape, np.float32)
    for i, s in enumerate(chosen):
        n = s.num_nodes
        k = min(n - 2, POS_SIZE)
        ref_raw, _ = arpack_reference_pe(s.src, s.dst, n)
        pos[i, :n] = align_reference_to_device(ref_raw, k, dev_pos[i, :n])
    feats_np = feats._replace(pos=pos)
    ref_out, _ = oracle_forward(variables, feats_np, CFG, train=False)
    np.testing.assert_allclose(out, ref_out, atol=5e-3)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))
