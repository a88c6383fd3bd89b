"""GraphEncoder/GIN tests, including a full numpy golden-parity oracle.

The numpy oracle re-implements the reference GIN forward semantics
(gcc/models/gin.py:213-232 + graph_encoder.py:132-200) independently
from the flax modules, and the test asserts allclose on the final
embedding and every per-layer pooled activation — the parity target
named in SURVEY.md §7 item 4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcc_tpu.config import EncoderConfig
from gcc_tpu.features import featurize_batch
from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
from gcc_tpu.models import GraphEncoder


def make_batch(num_graphs=3, n=10, seed=0, n_max=16, e_max=256):
    rng = np.random.default_rng(seed)
    subs = []
    for _ in range(num_graphs):
        src = rng.integers(0, n, 3 * n)
        dst = rng.integers(0, n, 3 * n)
        keep = src != dst
        s = np.concatenate([src[keep], dst[keep]]).astype(np.int32)
        d = np.concatenate([dst[keep], src[keep]]).astype(np.int32)
        subs.append(Subgraph(src=s, dst=d, num_nodes=n))
    return batch_subgraphs(subs, n_max=n_max, e_max=e_max)


CFG = EncoderConfig(final_dropout=0.0)  # deterministic for parity


def init_encoder(batch, cfg=CFG, train=True):
    feats = featurize_batch(batch, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    return enc, variables, feats


# --- numpy oracle ------------------------------------------------------------


def np_masked_bn(x, mask, p, train, eps=1e-5):
    if train:
        m = mask[..., None]
        count = max(mask.sum(), 1.0)
        mean = (x * m).reshape(-1, x.shape[-1]).sum(0) / count
        diff = (x - mean) * m
        var = (diff * diff).reshape(-1, x.shape[-1]).sum(0) / count
    else:
        mean, var = p["stats"]["mean"], p["stats"]["var"]
    y = (x - mean) / np.sqrt(var + eps)
    return y * p["params"]["scale"] + p["params"]["offset"]


def np_linear(x, p):
    return x @ p["kernel"] + p["bias"]


def oracle_forward(variables, feats, cfg, train):
    params = variables["params"]
    stats = variables["batch_stats"]
    pos = np.asarray(feats.pos)
    deg = np.asarray(feats.degrees)
    seedf = np.asarray(feats.seed_flag)
    mask = np.asarray(feats.node_mask)
    adj = np.asarray(feats.adj)

    table = np.asarray(params["DegreeEmbedding_0"]["embedding"])
    demb = table[np.clip(deg, 0, cfg.max_degree)]
    h = np.concatenate([pos, demb, seedf[..., None]], axis=-1)
    h = h * mask[..., None]

    gin_p = params["UnsupervisedGIN_0"]
    gin_s = stats["UnsupervisedGIN_0"]
    hidden_rep = [h]
    for layer in range(cfg.num_layers - 1):
        agg = h + np.einsum("bvu,buf->bvf", adj, h)
        mlp_p = gin_p[f"GINMLP_{layer}"]
        mlp_s = gin_s[f"GINMLP_{layer}"]
        z = np_linear(agg, mlp_p["Linear_0"])
        z = np_masked_bn(
            z, mask,
            {"params": mlp_p["MaskedBatchNorm_0"],
             "stats": mlp_s["MaskedBatchNorm_0"]},
            train,
        )
        z = np.maximum(z, 0)
        z = np_linear(z, mlp_p["Linear_1"])
        z = np_masked_bn(
            z, mask,
            {"params": gin_p[f"MaskedBatchNorm_{2 * layer}"],
             "stats": gin_s[f"MaskedBatchNorm_{2 * layer}"]},
            train,
        )
        z = np.maximum(z, 0)
        z = np_masked_bn(
            z, mask,
            {"params": gin_p[f"MaskedBatchNorm_{2 * layer + 1}"],
             "stats": gin_s[f"MaskedBatchNorm_{2 * layer + 1}"]},
            train,
        )
        h = np.maximum(z, 0)
        hidden_rep.append(h)

    score = 0.0
    pooled_all = []
    for i, rep in enumerate(hidden_rep):
        pooled = np.einsum("bnf,bn->bf", rep, mask)
        pooled_all.append(pooled)
        score = score + np_linear(pooled, gin_p[f"Linear_{i}"])

    norm = np.linalg.norm(score, axis=-1, keepdims=True)
    out = score / np.maximum(norm, 1e-5)
    return out, pooled_all


@pytest.mark.parametrize("train", [False, True])
def test_gin_matches_numpy_oracle(train):
    batch = make_batch()
    enc, variables, feats = init_encoder(batch)
    if train:
        (out, pooled), _ = enc.apply(
            variables, feats, train=True, return_all_outputs=True,
            mutable=["batch_stats"],
        )
    else:
        out, pooled = enc.apply(
            variables, feats, train=False, return_all_outputs=True
        )
    ref_out, ref_pooled = oracle_forward(variables, feats, CFG, train)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)
    assert len(pooled) == 5
    for a, b in zip(pooled, ref_pooled):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-3)


def test_output_shape_and_norm():
    batch = make_batch()
    enc, variables, feats = init_encoder(batch)
    out = enc.apply(variables, feats, train=False)
    assert out.shape == (3, CFG.output_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-4
    )


def test_padding_invariance():
    # The same graphs padded into a bigger bucket must produce identical
    # embeddings — the core static-shape correctness property.
    rng = np.random.default_rng(1)
    subs = []
    for _ in range(2):
        n = 8
        src = rng.integers(0, n, 20)
        dst = rng.integers(0, n, 20)
        keep = src != dst
        s = np.concatenate([src[keep], dst[keep]]).astype(np.int32)
        d = np.concatenate([dst[keep], src[keep]]).astype(np.int32)
        subs.append(Subgraph(src=s, dst=d, num_nodes=n))
    small = batch_subgraphs(subs, n_max=16, e_max=64)
    big = batch_subgraphs(subs, n_max=32, e_max=256)

    cfg = CFG
    feats_s = featurize_batch(small, cfg.positional_embedding_size)
    feats_b = featurize_batch(big, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats_s, train=False)
    out_s = enc.apply(variables, feats_s, train=False)
    out_b = enc.apply(variables, feats_b, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_b), atol=1e-4
    )


def test_batch_stats_update_in_train_mode():
    batch = make_batch()
    enc, variables, feats = init_encoder(batch)
    _, mutated = enc.apply(
        variables, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_dropout_active_in_train_mode():
    cfg = EncoderConfig(final_dropout=0.5)
    batch = make_batch()
    feats = featurize_batch(batch, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    o1, _ = enc.apply(
        variables, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    o2, _ = enc.apply(
        variables, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_selayer_variant_forward():
    cfg = EncoderConfig(hidden_size=16, output_size=16,
                        positional_embedding_size=8,
                        degree_embedding_size=4, use_selayer=True,
                        final_dropout=0.0, pe_method="eigh")
    batch = make_batch()
    feats = featurize_batch(batch, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    # SE variant has no batch_stats collection at all.
    assert "batch_stats" not in variables or not variables["batch_stats"]
    out = enc.apply(variables, feats, train=False)
    assert np.isfinite(np.asarray(out)).all()
