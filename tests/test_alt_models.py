"""Alternate encoder tests (GAT / MPNN / Set2Set paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcc_tpu.config import EncoderConfig
from gcc_tpu.features import featurize_batch
from gcc_tpu.models import GraphEncoder
from tests.test_gin_encoder import make_batch


@pytest.mark.parametrize("model", ["gat", "mpnn"])
def test_alt_encoder_forward(model):
    cfg = EncoderConfig(model=model, hidden_size=16, output_size=16,
                        positional_embedding_size=8,
                        degree_embedding_size=4, num_layers=3,
                        set2set_iter=2, set2set_lstm_layer=1,
                        pe_method="eigh")
    batch = make_batch()
    feats = featurize_batch(batch, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    out = enc.apply(variables, feats, train=False)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-4)


def test_gat_attention_respects_mask():
    # A padded node must receive zero output and contribute no attention.
    from gcc_tpu.models.gat import GATLayer
    from gcc_tpu.ops.aggregate import build_dense_adjacency

    batch = make_batch(num_graphs=2, n=6)
    adj = build_dense_adjacency(batch)
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 8)).astype(np.float32))
    layer = GATLayer(out_per_head=4, num_heads=2)
    variables = layer.init(jax.random.PRNGKey(0), h, adj, batch.node_mask)
    out = np.asarray(layer.apply(variables, h, adj, batch.node_mask))
    nm = np.asarray(batch.node_mask)
    assert np.abs(out[nm == 0]).max() == 0


def test_set2set_masked():
    from gcc_tpu.models.set2set import Set2Set

    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 5, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]],
                                np.float32))
    m = Set2Set(4, num_iters=2, num_layers=1)
    variables = m.init(jax.random.PRNGKey(0), h, mask)
    out = m.apply(variables, h, mask)
    assert out.shape == (2, 8)
    # Changing a masked node's features must not change the output.
    h2 = h.at[0, 4].set(100.0)
    out2 = m.apply(variables, h2, mask)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out2)[0],
                               atol=1e-5)


def test_gat_multiplicity_sensitivity():
    # t parallel edges must contribute like t softmax terms, not 1.
    from gcc_tpu.models.gat import GATLayer
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.ops.aggregate import build_dense_adjacency

    # Graph A: node0 <- node1 (x1), node0 <- node2 (x1)
    # Graph B: node0 <- node1 (x3), node0 <- node2 (x1)
    a = Subgraph(src=np.array([1, 2], np.int32),
                 dst=np.array([0, 0], np.int32), num_nodes=3)
    b = Subgraph(src=np.array([1, 1, 1, 2], np.int32),
                 dst=np.array([0, 0, 0, 0], np.int32), num_nodes=3)
    batch = batch_subgraphs([a, b], n_max=4, e_max=8)
    adj = build_dense_adjacency(batch)
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, 6)).astype(np.float32))
    layer = GATLayer(out_per_head=3, num_heads=2)
    variables = layer.init(jax.random.PRNGKey(0), h, adj, batch.node_mask)
    out = np.asarray(layer.apply(variables, h, adj, batch.node_mask))
    # Same features, different multiplicities -> different attention mix.
    assert not np.allclose(out[0, 0], out[1, 0], atol=1e-6)


# ---------------------------------------------------------------------------
# Numerical oracles (VERDICT r1 item 5): numpy re-implementations of the
# alternate encoders' math, driven off the extracted flax params —
# same bar as tests/test_gin_encoder.py::test_gin_matches_numpy_oracle.
# ---------------------------------------------------------------------------


def _dense_adj_from_edges(edges, n):
    """A[v, u] = multiplicity of edge u→v (the GATLayer/aggregate
    orientation, ops/aggregate.py build_dense_adjacency)."""
    adj = np.zeros((n, n), np.float32)
    for u, v in edges:
        adj[v, u] += 1.0
    return adj


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_gat_matches_edge_list_softmax_oracle():
    """Edge-LIST per-destination softmax with multi-edge multiplicity:
    the reference's DGL edge_softmax (gcc/models/gat.py:23-35) sums one
    exp term PER PARALLEL EDGE; the dense layer folds that into a
    log(multiplicity) score shift (models/gat.py:44-48). The oracle
    iterates the raw multi-edge list."""
    rng = np.random.default_rng(0)
    n, f, heads, fo = 5, 6, 2, 3
    # Multigraph: triple edge 0→1, double 1→0, a self-loop, isolated-ish 4.
    edges = [(0, 1), (0, 1), (0, 1), (2, 1), (3, 1), (1, 0), (1, 0),
             (4, 2), (2, 4), (3, 3), (0, 4), (4, 0)]
    adj_np = _dense_adj_from_edges(edges, n)
    h_np = rng.normal(size=(1, n, f)).astype(np.float32)
    mask = np.ones((1, n), np.float32)

    from gcc_tpu.models.gat import GATLayer

    layer = GATLayer(out_per_head=fo, num_heads=heads)
    variables = layer.init(jax.random.PRNGKey(1), jnp.asarray(h_np),
                           jnp.asarray(adj_np[None]), jnp.asarray(mask))
    out = np.asarray(layer.apply(
        variables, jnp.asarray(h_np), jnp.asarray(adj_np[None]),
        jnp.asarray(mask)))[0]

    p = variables["params"]
    w_z = np.asarray(p["Linear_0"]["kernel"])          # (f, heads*fo)
    a_l = np.asarray(p["attn_l"])                      # (heads, fo)
    a_r = np.asarray(p["attn_r"])
    z = (h_np[0] @ w_z).reshape(n, heads, fo)
    el = np.einsum("nhf,hf->nh", z, a_l)               # destination term
    er = np.einsum("nhf,hf->nh", z, a_r)               # source term

    def leaky(x):
        return np.where(x >= 0, x, 0.2 * x)

    ref = np.zeros((n, heads, fo), np.float32)
    for hd in range(heads):
        for v in range(n):
            incoming = [u for (u, v2) in edges if v2 == v]
            if not incoming:
                continue
            scores = np.array([leaky(el[v, hd] + er[u, hd])
                               for u in incoming])
            wts = np.exp(scores - scores.max())
            wts = wts / wts.sum()
            for wt, u in zip(wts, incoming):
                ref[v, hd] += wt * z[u, hd]
    np.testing.assert_allclose(out, ref.reshape(n, heads * fo),
                               rtol=2e-4, atol=2e-5)


def test_mpnn_matches_numpy_gru_oracle():
    """GRU message-passing recurrence (reference gcc/models/mpnn.py:57-99:
    lin0 → [NNConv → GRU] × T with the shared edge-MLP weight matrix)."""
    from gcc_tpu.models.mpnn import UnsupervisedMPNN

    rng = np.random.default_rng(1)
    n, d, fin, t_steps = 4, 6, 5, 3
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 0), (0, 3), (2, 2)]
    adj_np = _dense_adj_from_edges(edges, n)
    h_np = rng.normal(size=(1, n, fin)).astype(np.float32)
    mask = np.ones((1, n), np.float32)

    m = UnsupervisedMPNN(node_hidden_dim=d, edge_hidden_dim=d,
                         num_step_message_passing=t_steps)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(h_np),
                       jnp.asarray(adj_np[None]), jnp.asarray(mask))
    out = np.asarray(m.apply(
        variables, jnp.asarray(h_np), jnp.asarray(adj_np[None]),
        jnp.asarray(mask)))[0]

    p = variables["params"]

    def lin(name, x):
        y = x @ np.asarray(p[name]["kernel"])
        return y + np.asarray(p[name]["bias"])

    relu = lambda x: np.maximum(x, 0.0)
    cur = relu(lin("Linear_0", h_np[0]))               # lin0
    w_e = relu(lin("Linear_1", np.ones((1, 1), np.float32)))
    w_e = lin("Linear_2", w_e).reshape(d, d)           # shared edge matrix
    g = p["GRUCell_0"]
    k = lambda nm: np.asarray(g[nm]["kernel"])
    bb = lambda nm: np.asarray(g[nm]["bias"])
    hidden = cur.copy()
    for _ in range(t_steps):
        x = relu(adj_np @ (cur @ w_e))                 # NNConv sum-agg
        r = _sig(x @ k("ir") + bb("ir") + hidden @ k("hr"))
        zz = _sig(x @ k("iz") + bb("iz") + hidden @ k("hz"))
        nn_ = np.tanh(x @ k("in") + bb("in")
                      + r * (hidden @ k("hn") + bb("hn")))
        hidden = (1.0 - zz) * nn_ + zz * hidden        # flax GRUCell
        cur = hidden
    np.testing.assert_allclose(out, cur, rtol=2e-4, atol=2e-5)


def test_set2set_matches_numpy_lstm_oracle():
    """LSTM-attention readout (DGL Set2Set semantics, 2 stacked cells,
    3 iterations, masked attention softmax)."""
    from gcc_tpu.models.set2set import Set2Set

    rng = np.random.default_rng(3)
    b, n, f = 2, 4, 3
    h_np = rng.normal(size=(b, n, f)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0], [1, 1, 1, 1]], np.float32)
    m = Set2Set(f, num_iters=3, num_layers=2)
    variables = m.init(jax.random.PRNGKey(4), jnp.asarray(h_np),
                       jnp.asarray(mask))
    out = np.asarray(m.apply(variables, jnp.asarray(h_np),
                             jnp.asarray(mask)))

    p = variables["params"]

    def lstm_step(cell, carry, x):
        c, hh = carry                                   # flax carry = (c, h)
        k = lambda nm: np.asarray(cell[nm]["kernel"])
        bb = lambda nm: np.asarray(cell[nm]["bias"])
        i = _sig(x @ k("ii") + hh @ k("hi") + bb("hi"))
        fgate = _sig(x @ k("if") + hh @ k("hf") + bb("hf"))
        gg = np.tanh(x @ k("ig") + hh @ k("hg") + bb("hg"))
        o = _sig(x @ k("io") + hh @ k("ho") + bb("ho"))
        new_c = fgate * c + i * gg
        new_h = o * np.tanh(new_c)
        return (new_c, new_h), new_h

    carries = [(np.zeros((b, f), np.float32), np.zeros((b, f), np.float32))
               for _ in range(2)]
    q_star = np.zeros((b, 2 * f), np.float32)
    for _ in range(3):
        x = q_star
        for li in range(2):
            carries[li], x = lstm_step(p[f"lstm_{li}"], carries[li], x)
        q = x
        scores = np.einsum("bnf,bf->bn", h_np, q)
        scores = np.where(mask > 0, scores, -np.inf)
        alpha = np.exp(scores - scores.max(-1, keepdims=True))
        alpha = np.where(mask > 0, alpha, 0.0)
        alpha = alpha / alpha.sum(-1, keepdims=True)
        r = np.einsum("bn,bnf->bf", alpha, h_np)
        q_star = np.concatenate([q, r], axis=-1)
    np.testing.assert_allclose(out, q_star, rtol=2e-4, atol=2e-5)
