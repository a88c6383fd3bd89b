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
