"""MPNN encoder (reference gcc/models/mpnn.py:13-99: lin0 → repeated
[NNConv edge-conditioned conv → GRU] message passing).

The reference's GraphEncoder passes e_feat=None into NNConv
(graph_encoder.py:181-186), which would crash the torch path if
selected; this implementation substitutes a constant scalar edge
feature so the NNConv edge-network is well-defined — since all edges
share the feature, the per-edge weight matrix is shared and the conv
reduces to A @ (h W_e) with W_e produced by the edge MLP.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gcc_tpu.models.layers import Linear
from gcc_tpu.ops.aggregate import aggregate_sum_dense


class UnsupervisedMPNN(nn.Module):
    node_hidden_dim: int = 64
    edge_hidden_dim: int = 64
    num_step_message_passing: int = 6
    lstm_as_gate: bool = False

    @nn.compact
    def __call__(self, h, adj, node_mask):
        d = self.node_hidden_dim
        out = nn.relu(Linear(d)(h))
        # Edge network on the constant edge feature -> shared (d, d) matrix.
        e = jnp.ones((1, 1))
        w = Linear(self.edge_hidden_dim)(e)
        w = nn.relu(w)
        w = Linear(d * d)(w).reshape(d, d)

        gru = nn.GRUCell(d)
        lstm = nn.LSTMCell(d) if self.lstm_as_gate else None
        b, n, _ = h.shape
        hidden = out.reshape(b * n, d)
        carry = (jnp.zeros_like(hidden), jnp.zeros_like(hidden))
        for _ in range(self.num_step_message_passing):
            m = aggregate_sum_dense((out @ w), adj)
            m = nn.relu(m).reshape(b * n, d)
            if self.lstm_as_gate:
                carry, hidden = lstm(carry, m)
            else:
                hidden, _y = gru(hidden, m)
            out = hidden.reshape(b, n, d)
        return out * node_mask[..., None]
