"""GCN encoder (reference gcc/models/gcn.py:17-66 — dead code there, the
GraphEncoder never dispatches to it; provided for registry completeness).

Normalized-adjacency convolution D^{-1/2}(A+I)D^{-1/2} h W per layer with
ReLU, masked mean readout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gcc_tpu.models.layers import Linear
from gcc_tpu.ops.aggregate import aggregate_sum_dense, graph_pool_mean


class UnsupervisedGCN(nn.Module):
    node_hidden_dim: int = 64
    num_layers: int = 2
    readout: str = "avg"  # "avg" | "root"
    layernorm: bool = False

    @nn.compact
    def __call__(self, h, adj, node_mask, seed_flag=None):
        n = adj.shape[1]
        eye = jnp.eye(n, dtype=adj.dtype)
        a_hat = adj + eye * node_mask[:, :, None]
        deg = a_hat.sum(axis=2)
        inv = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
        a_norm = a_hat * inv[:, :, None] * inv[:, None, :]
        for i in range(self.num_layers):
            h = Linear(self.node_hidden_dim)(h)
            h = aggregate_sum_dense(h, a_norm)
            h = nn.relu(h)
        if self.readout == "root":
            assert seed_flag is not None
            out = jnp.einsum("bnf,bn->bf", h, seed_flag)
        else:
            out = graph_pool_mean(h, node_mask)
        if self.layernorm:
            out = nn.LayerNorm()(out)
        return out
