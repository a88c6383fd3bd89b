"""Graph attention encoder (reference gcc/models/gat.py:15-41: DGL-chem
GATLayer × num_layers, 4 heads flattened, leaky-relu between layers,
no dropout, no residual, negative slope 0.2).

Attention runs densely over the batched adjacency: scores are computed
for all node pairs on the MXU and masked to existing edges — the
TPU-native shape for RWR-bounded subgraphs (an edge-list softmax is the
Pallas path for the giant-graph mode).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gcc_tpu.models.layers import Linear


class GATLayer(nn.Module):
    out_per_head: int
    num_heads: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, h, adj, node_mask):
        """h: (B, N, F); adj: (B, N, N) with A[v, u] > 0 iff edge u→v."""
        b, n, _ = h.shape
        z = Linear(self.num_heads * self.out_per_head, use_bias=False)(h)
        z = z.reshape(b, n, self.num_heads, self.out_per_head)
        # a^T [z_i || z_j] = a_l . z_i + a_r . z_j
        a_l = self.param("attn_l", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
            (self.num_heads, self.out_per_head), jnp.float32)
        a_r = self.param("attn_r", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
            (self.num_heads, self.out_per_head), jnp.float32)
        el = jnp.einsum("bnhf,hf->bnh", z, a_l)  # destination term
        er = jnp.einsum("bnhf,hf->bnh", z, a_r)  # source term
        # scores[b, h, v, u] for edge u→v.
        scores = el.transpose(0, 2, 1)[:, :, :, None] + \
            er.transpose(0, 2, 1)[:, :, None, :]
        scores = nn.leaky_relu(scores, self.negative_slope)
        mask = (adj > 0)[:, None, :, :]
        # Edge-wise softmax semantics on a multigraph: t parallel edges
        # contribute t identical exp terms, i.e. the dense form adds
        # log(multiplicity) to the score (adj holds multiplicities).
        log_mult = jnp.where(adj > 0, jnp.log(jnp.maximum(adj, 1e-12)), 0.0)
        scores = scores + log_mult[:, None, :, :]
        scores = jnp.where(mask, scores, -1e30)
        alpha = nn.softmax(scores, axis=-1)
        alpha = jnp.where(mask, alpha, 0.0)
        out = jnp.einsum("bhvu,buhf->bvhf", alpha, z)
        out = out.reshape(b, n, self.num_heads * self.out_per_head)
        return out * node_mask[..., None]


class UnsupervisedGAT(nn.Module):
    node_hidden_dim: int = 64
    num_layers: int = 5
    num_heads: int = 4

    @nn.compact
    def __call__(self, h, adj, node_mask):
        assert self.node_hidden_dim % self.num_heads == 0
        for i in range(self.num_layers):
            h = GATLayer(self.node_hidden_dim // self.num_heads,
                         self.num_heads)(h, adj, node_mask)
            if i + 1 < self.num_layers:
                h = nn.leaky_relu(h, 0.2)
        return h
