"""Set2Set readout (reference uses DGL Set2Set for the non-GIN encoder
paths, graph_encoder.py:124,192-194): an LSTM-driven attention pooling
run for `num_iters` steps, returning [q, Σ softmax(<h, q>) h] of width
2*hidden. Masked softmax keeps padded nodes at zero attention."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Set2Set(nn.Module):
    hidden_dim: int
    num_iters: int = 6
    num_layers: int = 3

    @nn.compact
    def __call__(self, h, node_mask):
        """h: (B, N, F); node_mask: (B, N) → (B, 2F)."""
        b = h.shape[0]
        cells = [nn.LSTMCell(self.hidden_dim, name=f"lstm_{i}")
                 for i in range(self.num_layers)]
        carries = [
            (jnp.zeros((b, self.hidden_dim)), jnp.zeros((b, self.hidden_dim)))
            for _ in cells
        ]
        q_star = jnp.zeros((b, 2 * self.hidden_dim))
        for _ in range(self.num_iters):
            x = q_star
            new_carries = []
            for cell, carry in zip(cells, carries):
                carry, x = cell(carry, x)
                new_carries.append(carry)
            carries = new_carries
            q = x  # (B, F)
            scores = jnp.einsum("bnf,bf->bn", h, q)
            scores = jnp.where(node_mask > 0, scores, -1e30)
            alpha = nn.softmax(scores, axis=-1) * node_mask
            alpha = alpha / jnp.maximum(alpha.sum(-1, keepdims=True), 1e-12)
            r = jnp.einsum("bn,bnf->bf", alpha, h)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
