"""Graph Isomorphism Network encoder (the reference's default model).

Semantics mirrored from reference gcc/models/gin.py:119-232 with
learn_eps=False, sum aggregation, sum graph pooling, 2-layer MLPs:

per conv layer i (num_layers-1 of them):
    agg = h + Σ_{u∈N(v)} h_u                    (GINConv, ε=0)
    z   = ReLU(BN_mlp(Linear_1(agg)))           (MLP hidden)
    z   = Linear_2(z)                           (MLP out)
    z   = ReLU(BN_apply(z))                     (ApplyNodeFunc)
    h   = ReLU(BN_outer(z))                     (UnsupervisedGIN loop)

readout: for every hidden_rep [input, h_1, .., h_{L-1}]:
    score += Dropout(Linear_pred_i(sum_pool_i))
returns (score, per-layer pooled activations of [input, h_1..h_{L-1}]) —
entries [1:] are the reference's `all_outputs[1:]`, the allclose parity
target named in SURVEY.md §7; entry [0] (the pooled INPUT features,
a superset of what the reference returns) is exposed for graph-level
readout composition (docs/PERF.md "graph benchmark": the pooled degree
-embedding row is the trained analog of a degree histogram).

Aggregation runs on the dense per-batch adjacency (one batched matmul on
the MXU per layer) — see gcc_tpu/ops/aggregate.py for why this is the
TPU-native choice for RWR-bounded subgraphs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gcc_tpu.models.layers import Linear, MaskedBatchNorm
from gcc_tpu.ops.aggregate import aggregate_sum_dense, graph_pool_sum


class SELayer(nn.Module):
    """Squeeze-and-excitation reweighting — the reference's optional
    BatchNorm substitute (gin.py:16-39, enabled by use_selayer; the
    global mean runs over real nodes only)."""

    channels: int

    @nn.compact
    def __call__(self, x, mask, use_running_average=False):
        se = max(1, int(self.channels ** 0.5))
        m = mask[..., None]
        count = jnp.maximum(mask.sum(), 1.0)
        x_global = (x * m).sum(axis=tuple(range(x.ndim - 1))) / count
        s = Linear(se)(x_global)
        s = nn.elu(s)
        s = Linear(self.channels)(s)
        s = nn.sigmoid(s)
        return x * s


class GINMLP(nn.Module):
    """2-layer MLP with BN+ReLU on the hidden layer (reference MLP class)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    use_selayer: bool = False

    @nn.compact
    def __call__(self, x, mask, use_running_average):
        if self.num_layers == 1:
            return Linear(self.output_dim)(x)
        h = x
        for _ in range(self.num_layers - 1):
            h = Linear(self.hidden_dim)(h)
            if self.use_selayer:
                h = SELayer(self.hidden_dim)(h, mask)
            else:
                h = MaskedBatchNorm()(h, mask, use_running_average)
            h = nn.relu(h)
        return Linear(self.output_dim)(h)


class UnsupervisedGIN(nn.Module):
    num_layers: int = 5
    num_mlp_layers: int = 2
    hidden_dim: int = 64
    output_dim: int = 64
    final_dropout: float = 0.5
    use_selayer: bool = False

    @nn.compact
    def __call__(self, h, adj, node_mask, train: bool = True):
        """h: (B, N, F_in); adj: (B, N, N); node_mask: (B, N).

        Returns (score: (B, output_dim), pooled: list of num_layers
        arrays — entry 0 is (B, F_in) pooled input, the rest
        (B, hidden_dim) pooled conv activations).
        """
        ura = not train  # use running averages in eval mode

        def norm(z):
            if self.use_selayer:
                return SELayer(self.hidden_dim)(z, node_mask)
            return MaskedBatchNorm()(z, node_mask, ura)

        hidden_rep = [h]
        for _ in range(self.num_layers - 1):
            agg = h + aggregate_sum_dense(h, adj)
            z = GINMLP(self.hidden_dim, self.hidden_dim, self.num_mlp_layers,
                       self.use_selayer)(agg, node_mask, ura)
            z = norm(z)  # ApplyNodeFunc norm
            z = nn.relu(z)
            z = norm(z)  # outer loop norm
            h = nn.relu(z)
            hidden_rep.append(h)

        score = 0.0
        pooled_all = []
        for i, rep in enumerate(hidden_rep):
            pooled = graph_pool_sum(rep, node_mask)
            pooled_all.append(pooled)
            out = Linear(self.output_dim)(pooled)
            out = nn.Dropout(self.final_dropout, deterministic=not train)(out)
            score = score + out
        return score, pooled_all
