"""GraphEncoder facade: featurizer + GNN dispatch + output norm.

Mirrors reference gcc/models/graph_encoder.py:19-200 (degree_input=True
configuration, which is what training always uses — train.py:620):
node features = concat(positional embedding, degree embedding of
clamp(deg, 0, max_degree), seed one-hot) → 49-d input, encoder dispatch
(gin default; gat/mpnn/gcn alternates), then optional L2 normalization
of the graph embedding.

Takes device-side :class:`~gcc_tpu.features.featurize.BatchFeatures`
(derived on device from the padded batch) rather than a graph object —
the encoder is a pure function of arrays and jit-compiles into the
training step.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gcc_tpu.config import EncoderConfig
from gcc_tpu.features.featurize import BatchFeatures
from gcc_tpu.models.layers import DegreeEmbedding
from gcc_tpu.models.gin import UnsupervisedGIN


class GraphEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        feats: BatchFeatures,
        train: bool = True,
        return_all_outputs: bool = False,
    ):
        cfg = self.cfg
        parts = [feats.pos]
        if cfg.degree_input:
            deg_emb = DegreeEmbedding(cfg.max_degree, cfg.degree_embedding_size)(
                feats.degrees
            )
            parts.append(deg_emb)
        parts.append(feats.seed_flag[..., None])
        n_feat = jnp.concatenate(parts, axis=-1)
        # Padded nodes must contribute zero everywhere downstream that
        # sums over nodes; degree embedding rows for padding are nonzero
        # (degree 0 embedding), so mask the input features.
        n_feat = n_feat * feats.node_mask[..., None]

        if cfg.model == "gin":
            x, all_outputs = UnsupervisedGIN(
                num_layers=cfg.num_layers,
                hidden_dim=cfg.hidden_size,
                output_dim=cfg.output_size,
                final_dropout=cfg.final_dropout,
                use_selayer=cfg.use_selayer,
            )(n_feat, feats.adj, feats.node_mask, train=train)
        elif cfg.model == "gat":
            from gcc_tpu.models.gat import UnsupervisedGAT
            from gcc_tpu.models.set2set import Set2Set
            from gcc_tpu.models.layers import Linear

            h = UnsupervisedGAT(
                node_hidden_dim=cfg.hidden_size,
                num_layers=cfg.num_layers,
                num_heads=cfg.num_heads,
            )(n_feat, feats.adj, feats.node_mask)
            x = Set2Set(cfg.hidden_size, cfg.set2set_iter,
                        cfg.set2set_lstm_layer)(h, feats.node_mask)
            x = Linear(cfg.hidden_size)(x)
            x = nn.relu(x)
            x = Linear(cfg.output_size)(x)
            all_outputs = None
        elif cfg.model == "mpnn":
            from gcc_tpu.models.mpnn import UnsupervisedMPNN
            from gcc_tpu.models.set2set import Set2Set
            from gcc_tpu.models.layers import Linear

            h = UnsupervisedMPNN(
                node_hidden_dim=cfg.hidden_size,
                num_step_message_passing=cfg.num_layers,
            )(n_feat, feats.adj, feats.node_mask)
            x = Set2Set(cfg.hidden_size, cfg.set2set_iter,
                        cfg.set2set_lstm_layer)(h, feats.node_mask)
            x = Linear(cfg.hidden_size)(x)
            x = nn.relu(x)
            x = Linear(cfg.output_size)(x)
            all_outputs = None
        else:
            raise ValueError(f"unknown gnn model: {cfg.model}")

        if cfg.norm:
            # F.normalize(x, p=2, dim=-1, eps=1e-5) parity
            # (graph_encoder.py:195-196).
            norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
            x = x / jnp.maximum(norm, 1e-5)
        if return_all_outputs:
            return x, all_outputs
        return x
