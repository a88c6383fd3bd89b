"""InfoNCE losses (reference gcc/contrastive/criterions.py:5-33)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nce_softmax_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy. MoCo uses labels == 0 (positive in
    column 0); E2E uses diagonal labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def e2e_logits(
    feat_q: jax.Array, feat_k: jax.Array, temperature: float
) -> jax.Array:
    """In-batch negatives: (B, B) logits feat_k @ feat_qᵀ / T with
    positives on the diagonal (reference train.py:396-401)."""
    return (feat_k @ feat_q.T) / temperature
