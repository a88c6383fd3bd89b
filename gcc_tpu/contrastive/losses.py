"""InfoNCE losses (reference gcc/contrastive/criterions.py:5-33)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nce_softmax_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy. MoCo uses labels == 0 (positive in
    column 0); E2E uses diagonal labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def legacy_nce_probs(
    logits: jax.Array, n_data: int, z: float | jax.Array = -1.0
) -> tuple[jax.Array, jax.Array]:
    """The reference's legacy non-softmax NCE normalization
    (memory_moco.py:45-52): out = exp(logits_raw / T) / Z, where
    ``logits`` are the already-temperature-scaled (B, 1+K) MoCo logits
    (moco_logits output), ``n_data`` is the dataset size (the reference's
    MemoryMoCo outputSize, train.py:628), and z < 0 means "estimate now"
    as Z = mean(exp) * n_data (the reference sets it once, from the first
    batch, and freezes it).

    Returns (probs, z_used). Dead code at reference defaults (use_softmax
    is hardcoded True at train.py:628) but selectable here:
    ContrastConfig(use_softmax=False) wires this into the MoCo train step
    (training/pretrain.py moco_loss_and_prob), carrying z_used in
    PretrainState.nce_z so Z freezes after the first batch exactly like
    the reference's buffered scalar. Note the reference then feeds these
    PROBABILITIES to CrossEntropyLoss as if they were logits
    (criterions.py NCESoftmaxLoss) — reproduced faithfully by composing
    with nce_softmax_loss.
    """
    out = jnp.exp(logits)  # logits already divided by T upstream
    z = jnp.asarray(z, jnp.float32)
    # The reference's Z is a detached python float (memory_moco.py:48-49)
    # — no gradient flows through the first-batch estimate.
    z_used = jax.lax.stop_gradient(
        jnp.where(z < 0, out.mean() * n_data, z))
    return out / z_used, z_used


def e2e_logits(
    feat_q: jax.Array, feat_k: jax.Array, temperature: float
) -> jax.Array:
    """In-batch negatives: (B, B) logits feat_k @ feat_qᵀ / T with
    positives on the diagonal (reference train.py:396-401)."""
    return (feat_k @ feat_q.T) / temperature
