"""Functional MoCo negative queue (on-device ring buffer).

The reference's MemoryMoCo (gcc/contrastive/memory_moco.py:7-63) is a
stateful torch buffer; here the queue is an explicit immutable pytree
threaded through the jitted train step, so the entire
forward-contrast-enqueue sequence compiles into one XLA program and the
queue state shards/checkpoints like any other training state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MoCoQueue(NamedTuple):
    memory: jax.Array  # (K, dim) float32 — key embeddings (negatives)
    index: jax.Array   # () int32 — next write position (ring pointer)


def init_queue(key: jax.Array, k: int, dim: int) -> MoCoQueue:
    """U(-stdv, stdv) init with stdv = 1/sqrt(dim/3) (memory_moco.py:20-23)."""
    stdv = 1.0 / jnp.sqrt(dim / 3.0)
    memory = jax.random.uniform(key, (k, dim), jnp.float32, -stdv, stdv)
    return MoCoQueue(memory=memory, index=jnp.zeros((), jnp.int32))


def moco_logits(
    queue: MoCoQueue, q: jax.Array, k: jax.Array, temperature: float
) -> jax.Array:
    """(B, 1+K) logits: positive q·k first, then q·queue (memory_moco.py:33-44).

    k must already be stop-gradiented by the caller (key encoder output).
    """
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)            # (B, 1)
    l_neg = q @ queue.memory.T                                 # (B, K)
    return jnp.concatenate([l_pos, l_neg], axis=1) / temperature


def enqueue(queue: MoCoQueue, k: jax.Array) -> MoCoQueue:
    """Ring-buffer write of the batch's keys at [index, index+B) mod K
    (memory_moco.py:55-61).

    Gather-free: `.at[ids].set` lowers to an XLA scatter that
    serializes row-by-row on TPU (~1.4 ms/step with K = 16384 — as
    expensive as the entire rest of the step, docs/PERF.md). Instead
    the B rows are placed with a one-hot matmul (MXU, exact f32) and
    merged with an arithmetic mask — identical semantics incl. the
    modular wraparound, bit-exact for duplicate-free ids (ids are
    consecutive mod K, so duplicates need B > K, which init forbids)."""
    bsz, dim = k.shape
    kk = queue.memory.shape[0]
    ids = (queue.index + jnp.arange(bsz, dtype=jnp.int32)) % kk
    rows = jnp.arange(kk, dtype=jnp.int32)
    onehot = (ids[:, None] == rows[None, :]).astype(jnp.float32)  # (B, K)
    placed = jax.lax.dot_general(
        onehot, jax.lax.stop_gradient(k),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, dim): row ids[b] holds k[b]
    written = jnp.sum(onehot, axis=0)[:, None]  # (K, 1) 0/1 mask
    memory = queue.memory * (1.0 - written) + placed
    index = ((queue.index + bsz) % kk).astype(jnp.int32)
    return MoCoQueue(memory=memory, index=index)
