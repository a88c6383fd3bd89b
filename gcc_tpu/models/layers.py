"""Shared model building blocks: torch-compatible inits and masked BatchNorm.

The reference's training dynamics depend on torch layer defaults
(kaiming-uniform linear init, N(0,1) embeddings, BatchNorm1d over the
flat node axis). We reproduce the *statistics* of those defaults so the
rebuilt model trains in the same regime, and implement BatchNorm with
explicit node masking — padded nodes must not pollute batch statistics,
a hazard the reference's dynamic-shape batching never had.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance 1/(3 fan_in); bias U(±1/sqrt(fan_in)).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def linear_apply(p, x):
    """Apply a Linear param subtree {kernel[, bias]} functionally.

    The single shared implementation of the affine map for BOTH the Flax
    module below and params-compatible out-of-module paths (the
    giant-graph encoder, parallel/giant.py) — so the math cannot
    diverge between them."""
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def bn_eval_apply(p, stats, x, eps: float = 1e-5):
    """Eval-mode MaskedBatchNorm from a param/stats subtree.

    Shared by MaskedBatchNorm's use_running_average branch and the
    giant-graph encoder (parallel/giant.py) — one implementation of the
    normalization math for every params-compatible consumer."""
    y = (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + eps)
    return y * p["scale"] + p["offset"]


def torch_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Linear(nn.Module):
    """nn.Dense with torch-default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan_in, self.features), jnp.float32
        )
        p = {"kernel": kernel}
        if self.use_bias:
            p["bias"] = self.param(
                "bias",
                lambda k, s, d: torch_bias_init(k, s, d, fan_in),
                (self.features,),
                jnp.float32,
            )
        return linear_apply(p, x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the flat node axis with padding masked out.

    Matches torch semantics: biased variance for normalization, running
    stats updated as (1-m)*running + m*batch with m=0.1, learnable
    scale/offset. `use_running_average=False` normalizes by batch stats
    and updates the "batch_stats" collection (torch train mode);
    True uses the stored running stats (torch eval mode).

    Input: (..., N, F) with mask (..., N) of 1.0/0.0.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        f = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        offset = self.param("offset", nn.initializers.zeros, (f,), jnp.float32)

        if use_running_average:
            return bn_eval_apply(
                {"scale": scale, "offset": offset},
                {"mean": ra_mean.value, "var": ra_var.value},
                x, eps=self.epsilon,
            )
        else:
            m = mask[..., None]
            count = jnp.maximum(mask.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / count
            diff = (x - mean) * m
            var = (diff * diff).sum(axis=tuple(range(x.ndim - 1))) / count
            if not self.is_initializing():
                # Unbiased variance for the running buffer (torch parity).
                unbias = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * var * unbias
                )

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + offset


class DegreeEmbedding(nn.Module):
    """Degree-bucket embedding, torch nn.Embedding N(0,1) init, with the
    reference's clamp(deg, 0, max_degree) (graph_encoder.py:158-161)."""

    max_degree: int
    features: int

    @nn.compact
    def __call__(self, degrees):
        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.max_degree + 1, self.features),
            jnp.float32,
        )
        idx = jnp.clip(degrees, 0, self.max_degree)
        # One-hot matmul instead of jnp.take: the gather (and its
        # scatter-add VJP into the (max_degree+1, F) table) serializes
        # on TPU — together ~0.08 ms/step at the canonical config
        # (docs/PERF.md trace: layers.py gather + scatter-add fusions).
        # The one-hot contraction runs on the MXU in both directions;
        # exact (0/1 in f32, f32 accumulation).
        flat = idx.reshape(-1)
        onehot = (
            flat[:, None] == jnp.arange(table.shape[0], dtype=flat.dtype)
        ).astype(table.dtype)
        out = jax.lax.dot_general(
            onehot, table, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(idx.shape + (self.features,))
