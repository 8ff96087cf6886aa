"""Shared model building blocks (reference ``slowfast/models/common.py``)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Mlp(nn.Module):
    """Two-layer GELU MLP (reference ``common.py:7-35``)."""

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # Dense on rank-2 inputs: XLA-TPU rewrites [B, L, C] dots into 1x1
        # convolutions whose batch-minor layouts force relayout copies
        # around the Pallas custom calls (see ops/mm.py); flattening the
        # leading dims is a free bitcast in the default layout.
        lead = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x.reshape(lead + (self.out_features,))


def drop_path(
    x: jax.Array,
    drop_prob: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    """Per-sample stochastic depth (reference ``common.py:46-59``)."""
    if drop_prob == 0.0 or deterministic:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape).astype(x.dtype)
    return x / keep_prob * mask


class DropPath(nn.Module):
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.drop_prob, rng, deterministic)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, computed in f32 (eps=1e-6 as reference)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        y = y * scale + bias
        return y.astype(orig_dtype)
