"""Stochastic regularizers: DropPath, DropBlock2d, Dropout.

Reference: models/layers/drop.py (DropBlock2d :109, DropPath :160).
These are pure functions of (x, rng) — RNG flows through flax's 'dropout'
collection so the whole train step stays jittable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


def drop_path(x, rng, rate: float):
    """Per-sample stochastic depth (reference drop.py:140-157)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(fnn.Module):
    rate: float = 0.0

    @fnn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.rate <= 0.0:
            return x
        return drop_path(x, self.make_rng("dropout"), self.rate)


def drop_block_2d(x, rng, rate: float, block_size: int = 7,
                  gamma_scale: float = 1.0):
    """DropBlock on NHWC (reference drop.py:15-55, the non-'fast' variant):
    seed positions are sampled only where a full block fits, the block mask is
    grown with a max-pool, and the output is renormalized by the kept
    fraction."""
    n, h, w, c = x.shape
    total = h * w
    bs = min(block_size, min(h, w))
    clipped = bs * bs
    valid = (w - bs + 1) * (h - bs + 1)
    gamma = gamma_scale * rate * total / clipped / valid

    hi = jnp.arange(h)[:, None]
    wi = jnp.arange(w)[None, :]
    valid_seed = ((hi >= bs // 2) & (hi < h - (bs - 1) // 2) &
                  (wi >= bs // 2) & (wi < w - (bs - 1) // 2))
    seeds = jax.random.bernoulli(rng, gamma, (n, h, w, c))
    seeds = seeds & valid_seed[None, :, :, None]

    # grow seeds into bs x bs blocks
    blocks = jax.lax.reduce_window(
        seeds.astype(jnp.float32), 0.0, jax.lax.max,
        (1, bs, bs, 1), (1, 1, 1, 1), "SAME")
    keep_mask = 1.0 - blocks
    normalize = (keep_mask.size / jnp.clip(keep_mask.sum(), 1e-7)
                 ).astype(x.dtype)
    return x * keep_mask.astype(x.dtype) * normalize


class DropBlock2d(fnn.Module):
    rate: float = 0.1
    block_size: int = 7
    gamma_scale: float = 1.0

    @fnn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.rate <= 0.0:
            return x
        return drop_block_2d(x, self.make_rng("dropout"), self.rate,
                             self.block_size, self.gamma_scale)


class Dropout(fnn.Module):
    rate: float = 0.0

    @fnn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.rate <= 0.0:
            return x
        return fnn.Dropout(rate=self.rate, deterministic=False)(x)
