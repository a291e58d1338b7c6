"""On-device RandomErasing (reference datasets/random_erasing.py:25-97).

Operates on *normalized* float batches (the reference erases after the
PrefetchLoader's GPU normalize).  Modes: 'const' (zeros), 'rand' (one normal
value per channel), 'pixel' (per-pixel normal noise — the recipes' mode).
``count`` erase rectangles are attempted per sample; area/aspect sampled
like the reference (area 2%-33%, log-uniform aspect 0.3..3.33).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


class RandomErasing:
    def __init__(self, probability: float = 0.5, min_area: float = 0.02,
                 max_area: float = 1 / 3, min_aspect: float = 0.3,
                 max_aspect=None, mode: str = "const", count: int = 1,
                 num_splits: int = 0):
        self.probability = probability
        self.min_area, self.max_area = min_area, max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect = (math.log(min_aspect), math.log(max_aspect))
        assert mode in ("const", "rand", "pixel")
        self.mode = mode
        self.count = count
        self.num_splits = num_splits  # first split kept clean (aug-splits)

    def _erase_one(self, rng, img):
        h, w, c = img.shape
        area = float(h * w)

        def one_rect(i, carry):
            img, key = carry
            key, k_en, k_a, k_r, k_y, k_x, k_fill = jax.random.split(key, 7)
            target = jax.random.uniform(k_a, (), minval=self.min_area,
                                        maxval=self.max_area) * area / self.count
            aspect = jnp.exp(jax.random.uniform(
                k_r, (), minval=self.log_aspect[0], maxval=self.log_aspect[1]))
            eh = jnp.clip(jnp.round(jnp.sqrt(target * aspect)), 1, h).astype(jnp.int32)
            ew = jnp.clip(jnp.round(jnp.sqrt(target / aspect)), 1, w).astype(jnp.int32)
            y0 = jax.random.randint(k_y, (), 0, jnp.maximum(h - eh, 1))
            x0 = jax.random.randint(k_x, (), 0, jnp.maximum(w - ew, 1))
            ys = jnp.arange(h)[:, None, None]
            xs = jnp.arange(w)[None, :, None]
            inside = (ys >= y0) & (ys < y0 + eh) & (xs >= x0) & (xs < x0 + ew)
            if self.mode == "pixel":
                fill = jax.random.normal(k_fill, img.shape, img.dtype)
            elif self.mode == "rand":
                fill = jnp.broadcast_to(
                    jax.random.normal(k_fill, (1, 1, c), img.dtype), img.shape)
            else:
                fill = jnp.zeros_like(img)
            enabled = jax.random.bernoulli(k_en, self.probability)
            img = jnp.where(inside & enabled, fill, img)
            return img, key

        out, _ = jax.lax.fori_loop(0, self.count, one_rect, (img, rng))
        return out

    def __call__(self, rng, batch):
        if self.probability <= 0:
            return batch
        n = batch.shape[0]
        keys = jax.random.split(rng, n)
        out = jax.vmap(self._erase_one)(keys, batch)
        if self.num_splits > 1:
            # keep the first aug split clean (random_erasing.py:88-93)
            split = n // self.num_splits
            out = jnp.concatenate([batch[:split], out[split:]], axis=0)
        return out
