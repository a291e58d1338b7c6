"""Mixup / CutMix with soft-label generation (reference datasets/mixup.py).

TPU-first: runs *inside the jitted train step* as a pure function of
(rng, batch) — the reference's collate-time uint8 variant
(FastCollateMixup, mixup.py:223-318) exists to hide CPU cost; on TPU the
whole batch op is a few fused elementwise kernels.

Supported modes: 'batch' (one lambda for the whole batch), 'pair'
(per-sample lambda, mixing with the flipped batch), 'elem' (per-sample).
Matches the reference semantics: mixup OR cutmix per draw via switch_prob,
lam from Beta(alpha, alpha), cutmix bbox per rand_bbox (mixup.py:30-55), and
soft targets = lam * y + (1-lam) * y_flipped with label smoothing
(mixup_target, mixup.py:17-28).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels, num_classes, smoothing=0.0, dtype=jnp.float32):
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes, dtype=dtype) * (on - off) + off


def _rand_bbox(rng, h, w, lam, shape):
    """Cut bbox of area ratio (1-lam), clipped at borders (mixup.py:30-55).
    Returns (yl, yh, xl, xh) arrays of `shape`."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, shape, 0, h)
    cx = jax.random.randint(kx, shape, 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


class Mixup:
    """Callable (rng, images NHWC, int labels) -> (mixed images, soft targets).

    Args mirror the reference Mixup (mixup.py:90-121): mixup_alpha,
    cutmix_alpha, cutmix_minmax (optional override), prob, switch_prob,
    mode, correct_lam, label_smoothing, num_classes.
    """

    def __init__(self, mixup_alpha=1.0, cutmix_alpha=0.0, cutmix_minmax=None,
                 prob=1.0, switch_prob=0.5, mode="batch", correct_lam=True,
                 label_smoothing=0.1, num_classes=1000):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.cutmix_minmax = cutmix_minmax
        self.mix_prob = prob
        self.switch_prob = switch_prob
        self.mode = mode
        self.correct_lam = correct_lam
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def _sample_lam(self, rng, shape):
        """(lam, use_cutmix) with enable-prob and mixup/cutmix switching
        (mixup.py:123-151)."""
        k_en, k_sw, k_beta = jax.random.split(rng, 3)
        use_mixup = self.mixup_alpha > 0.0
        use_cutmix_any = self.cutmix_alpha > 0.0
        if use_mixup and use_cutmix_any:
            use_cutmix = jax.random.bernoulli(k_sw, self.switch_prob, shape)
            alpha = jnp.where(use_cutmix, self.cutmix_alpha, self.mixup_alpha)
        elif use_mixup:
            use_cutmix = jnp.zeros(shape, bool)
            alpha = jnp.full(shape, self.mixup_alpha)
        elif use_cutmix_any:
            use_cutmix = jnp.ones(shape, bool)
            alpha = jnp.full(shape, self.cutmix_alpha)
        else:
            return jnp.ones(shape, jnp.float32), jnp.zeros(shape, bool)
        lam = jax.random.beta(k_beta, alpha, alpha, shape)
        enabled = jax.random.bernoulli(k_en, self.mix_prob, shape)
        lam = jnp.where(enabled, lam, 1.0)
        return lam.astype(jnp.float32), use_cutmix

    def __call__(self, rng, images, labels):
        n, h, w, c = images.shape
        k_lam, k_box = jax.random.split(rng)
        per_sample = self.mode in ("elem", "pair")
        shape = (n,) if per_sample else ()
        lam, use_cutmix = self._sample_lam(k_lam, shape)

        flipped = images[::-1]
        yl, yh, xl, xh = _rand_bbox(k_box, h, w, lam, shape)
        if self.correct_lam:
            box_area = ((yh - yl) * (xh - xl)).astype(jnp.float32)
            lam_cut = 1.0 - box_area / float(h * w)
        else:
            lam_cut = lam

        ys = jnp.arange(h)
        xs = jnp.arange(w)
        if per_sample:
            in_box = ((ys[None, :, None] >= yl[:, None, None])
                      & (ys[None, :, None] < yh[:, None, None])
                      & (xs[None, None, :] >= xl[:, None, None])
                      & (xs[None, None, :] < xh[:, None, None]))
            in_box = in_box[..., None]
            lam_b = lam[:, None, None, None]
            cut_b = use_cutmix[:, None, None, None]
        else:
            in_box = ((ys[:, None] >= yl) & (ys[:, None] < yh)
                      & (xs[None, :] >= xl) & (xs[None, :] < xh))
            in_box = in_box[None, :, :, None]
            lam_b = lam
            cut_b = use_cutmix

        mixed_mix = images * lam_b + flipped * (1.0 - lam_b)
        mixed_cut = jnp.where(in_box, flipped, images)
        out = jnp.where(cut_b, mixed_cut, mixed_mix).astype(images.dtype)

        lam_eff = jnp.where(use_cutmix, lam_cut, lam)
        y1 = one_hot_smooth(labels, self.num_classes, self.label_smoothing)
        y2 = one_hot_smooth(labels[::-1], self.num_classes,
                            self.label_smoothing)
        lam_t = lam_eff[:, None] if per_sample else lam_eff
        target = y1 * lam_t + y2 * (1.0 - lam_t)
        return out, target
