"""AutoAugment policies + AugMix, on-device (reference
datasets/auto_augment.py — 817 LoC of PIL ops; here the op primitives are the
jnp implementations shared with rand_augment.py, so policies are data).

- ``auto_augment_transform('v0'|'original')``: per image pick one of 25
  sub-policies; each applies two (op, prob, magnitude) entries.
- ``augment_and_mix_transform('augmix-m..-w..-d..')``: AugMix — mixes
  ``width`` random op chains with Dirichlet weights plus a Beta-skip blend;
  pairs with AugMixDataset + JSD loss for consistency training.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cotnet_tpu.data.rand_augment import MAX_LEVEL, OP_NAMES, _apply_op

_OP_IDX = {n: i for i, n in enumerate(OP_NAMES)}

# AutoAugment ImageNet policy V0 (public TF/timm table)
POLICY_V0: List[List[Tuple[str, float, int]]] = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

# AutoAugment 'original' (paper) ImageNet policy
POLICY_ORIGINAL: List[List[Tuple[str, float, int]]] = [
    [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


def _substitute(policy, frm, to):
    return [[(to if name == frm else name, p, m) for name, p, m in sub]
            for sub in policy]


# 'r' variants: the research posterize curve (bits discarded increase with
# magnitude) — reference auto_augment.py:381-412 (v0r) and :448-478
# (originalr)
POLICY_V0R = _substitute(POLICY_V0, "Posterize", "PosterizeIncreasing")
POLICY_ORIGINALR = _substitute(POLICY_ORIGINAL, "PosterizeOriginal",
                               "PosterizeIncreasing")

_POLICIES = {"v0": POLICY_V0, "v0r": POLICY_V0R,
             "original": POLICY_ORIGINAL, "originalr": POLICY_ORIGINALR}


class AutoAugment:
    """Callable (rng, float batch NHWC in 0..255) -> augmented batch."""

    def __init__(self, policy: str = "v0", magnitude_std: float = 0.0):
        table = _POLICIES[policy]
        self.magnitude_std = float(magnitude_std)
        self.n_sub = len(table)
        self.op_idx = jnp.asarray(
            [[_OP_IDX[e[0]] for e in sub] for sub in table], jnp.int32)
        self.prob = jnp.asarray(
            [[e[1] for e in sub] for sub in table], jnp.float32)
        self.mag = jnp.asarray(
            [[e[2] for e in sub] for sub in table], jnp.float32)

    def _one(self, rng, img):
        img = img.astype(jnp.float32)
        k_sub, k_ops = jax.random.split(rng)
        sub = jax.random.randint(k_sub, (), 0, self.n_sub)
        for slot in range(2):
            k_ops, k_p, k_sign, k_cut = jax.random.split(k_ops, 4)
            op = self.op_idx[sub, slot]
            prob = self.prob[sub, slot]
            mag = self.mag[sub, slot]
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            if self.magnitude_std > 0:
                k_ops, k_mag = jax.random.split(k_ops)
                mag = jnp.clip(
                    mag + self.magnitude_std * jax.random.normal(k_mag),
                    0.0, 10.0)
            out = _apply_op(op, img, mag, sign, k_cut)
            img = jnp.where(jax.random.uniform(k_p) < prob, out, img)
        return img

    def __call__(self, rng, batch):
        keys = jax.random.split(rng, batch.shape[0])
        return jax.vmap(self._one)(keys, batch)


# AugMix uses the transform subset that doesn't overlap the eval metrics
_AUGMIX_OPS = ("AutoContrast", "Equalize", "Rotate", "Posterize", "Solarize",
               "ShearX", "ShearY", "TranslateX", "TranslateY")
_AUGMIX_IDX = jnp.asarray([_OP_IDX[n] for n in _AUGMIX_OPS], jnp.int32)


class AugMix:
    """AugMix (arXiv 1912.02781): out = m*x + (1-m)*sum_i w_i chain_i(x)."""

    def __init__(self, magnitude: float = 3, width: int = 3, depth: int = -1,
                 alpha: float = 1.0):
        self.magnitude = float(magnitude)
        self.width = width
        self.depth = depth
        self.alpha = alpha

    def _chain(self, rng, img):
        max_depth = self.depth if self.depth > 0 else 3

        def step(d, carry):
            img, key = carry
            key, k_op, k_sign, k_cut, k_keep = jax.random.split(key, 5)
            op = _AUGMIX_IDX[jax.random.randint(k_op, (), 0,
                                                len(_AUGMIX_OPS))]
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            out = _apply_op(op, img, self.magnitude, sign, k_cut)
            if self.depth <= 0:
                # random depth 1..3: keep applying while d < sampled depth
                keep = d < jax.random.randint(k_keep, (), 1, 4)
                out = jnp.where(keep, out, img)
            return out, key

        out, _ = jax.lax.fori_loop(0, max_depth, step,
                                   (img.astype(jnp.float32), rng))
        return out

    def _one(self, rng, img):
        img = img.astype(jnp.float32)
        k_w, k_m, *k_chains = jax.random.split(rng, 2 + self.width)
        ws = jax.random.dirichlet(k_w, jnp.full((self.width,), self.alpha))
        m = jax.random.beta(k_m, self.alpha, self.alpha)
        mixed = jnp.zeros_like(img)
        for i in range(self.width):
            mixed = mixed + ws[i] * self._chain(k_chains[i], img)
        return m * img + (1.0 - m) * mixed

    def __call__(self, rng, batch):
        keys = jax.random.split(rng, batch.shape[0])
        return jax.vmap(self._one)(keys, batch)


def auto_augment_transform(config_str: str):
    """'v0' / 'v0r' / 'original' / 'originalr' / '<name>-mstd0.5' ->
    AutoAugment (parser parity with reference auto_augment.py:495-530)."""
    parts = config_str.split("-")
    mstd = 0.0
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) >= 2 and cs[0] == "mstd":
            mstd = float(cs[1])
    return AutoAugment(policy=parts[0], magnitude_std=mstd)


def augment_and_mix_transform(config_str: str):
    """'augmix-m5-w4-d2' -> AugMix (parser parity with
    auto_augment.py's augment_and_mix_transform)."""
    parts = config_str.split("-")
    assert parts[0] == "augmix"
    kw = dict(magnitude=3, width=3, depth=-1, alpha=1.0)
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "m":
            kw["magnitude"] = float(val)
        elif key == "w":
            kw["width"] = int(val)
        elif key == "d":
            kw["depth"] = int(val)
        elif key == "a":
            kw["alpha"] = float(val)
    return AugMix(**kw)


def create_batch_augment(config_str):
    """Dispatch on the reference 'aa' config string
    (transforms_factory.py:86-98): rand-* -> RandAugment, augmix-* -> AugMix,
    else AutoAugment policy name."""
    if not config_str:
        return None
    if config_str.startswith("rand"):
        from cotnet_tpu.data.rand_augment import rand_augment_transform
        return rand_augment_transform(config_str)
    if config_str.startswith("augmix"):
        return augment_and_mix_transform(config_str)
    return auto_augment_transform(config_str)
