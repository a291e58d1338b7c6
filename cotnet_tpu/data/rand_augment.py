"""On-device RandAugment (reference datasets/rand_augment.py).

TPU-first redesign: the reference applies PIL ops per-image on CPU workers;
here the whole batch is augmented *on device* inside one jitted function of
(rng, uint8 batch) — zero host cost, overlapped with the train step by async
dispatch.

Parity details (constants from the reference file):
- _MAX_LEVEL=10 scaling (rand_augment.py:12), translate_const=100,
  cutout_const=40, fill=128 (:14-17);
- per-op apply-probability u1 <= U(min_prob=0.2, max_prob=0.8)
  (AugmentOp :267-296), per-call magnitude ~ N(m, mstd) clipped to [0,15];
- op set = the 16 _RAND_TRANSFORMS (:227-244), chosen uniformly with
  replacement, n per image (:298-310);
- config-string parser for 'rand-mN-mstdX-nK[-wI]' (:327-372).

Geometric ops use bilinear resampling (the reference randomly picks
bilinear/bicubic per call; bicubic gathers cost 4x on TPU for a sub-0.1
top-1 effect, so bilinear is used — documented divergence).

PIL-exact elementwise semantics (equalize's integer LUT, contrast's rounded
gray mean, sharpness's border-preserving smooth) are reproduced and tested
against PIL in tests/test_augment.py.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

MAX_LEVEL = 10.0
FILL = 128.0
TRANSLATE_CONST = 100.0
CUTOUT_CONST = 40.0

# uniform-weight op list (rand_augment.py:227-244)
OP_NAMES = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateX", "TranslateY", "Cutout",
    # ---- variant magnitude curves beyond this point (AutoAugment policies
    # + increasing-severity RandAugment; reference auto_augment.py:192-306).
    # RandAugment samples indices below len=16 only.
    "PosterizeIncreasing", "PosterizeOriginal", "SolarizeIncreasing",
    "ColorIncreasing", "ContrastIncreasing", "BrightnessIncreasing",
    "SharpnessIncreasing", "TranslateXRel", "TranslateYRel",
)
N_BASE_OPS = 16

# _RAND_CHOICE_WEIGHTS_0 (rand_augment.py:246-263)
CHOICE_WEIGHTS_0 = (0.025, 0.005, 0.0, 0.2, 0.0, 0.005, 0.005, 0.025, 0.005,
                    0.005, 0.025, 0.2, 0.2, 0.1, 0.1, 0.1)


# --------------------------------------------------------------------------
# elementwise / photometric ops on float32 [H, W, 3] in [0, 255]
# --------------------------------------------------------------------------

def _gray(img):
    # PIL 'L' conversion: fixed-point ITU-R 601-2 with rounding
    # (L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16)
    l = (img[..., 0] * 19595 + img[..., 1] * 38470 + img[..., 2] * 7471
         + 32768)
    return jnp.floor(l / 65536.0)


def autocontrast(img):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-9)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def equalize(img):
    """PIL ImageOps.equalize integer-LUT semantics, per channel."""
    def eq_channel(ch):
        idx = jnp.clip(ch, 0, 255).astype(jnp.int32)
        h = jnp.zeros((256,), jnp.int32).at[idx.reshape(-1)].add(1)
        nz = h > 0
        # index of last nonzero bin
        last_idx = 255 - jnp.argmax(nz[::-1])
        last_cnt = h[last_idx]
        step = (jnp.sum(h) - last_cnt) // 255
        csum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(h)[:-1]])
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        out = jnp.take(lut, idx).astype(ch.dtype)
        return jnp.where(step > 0, out, ch)
    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def invert(img):
    return 255.0 - img


def posterize(img, bits_to_keep):
    # keep top ``bits_to_keep`` bits; >=8 is identity (rand_augment.py:120-123)
    shift = jnp.clip(8 - bits_to_keep, 0, 8).astype(jnp.int32)
    q = jnp.left_shift(1, shift).astype(jnp.float32)
    out = jnp.floor(img / q) * q
    return jnp.where(bits_to_keep >= 8, img, out)


def solarize(img, thresh):
    return jnp.where(img >= thresh, 255.0 - img, img)


def solarize_add(img, add, thresh=128.0):
    return jnp.where(img < thresh, jnp.clip(img + add, 0, 255), img)


def _blend(img1, img2, factor):
    """PIL Image.blend(img1, img2, factor): img1 + factor*(img2-img1)."""
    return jnp.clip(img1 + factor * (img2 - img1), 0.0, 255.0)


def color(img, factor):
    gray3 = jnp.broadcast_to(_gray(img)[..., None], img.shape)
    return _blend(gray3, img, factor)


def contrast(img, factor):
    mean = jnp.floor(jnp.mean(_gray(img)) + 0.5)
    return _blend(jnp.full_like(img, mean), img, factor)


def brightness(img, factor):
    return _blend(jnp.zeros_like(img), img, factor)


def sharpness(img, factor):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13; borders unfiltered
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    pad = jnp.pad(img, [(1, 1), (1, 1), (0, 0)])
    sm = sum(k[i, j] * pad[i:i + img.shape[0], j:j + img.shape[1], :]
             for i in range(3) for j in range(3))
    h, w = img.shape[:2]
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    interior = (ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1)
    # PIL's fixed-point kernel filter rounds to nearest
    sm = jnp.where(interior, jnp.floor(sm + 0.5), img)
    return _blend(sm, img, factor)


# --------------------------------------------------------------------------
# geometric ops: inverse-affine bilinear resampling with constant fill
# --------------------------------------------------------------------------

def _affine(img, mat):
    """PIL AFFINE semantics: output (x, y) samples input at
    (a x + b y + c, d x + e y + f); bilinear, fill=128."""
    h, w = img.shape[:2]
    a, b, c, d, e, f = mat
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)  # [h, w]
    # PIL maps output pixel centers through the matrix, fills only when the
    # mapped point itself is outside [0, size), and samples bilinearly at
    # (point - 0.5) with the 2x2 support clamped to the edges (geometry.c)
    sx_raw = a * (X + 0.5) + b * (Y + 0.5) + c
    sy_raw = d * (X + 0.5) + e * (Y + 0.5) + f
    inside = (sx_raw >= 0) & (sx_raw < w) & (sy_raw >= 0) & (sy_raw < h)
    sx = sx_raw - 0.5
    sy = sy_raw - 0.5
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yc, xc]  # [h, w, 3]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return jnp.where(inside[..., None], out, FILL)


def shear_x(img, factor):
    return _affine(img, (1.0, factor, 0.0, 0.0, 1.0, 0.0))


def shear_y(img, factor):
    return _affine(img, (1.0, 0.0, 0.0, factor, 1.0, 0.0))


def translate_x(img, pixels):
    return _affine(img, (1.0, 0.0, pixels, 0.0, 1.0, 0.0))


def translate_y(img, pixels):
    return _affine(img, (1.0, 0.0, 0.0, 0.0, 1.0, pixels))


def rotate(img, degrees):
    """PIL rotate: counterclockwise about the center, same canvas."""
    h, w = img.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    ang = -degrees * jnp.pi / 180.0
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    c = cx - cos * cx - sin * cy
    f = cy + sin * cx - cos * cy
    return _affine(img, (cos, sin, c, -sin, cos, f))


def cutout(img, pixels, rng):
    h, w = img.shape[:2]
    kx, ky = jax.random.split(rng)
    x0f = jax.random.uniform(kx, (), minval=0.0, maxval=float(w))
    y0f = jax.random.uniform(ky, (), minval=0.0, maxval=float(h))
    x0 = jnp.maximum(0.0, x0f - pixels).astype(jnp.int32)
    y0 = jnp.maximum(0.0, y0f - pixels).astype(jnp.int32)
    x1 = jnp.minimum(w, x0 + (2 * pixels).astype(jnp.int32))
    y1 = jnp.minimum(h, y0 + (2 * pixels).astype(jnp.int32))
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    # PIL rectangle() fills inclusive of the end coordinate
    inside = (ys >= y0) & (ys <= y1) & (xs >= x0) & (xs <= x1)
    return jnp.where(inside, FILL, img)


# --------------------------------------------------------------------------
# magnitude -> op arguments (rand_augment.py:38-78)
# --------------------------------------------------------------------------

def _apply_op(op_idx, img, level, sign, rng):
    """Evaluate op ``op_idx`` at magnitude ``level`` (already noise-sampled
    and clipped).  Under vmap the switch lowers to a select over all
    branches — the batch evaluates every op and picks per sample."""
    lvl = level / MAX_LEVEL
    enh = lvl * 1.8 + 0.1

    branches = [
        lambda: autocontrast(img),
        lambda: equalize(img),
        lambda: invert(img),
        lambda: rotate(img, sign * lvl * 30.0),
        lambda: posterize(img, jnp.floor(lvl * 4).astype(jnp.int32)),
        lambda: solarize(img, jnp.floor(lvl * 256)),
        lambda: solarize_add(img, jnp.floor(lvl * 110)),
        lambda: color(img, enh),
        lambda: contrast(img, enh),
        lambda: brightness(img, enh),
        lambda: sharpness(img, enh),
        lambda: shear_x(img, sign * lvl * 0.3),
        lambda: shear_y(img, sign * lvl * 0.3),
        lambda: translate_x(img, sign * lvl * TRANSLATE_CONST),
        lambda: translate_y(img, sign * lvl * TRANSLATE_CONST),
        lambda: cutout(img, jnp.floor(lvl * CUTOUT_CONST), rng),
        # variant curves (reference auto_augment.py:192-260):
        # posterize increasing: more bits DISCARDED with level
        lambda: posterize(img, 4 - jnp.floor(lvl * 4).astype(jnp.int32)),
        # posterize original (paper): bits kept in 4..8
        lambda: posterize(img, 4 + jnp.floor(lvl * 4).astype(jnp.int32)),
        lambda: solarize(img, 256.0 - jnp.floor(lvl * 256)),
        lambda: color(img, 1.0 + sign * lvl * 0.9),
        lambda: contrast(img, 1.0 + sign * lvl * 0.9),
        lambda: brightness(img, 1.0 + sign * lvl * 0.9),
        lambda: sharpness(img, 1.0 + sign * lvl * 0.9),
        lambda: translate_x(img, sign * lvl * 0.45 * img.shape[1]),
        lambda: translate_y(img, sign * lvl * 0.45 * img.shape[0]),
    ]
    return jax.lax.switch(op_idx, [lambda _, b=b: b() for b in branches],
                          None)


class RandAugment:
    """Callable (rng, uint8/float batch NHWC) -> augmented float batch.

    Args mirror the reference: magnitude, num_layers, magnitude_std,
    min_prob/max_prob, optional choice weights index.
    """

    def __init__(self, magnitude: float = 10, num_layers: int = 2,
                 magnitude_std: float = 0.0, min_prob: float = 0.2,
                 max_prob: float = 0.8, weight_idx: Optional[int] = None,
                 max_magnitude: float = 15.0):
        self.magnitude = float(magnitude)
        self.num_layers = num_layers
        self.magnitude_std = magnitude_std
        self.min_prob, self.max_prob = min_prob, max_prob
        self.weights = (jnp.asarray(CHOICE_WEIGHTS_0)
                        if weight_idx == 0 else None)
        self.max_magnitude = max_magnitude
        # op sampling space — must stay twinned with HostRandAugment.num_ops
        # (tests/test_augment.py asserts equality)
        self.num_ops = N_BASE_OPS

    def _augment_one(self, rng, img):
        img = img.astype(jnp.float32)

        def layer(i, carry):
            img, key = carry
            key, k_op, k_mag, k_sign, k_p1, k_p2, k_cut = jax.random.split(key, 7)
            # sample over the 16 base ops only (reference rand_augment.py
            # transform list) — the trailing OP_NAMES entries are the
            # AutoAugment-policy magnitude variants, never RandAugment
            # choices; this also keeps the host twin's sampling space
            # identical (host_augment.HostRandAugment uses N_BASE_OPS) and
            # makes CHOICE_WEIGHTS_0 (length 16) shape-consistent.
            if self.weights is not None:
                op_idx = jax.random.choice(
                    k_op, N_BASE_OPS, p=jnp.asarray(self.weights))
            else:
                op_idx = jax.random.randint(k_op, (), 0, N_BASE_OPS)
            mag = self.magnitude
            if self.magnitude_std > 0:
                mag = mag + jax.random.normal(k_mag) * self.magnitude_std
            mag = jnp.clip(mag, 0.0, self.max_magnitude)
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            out = _apply_op(op_idx, img, mag, sign, k_cut)
            # apply-prob gate (AugmentOp: skip if u1 > U(min_prob, max_prob))
            u1 = jax.random.uniform(k_p1)
            u2 = jax.random.uniform(k_p2, minval=self.min_prob,
                                    maxval=self.max_prob)
            img = jnp.where(u1 <= u2, out, img)
            return img, key

        out, _ = jax.lax.fori_loop(0, self.num_layers, layer, (img, rng))
        return out

    def __call__(self, rng, batch):
        keys = jax.random.split(rng, batch.shape[0])
        return jax.vmap(self._augment_one)(keys, batch)


def rand_augment_transform(config_str: str, magnitude_max: float = 15.0):
    """'rand-m15-mstd0.5-n2' -> RandAugment (parser parity with
    rand_augment.py:327-372)."""
    config = config_str.split("-")
    assert config[0] == "rand", config_str
    magnitude, num_layers, mstd, weight_idx = MAX_LEVEL, 2, 0.0, None
    for c in config[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            mstd = float(val)
        elif key == "m":
            magnitude = float(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            weight_idx = int(val)
        elif key == "inc":
            pass  # the reference ignores it too (rand_augment.py:363)
        else:
            raise ValueError(f"Unknown RandAugment config section {c!r}")
    return RandAugment(magnitude=magnitude, num_layers=num_layers,
                       magnitude_std=mstd, weight_idx=weight_idx,
                       max_magnitude=magnitude_max)
