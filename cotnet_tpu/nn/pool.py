"""Pooling ops with torch-compatible semantics (NHWC).

Covers: nn.AvgPool2d / nn.MaxPool2d geometry (incl. count_include_pad and
ceil_mode — the reference bottleneck's stride-handling avg-pool,
models/cotnet.py:199-202, uses count_include_pad=True; the ResNet-D
downsample, resnet.py:380-395, uses ceil_mode=True count_include_pad=False),
AvgPool2dSame / MaxPool2dSame (pool2d_same.py), adaptive global pools
(adaptive_avgmax_pool.py), and median pool (median_pool.py).
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

# Max pool as a max over K^2 strided slices instead of reduce_window,
# aimed at the 0.77 ms/step select-and-scatter backward of the stem maxpool
# (r4 train-trace roofline table).  MEASURED OFF on the v5e (full cotnet50
# train step bs128 bf16, tools/train_ab_bench.py r4: 121.4 ms/step vs
# 106.4 baseline; infer 29.3 vs 27.6) — the stride-2 lane/sublane
# re-layouts of nine slices plus the backward's interior-dilated pads cost
# ~15 ms/step, 20x more than the select-and-scatter they replace.  Kept
# behind the gate for re-measurement on future platforms.
SLICE_MAXPOOL = os.environ.get("COTNET_SLICE_MAXPOOL", "0") == "1"


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _pool_out_size(size, k, s, p, ceil_mode):
    if ceil_mode:
        o = -((size + 2 * p - k) // -s) + 1
        # torch clips the last window so it starts inside the (padded) input
        if (o - 1) * s >= size + p:
            o -= 1
        return o
    return (size + 2 * p - k) // s + 1


def avg_pool2d(x, kernel_size, stride=None, padding=0, ceil_mode=False,
               count_include_pad=True):
    """torch.nn.AvgPool2d on NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    n, h, w, c = x.shape
    oh = _pool_out_size(h, k[0], s[0], p[0], ceil_mode)
    ow = _pool_out_size(w, k[1], s[1], p[1], ceil_mode)
    # pad enough for ceil_mode windows
    eh = max(0, (oh - 1) * s[0] + k[0] - h - p[0])
    ew = max(0, (ow - 1) * s[1] + k[1] - w - p[1])

    if count_include_pad and eh == 0 and ew == 0:
        # uniform divisor (every window counts k*k, padded or not): express
        # as a depthwise conv — reduce_window measured 2.2x slower fwd+bwd
        # at the avd-pool shape on TPU (tools trace + /tmp/pool_bench:
        # 2.21 vs 0.99 ms at [128,56,56,128] k3 s2 p1 bf16), and the conv
        # accumulates f32 natively so the f32 upcast pass disappears too
        wk = jnp.full((k[0], k[1], 1, c), 1.0 / (k[0] * k[1]), x.dtype)
        return lax.conv_general_dilated(
            x, wk, (s[0], s[1]), [(p[0], p[0]), (p[1], p[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    xf = x.astype(jnp.float32)
    sums = lax.reduce_window(
        xf, 0.0, lax.add, (1, k[0], k[1], 1), (1, s[0], s[1], 1),
        [(0, 0), (p[0], eh), (p[1], ew), (0, 0)])
    if count_include_pad:
        # torch counts the *explicit* padding but never the ceil_mode overhang
        ones = lax.reduce_window(
            jnp.ones((1, h + 2 * p[0], w + 2 * p[1], 1), jnp.float32), 0.0,
            lax.add, (1, k[0], k[1], 1), (1, s[0], s[1], 1),
            [(0, 0), (0, eh), (0, ew), (0, 0)])
    else:
        ones = lax.reduce_window(
            jnp.ones((1, h, w, 1), jnp.float32), 0.0, lax.add,
            (1, k[0], k[1], 1), (1, s[0], s[1], 1),
            [(0, 0), (p[0], eh), (p[1], ew), (0, 0)])
    return (sums / ones).astype(x.dtype)


def max_pool2d(x, kernel_size, stride=None, padding=0, ceil_mode=False):
    """torch.nn.MaxPool2d on NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    n, h, w, c = x.shape
    oh = _pool_out_size(h, k[0], s[0], p[0], ceil_mode)
    ow = _pool_out_size(w, k[1], s[1], p[1], ceil_mode)
    eh = max(0, (oh - 1) * s[0] + k[0] - h - p[0])
    ew = max(0, (ow - 1) * s[1] + k[1] - w - p[1])
    # -inf init dispatches to the reduce_window_max primitive (autodiff-able)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    if SLICE_MAXPOOL and k[0] * k[1] <= 25:
        # max over K^2 strided slices: identical forward values; backward is
        # select+dilated-pad loop fusions instead of select-and-scatter
        # (lax.max's JVP selects on >=, so tied/padding grads route to the
        # first slice — no NaN at -inf padding)
        xp = x if max(p[0], eh, p[1], ew) == 0 else jnp.pad(
            x, ((0, 0), (p[0], eh), (p[1], ew), (0, 0)),
            constant_values=neg)
        y = None
        for kh in range(k[0]):
            for kw in range(k[1]):
                sl = lax.slice(
                    xp, (0, kh, kw, 0),
                    (n, kh + (oh - 1) * s[0] + 1, kw + (ow - 1) * s[1] + 1,
                     c), (1, s[0], s[1], 1))
                y = sl if y is None else lax.max(y, sl)
        return y
    return lax.reduce_window(
        x, neg, lax.max, (1, k[0], k[1], 1), (1, s[0], s[1], 1),
        [(0, 0), (p[0], eh), (p[1], ew), (0, 0)])


def avg_pool2d_same(x, kernel_size, stride):
    """TF-SAME avg pool, padding excluded from counts (pool2d_same.py:31-41)."""
    from cotnet_tpu.nn.conv import pad_same
    k, s = _pair(kernel_size), _pair(stride)
    n, h, w, c = x.shape
    ones = pad_same(jnp.ones((1, h, w, 1), jnp.float32), k, s)
    xp = pad_same(x.astype(jnp.float32), k, s)
    sums = lax.reduce_window(xp, 0.0, lax.add, (1, k[0], k[1], 1),
                             (1, s[0], s[1], 1), "VALID")
    cnts = lax.reduce_window(ones, 0.0, lax.add, (1, k[0], k[1], 1),
                             (1, s[0], s[1], 1), "VALID")
    return (sums / cnts).astype(x.dtype)


def max_pool2d_same(x, kernel_size, stride):
    from cotnet_tpu.nn.conv import pad_same
    k, s = _pair(kernel_size), _pair(stride)
    xp = pad_same(x, k, s, value=float(jnp.finfo(jnp.float32).min))
    return lax.reduce_window(xp, -jnp.inf, lax.max,
                             (1, k[0], k[1], 1), (1, s[0], s[1], 1), "VALID")


def global_pool2d(x, pool_type: str = "avg"):
    """Adaptive global pooling over NHWC spatial dims
    (reference adaptive_avgmax_pool.py: avg/max/avgmax/catavgmax)."""
    if pool_type == "avg":
        return jnp.mean(x, axis=(1, 2))
    if pool_type == "max":
        return jnp.max(x, axis=(1, 2))
    if pool_type == "avgmax":
        return 0.5 * (jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2)))
    if pool_type == "catavgmax":
        return jnp.concatenate(
            [jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1)
    if pool_type in ("", None, "identity"):
        return x
    raise ValueError(f"unknown pool_type {pool_type!r}")


def median_pool2d(x, kernel_size=3, stride=1, padding=0):
    """Median pool (reference median_pool.py) via sorted window gather."""
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(padding)
    n, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)])
    oh = (h + 2 * p[0] - k[0]) // s[0] + 1
    ow = (w + 2 * p[1] - k[1]) // s[1] + 1
    taps = []
    for ih in range(k[0]):
        for iw in range(k[1]):
            taps.append(lax.slice(
                xp, (0, ih, iw, 0),
                (n, ih + (oh - 1) * s[0] + 1, iw + (ow - 1) * s[1] + 1, c),
                (1, s[0], s[1], 1)))
    stacked = jnp.stack(taps, axis=-1)
    return jnp.median(stacked, axis=-1)
