"""Normalization layers.

BatchNorm: flax BatchNorm with torch-compatible defaults (eps 1e-5, running
momentum 0.1 -> flax momentum 0.9) plus an optional ``axis_name`` so batch
stats are computed cross-replica inside the sharded train step.  This single
knob replaces the reference's SyncBN conversion (train.py:96-108) AND the
per-epoch BN-stat broadcast/reduce (utils/distributed.py:58-67): on TPU the
psum over the data axis happens every step, in-graph, for free on ICI.

SubChannelGroupNorm: the CoT attention-embed GroupNorm
(models/cotnet.py:56) with num_groups = dim/share_planes over
K^2*dim/share_planes channels.  The reference's channel order is cw-major
(channel = cw*K^2 + k), so group cw = all taps of weight-channel cw.  Our
weight layout is k-major (channel = k*Cw + cw, see ops/local_agg.py), so the
equivalent grouping is over the *minor* axis of the [K^2, Cw] view — this
module normalizes per (n, cw) over (H, W, K^2), which is mathematically
identical to the reference GroupNorm on its own layout.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as fnn

# Hand-fused BN training backward (see _bn_train_core): exactly two passes
# over the activation instead of XLA autodiff's chain of broadcast/convert
# fusions.  Default from env; A/B'd on chip via tools/train_ab_bench.py.
BN_FUSED_BWD = os.environ.get("COTNET_BN_FUSED_BWD", "0") == "1"


def _bn_stats(x, eps):
    c = x.shape[-1]
    nelem = x.size // c
    red = tuple(range(x.ndim - 1))
    mean = jnp.sum(x, axis=red, dtype=jnp.float32) / nelem
    mean2 = jnp.sum(jnp.square(x), axis=red, dtype=jnp.float32) / nelem
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, var, lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_core(x, scale, bias, eps):
    """Train-mode batch norm with a hand-fused backward.

    Returns (y, mean, var); mean/var feed the (non-differentiated) running-
    stat EMA, so their cotangents are zero and the backward is the closed
    form: dgamma = sum(dy*xhat), dbeta = sum(dy),
    dx = gamma*invstd*(dy - mean(dy) - xhat*mean(dy*xhat)) — one reduction
    pass over (dy, x) and one elementwise pass writing dx, vs XLA autodiff's
    separate broadcast/convert chains through the statistics
    (~10 ms/step across cotnet50's BNs in the r3 trace, tools/train_attr.py).
    Single-process/GSPMD only: under jit the internal reductions become
    global collectives automatically; the explicit axis_name (shard_map)
    path keeps the autodiff form.
    """
    y, mean, var, _ = _bn_train_fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_train_fwd_impl(x, scale, bias, eps):
    mean, var, invstd = _bn_stats(x, eps)
    inv = invstd * scale
    b = bias - mean * inv
    dt = x.dtype
    y = x * inv.astype(dt) + b.astype(dt)
    return y, mean, var, invstd


def _bn_train_fwd_rule(x, scale, bias, eps):
    y, mean, var, invstd = _bn_train_fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, invstd)


def _bn_train_bwd_rule(eps, res, cts):
    dy = cts[0]  # mean/var cotangents are zero (non-diff EMA update)
    x, scale, mean, invstd = res
    c = x.shape[-1]
    nelem = x.size // c
    red = tuple(range(x.ndim - 1))
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * invstd
    sum_dy = jnp.sum(dyf, axis=red)
    sum_dyx = jnp.sum(dyf * xhat, axis=red)
    k = (scale * invstd).astype(jnp.float32)
    dx = (k * (dyf - sum_dy / nelem - xhat * (sum_dyx / nelem))).astype(
        x.dtype)
    return dx, sum_dyx.astype(scale.dtype), sum_dy.astype(scale.dtype)


_bn_train_core.defvjp(_bn_train_fwd_rule, _bn_train_bwd_rule)


class LeanBatchNorm(fnn.Module):
    """flax.linen.BatchNorm semantics with traffic-lean arithmetic.

    flax's ``_compute_stats`` materializes an f32 copy of the input (the
    convert is shared by the mean, the variance, and the normalize, so XLA
    CSEs it into a standalone pass — measured ~2 ms/step of
    convert_element_type across cotnet50's BNs at bs128 bf16, plus the
    backward counterparts).  Here the statistics accumulate in f32 *inside*
    the reduction loops (``jnp.sum(dtype=f32)`` — squares round in the
    model dtype, within bf16's own output rounding) and the normalize is a
    single fused pass ``x * s + b`` with the per-channel affine pre-folded
    in f32.  Param/variable names, shapes, dtypes, momentum math, psum
    placement, and fast-variance clamping all match flax BatchNorm, so
    checkpoints and converted weights are interchangeable.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    scale_init: Any = fnn.initializers.ones

    @fnn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        red = tuple(range(x.ndim - 1))
        dt = self.dtype or x.dtype
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif (BN_FUSED_BWD and self.axis_name is None and dt == x.dtype
              and not self.is_initializing()):
            y, mean, var = _bn_train_core(x, scale, bias, self.epsilon)
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
            return y
        else:
            nelem = x.size // c
            mean = jnp.sum(x, axis=red, dtype=jnp.float32) / nelem
            mean2 = jnp.sum(jnp.square(x), axis=red,
                            dtype=jnp.float32) / nelem
            if self.axis_name is not None and not self.is_initializing():
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = lax.rsqrt(var + self.epsilon) * scale
        b = bias - mean * inv
        return x.astype(dt) * inv.astype(dt) + b.astype(dt)


def batch_norm(x, training: bool, name: str, momentum: float = 0.9,
               epsilon: float = 1e-5, dtype=None, axis_name=None,
               scale_init=fnn.initializers.ones):
    """Torch-flavored BatchNorm2d over NHWC (eps 1e-5, running momentum 0.1
    -> flax momentum 0.9); cross-replica when axis_name is set (only
    meaningful under shard_map/pmap — under GSPMD jit the stats are global
    already).  A helper fn (not a wrapper Module) so parameter paths stay
    flat: ``<name>/{scale,bias}`` + batch_stats ``<name>/{mean,var}``."""
    return LeanBatchNorm(
        use_running_average=not training,
        momentum=momentum,
        epsilon=epsilon,
        dtype=dtype,
        scale_init=scale_init,
        axis_name=axis_name if training else None,
        name=name,
    )(x)


class SubChannelGroupNorm(fnn.Module):
    """GroupNorm over k-major attention-weight channels.

    Channel layout ``[dw_groups][K^2][Cw/dw_groups]`` (dw_groups=1 for
    CotLayer, 2 for CoXtLayer's grouped embed).  Normalizes each weight
    channel over (H, W, K^2) per sample with per-channel affine params —
    semantics identical to the reference's
    nn.GroupNorm(num_groups=Cw, num_channels=K^2*Cw) on its cw-major layout.
    """

    k2: int
    cw: int
    dw_groups: int = 1
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    fold: bool = False
    raw: bool = False   # return (scale, bias) params only (the fused-eval
    #                     kernel computes stats + normalize on-chip)
    chwn: bool = False  # input/output in the CHWN-resident weight layout
    #                     [Cw, K2, H, W, N] (COTNET_CHWN_W); params stay the
    #                     k-major flat (K2*Cw,) so checkpoints interchange

    @fnn.compact
    def __call__(self, x=None):
        c = self.k2 * self.cw
        cwg = self.cw // self.dw_groups
        scale = self.param("scale", fnn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (c,), jnp.float32)
        if self.raw:
            return scale, bias
        if self.chwn:
            # x: [Cw, K2, H, W, N]; same statistics — per (cw, n) over
            # (K2, H, W) — now reductions over major/sublane dims with the
            # batch on lanes.  dw_groups=1 only (CotLayer geometry).
            assert self.dw_groups == 1
            assert x.shape[0] == self.cw and x.shape[1] == self.k2, x.shape
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
            mean2 = jnp.mean(jnp.square(xf), axis=(1, 2, 3), keepdims=True)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
            # per-channel affine, k-major params viewed cw-major
            g = scale.reshape(self.k2, self.cw).T[:, :, None, None, None]
            be = bias.reshape(self.k2, self.cw).T[:, :, None, None, None]
            y = (xf - mean) * inv * g + be
            return y.astype(self.dtype or x.dtype)
        n, h, w, _ = x.shape
        assert x.shape[-1] == c, (x.shape, self.k2, self.cw)

        xf = x.astype(jnp.float32).reshape(
            n, h, w, self.dw_groups, self.k2, cwg)
        # one-pass statistics (E[x^2] - E[x]^2): both reductions fuse into a
        # single read of the weight tensor — the two-pass form costs an extra
        # full HBM read of the largest activation in every CoT layer
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=(1, 2, 4), keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.fold:
            # deferred normalize: return the equivalent per-element affine
            # ``y = x*s + b`` (s = inv*gamma, b = beta - mean*s) as
            # [N, dw_groups, K^2, Cw/dw_groups] for local_aggregate's
            # w_scale/w_bias — the normalized tensor is never materialized.
            # Conditioning note: b's ``beta - mean*s`` cancels where
            # |mean| >> sigma, so the folded result carries up to ~2e-4 rel
            # f32 rounding vs the materialized form (f64-stats verified
            # exact).  Sub-noise for the bf16 eval path this fold serves
            # (bf16 eps ~8e-3; all conversion-parity gates pass with the
            # fold ON); a subtract-first (w-mean)*s+beta kernel contract
            # would fix it at the cost of a third operand in every affine
            # kernel — not taken, recorded here.
            g = scale.reshape(1, self.dw_groups, self.k2, cwg)
            be = bias.reshape(1, self.dw_groups, self.k2, cwg)
            s = inv[:, 0, 0] * g          # [n,dwg,1,cwg] * [1,dwg,k2,cwg]
            b = be - mean[:, 0, 0] * s
            return s, b
        y = (xf - mean) * inv
        y = y.reshape(n, h, w, c) * scale + bias
        return y.astype(self.dtype or x.dtype)


class LayerNorm(fnn.LayerNorm):
    """Torch-parity LayerNorm: two-pass variance.

    Flax's default ``use_fast_variance=True`` computes E[x^2]-E[x]^2, which
    catastrophically cancels when |mean| >> std — exactly the regime of
    post-residual transformer tokens (measured: 3.3e-2 max error vs torch
    at mean 3.0 / std 0.02; two-pass is 1.3e-4).  Every transformer model
    here converts published torch checkpoints, so parity wins over the one
    saved reduction pass.
    """

    use_fast_variance: bool = False
