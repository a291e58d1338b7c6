"""SAN (self-attention networks) with the low-rank variants
(reference models/san_lowrank.py).

SAM (:32-58): pairwise attention — w = MLP([q; unfold_reflect(k)]) produces
the K^2 x (out/share) per-position weights consumed by the shared
local-aggregation kernel.  SAM_lowRank (:60-121): factored embed_h x embed_w
weights computed at pooled resolution and upsampled.  san19 (:188-196) is a
5-stage chassis of pre-act SAM bottlenecks with kernels [3,7,7,7,7].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, batch_norm, get_act_fn, max_pool2d
from cotnet_tpu.ops import local_aggregate
from cotnet_tpu.ops.local_agg import extract_patches

default_cfgs = {"san19": default_cfg(pool_size=None)}

SHARE_PLANES = 8


class SAM(fnn.Module):
    """Pairwise self-attention module (san_lowrank.py:32-58)."""

    rel_planes: int
    out_planes: int
    share_planes: int = 8
    kernel_size: int = 3
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        ks = self.kernel_size
        k2 = ks * ks
        cw = self.out_planes // self.share_planes
        relu = get_act_fn("relu")

        q = Conv2d(self.rel_planes, 1, use_bias=True, dtype=self.dtype,
                   name="conv1")(x)
        k = Conv2d(self.rel_planes, 1, use_bias=True, dtype=self.dtype,
                   name="conv2")(x)
        v = Conv2d(self.out_planes, 1, use_bias=True, dtype=self.dtype,
                   name="conv3")(x)

        # unfold(reflect_pad(k)) with torch's c-major (c, k) channel layout
        patches = extract_patches(k, ks, padding=ks // 2, pad_mode="reflect")
        n, h, w_, _, _ = patches.shape
        k_unf = patches.transpose(0, 1, 2, 4, 3).reshape(
            n, h, w_, self.rel_planes * k2)

        qk = jnp.concatenate([q, k_unf], axis=-1)
        y = batch_norm(qk, training, name="conv_w_bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = relu(y)
        y = Conv2d(cw, 1, dtype=self.dtype, name="conv_w_conv1")(y)
        y = batch_norm(y, training, name="conv_w_bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = relu(y)
        y = Conv2d(k2 * cw, 1, use_bias=True, dtype=self.dtype,
                   name="conv_w_conv2")(y)
        # k-major weight layout (see ops/local_agg.py; converter permutes)
        w = y.reshape(n, h, w_, 1, k2, cw)
        return local_aggregate(v, w, kernel_size=ks, padding=(ks - 1) // 2,
                               impl=self.impl)


class SAMLowRank(fnn.Module):
    """Low-rank factored SAM (san_lowrank.py:60-121)."""

    rel_planes: int
    out_planes: int
    share_planes: int = 8
    kernel_size: int = 3
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        ks = self.kernel_size
        k2 = ks * ks
        relu = get_act_fn("relu")
        pool_size = min(512 // self.out_planes, 4)

        y = Conv2d(self.out_planes + 2 * self.rel_planes, 1,
                   dtype=self.dtype, name="conv")(x)
        q, k, v = jnp.split(
            y, [self.rel_planes, 2 * self.rel_planes], axis=-1)

        patches = extract_patches(k, ks, padding=ks // 2, pad_mode="reflect")
        n, h, w_, _, _ = patches.shape
        k_unf = patches.transpose(0, 1, 2, 4, 3).reshape(
            n, h, w_, self.rel_planes * k2)
        ke = batch_norm(k_unf, training, name="key_embed_bn",
                        dtype=self.dtype, axis_name=self.axis_name)
        ke = relu(ke)
        ke = Conv2d(self.rel_planes, 1, dtype=self.dtype,
                    name="key_embed_conv")(ke)

        qk = jnp.concatenate([q, ke], axis=-1)
        if pool_size > 1:
            from cotnet_tpu.nn import avg_pool2d
            qk = avg_pool2d(qk, pool_size, pool_size)

        e = batch_norm(qk, training, name="conv_w_bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        e = relu(e)
        e = Conv2d(self.out_planes * ks * 2, 1, dtype=self.dtype,
                   name="conv_w_conv")(e)
        nb, hh, ww, _ = e.shape
        eh, ew = jnp.split(e, 2, axis=-1)
        # factored [kh] x [kw] -> K^2 taps; channel layout per tap = cw
        cw_full = self.out_planes  # weight channels before share grouping
        eh = eh.reshape(nb, hh, ww, ks, 1, cw_full)
        ew = ew.reshape(nb, hh, ww, 1, ks, cw_full)
        w = (eh * ew).reshape(nb, hh, ww, 1, k2, cw_full)

        if pool_size > 1:
            w = jnp.repeat(jnp.repeat(w, pool_size, axis=1), pool_size, axis=2)
            w = w[:, :v.shape[1], :v.shape[2]]
        return local_aggregate(v, w, kernel_size=ks, padding=(ks - 1) // 2,
                               impl=self.impl)


class SanBottleneck(fnn.Module):
    """Pre-activation SAM bottleneck (san_lowrank.py:123-139)."""

    rel_planes: int
    mid_planes: int
    out_planes: int
    share_planes: int = 8
    kernel_size: int = 7
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        identity = x
        y = relu(batch_norm(x, training, name="bn1", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = SAM(rel_planes=self.rel_planes, out_planes=self.mid_planes,
                share_planes=self.share_planes, kernel_size=self.kernel_size,
                impl=self.impl, dtype=self.dtype, axis_name=self.axis_name,
                name="sam")(y, training=training)
        y = relu(batch_norm(y, training, name="bn2", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = Conv2d(self.out_planes, 1, use_bias=True, dtype=self.dtype,
                   name="conv")(y)
        return y + identity


class SAN(fnn.Module):
    """5-stage SAN chassis (san_lowrank.py:141-185)."""

    layers: Sequence[int] = (3, 3, 4, 6, 3)
    kernels: Sequence[int] = (3, 7, 7, 7, 7)
    num_classes: int = 1000
    in_chans: int = 3
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        widths = [64, 256, 512, 1024, 2048]

        def bnr(y, name):
            return relu(batch_norm(y, training, name=name, dtype=self.dtype,
                                   axis_name=self.axis_name))

        x = bnr(Conv2d(64, 1, dtype=self.dtype, name="conv_in")(x), "bn_in")
        for si, (c, n_blocks, ks) in enumerate(
                zip(widths, self.layers, self.kernels)):
            x = max_pool2d(x, 2, 2)
            x = Conv2d(c, 1, dtype=self.dtype, name=f"conv{si}")(x)
            for bi in range(n_blocks):
                x = SanBottleneck(
                    rel_planes=c // 16, mid_planes=c // 4, out_planes=c,
                    share_planes=SHARE_PLANES, kernel_size=ks, impl=self.impl,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"layer{si}_{bi}")(x, training=training)
            x = bnr(x, f"bn{si}")
        x = jnp.mean(x, axis=(1, 2))
        return fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def _create_san(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(SAN, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


@register_model
def san19(pretrained=False, **kwargs):
    return _create_san("san19", pretrained, layers=(3, 3, 4, 6, 3),
                       kernels=(3, 7, 7, 7, 7), **kwargs)
