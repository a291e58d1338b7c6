"""SE-CoTNetD hybrid family (reference models/cotnet_hybrid.py).

Hybrid blocks: stages 1-2 (width 64/128) and *odd-indexed* stage-3 blocks use
a radix-1 SplitAttn conv (i.e. conv + sigmoid SE gate); even-indexed stage-3
blocks and all of stage 4 use the CoT layer (selection logic
cotnet_hybrid.py:138-157).  Chassis is ResNet-D style: deep stem, avg-down
shortcuts, **no stem maxpool** — every stage strides 2
(cotnet_hybrid.py:251-256,375-381) — via ResNet(replace_stem_pool=True).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.cotnet import CotLayer
from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    batch_norm,
    BlurPool2d,
    Conv2d,
    DropBlock2d,
    DropPath,
    SplitAttnConv2d,
    avg_pool2d,
    get_act_fn,
)

default_cfgs = {
    # input-size tiers (reference cotnet_hybrid.py:33-46)
    "se_cotnetd_50": default_cfg(first_conv="conv1.0"),
    "se_cotnetd_101": default_cfg(first_conv="conv1.0"),
    "se_cotnetd_152": default_cfg(
        input_size=(3, 256, 256), pool_size=(8, 8), crop_pct=0.888,
        first_conv="conv1.0"),
    "se_cotnetd_152_L": default_cfg(
        input_size=(3, 320, 320), pool_size=(10, 10), crop_pct=0.909,
        first_conv="conv1.0"),
    "se_cotnetd_200": default_cfg(
        input_size=(3, 256, 256), pool_size=(8, 8), crop_pct=0.888,
        first_conv="conv1.0"),
    "se_cotnetd_270": default_cfg(
        input_size=(3, 256, 256), pool_size=(8, 8), crop_pct=0.888,
        first_conv="conv1.0"),
}


class CotHybridBottleneck(fnn.Module):
    """Reference CoTBottleneck (cotnet_hybrid.py:118-202)."""

    expansion = 4

    planes: int
    block_idx: int = 0
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "swish"          # used by the SplitAttn branch
    attn_layer: Optional[str] = None
    aa: bool = False            # BlurPool as the avd pool
    radix: int = 1
    avd: bool = False
    avd_first: bool = True
    conv_dim: Tuple[int, ...] = ()
    c4_dim: int = -1
    c4_idx: Tuple[int, ...] = ()
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        relu = get_act_fn("relu")
        residual = x

        y = Conv2d(first_planes, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype, axis_name=self.axis_name)
        y = self._maybe_drop_block(y, training)
        y = relu(y)

        use_split_attn = (width in self.conv_dim) or (
            width == self.c4_dim and self.block_idx not in self.c4_idx)

        def avd_pool(z):
            if self.aa:
                return BlurPool2d(stride=self.stride, name="avd")(z)
            return avg_pool2d(z, 3, self.stride, padding=1)

        if use_split_attn:
            conv2_stride = self.stride
            pool = None
            if self.stride > 1 and self.avd:
                pool = avd_pool
                conv2_stride = 1
            if pool is not None and self.avd_first:
                y = pool(y)
            y = SplitAttnConv2d(
                out_channels=width, kernel_size=3, stride=conv2_stride,
                padding=fd, dilation=fd, groups=self.cardinality,
                radix=self.radix, reduction_factor=4, act="swish",
                dtype=self.dtype, axis_name=self.axis_name,
                name="conv2")(y, training=training)
            if pool is not None and not self.avd_first:
                y = pool(y)
        else:
            pool = avd_pool if self.stride > 1 else None
            if pool is not None and self.avd_first:
                y = pool(y)
            y = CotLayer(dim=width, kernel_size=3, impl=self.impl,
                         dtype=self.dtype, axis_name=self.axis_name,
                         name="conv2")(y, training=training)
            if pool is not None and not self.avd_first:
                y = pool(y)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        y = self._maybe_drop_block(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return relu(y + residual)

    def _maybe_drop_block(self, y, training):
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            return DropBlock2d(rate, bs, gamma)(y, training=training)
        return y


def _se_cotnetd(model_name, pretrained, layers, stem_width, aa, c4_blocks,
                avd, avd_first, **kwargs):
    block_args = dict(
        radix=1, avd=avd, avd_first=avd_first, conv_dim=(64, 128),
        c4_dim=256, c4_idx=tuple(range(0, c4_blocks, 2)))
    block_args.update(kwargs.pop("block_args", {}))
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        block=CotHybridBottleneck, layers=layers, stem_type="deep",
        stem_width=stem_width, avg_down=True, replace_stem_pool=True,
        stem_act="relu", act="swish", aa_layer="blur" if aa else None,
        block_args=block_args, **kwargs)


@register_model
def se_cotnetd_50(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_50", pretrained, (3, 4, 6, 3),
                       stem_width=32, aa=False, c4_blocks=6, avd=False,
                       avd_first=True, **kwargs)


@register_model
def se_cotnetd_101(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_101", pretrained, (3, 4, 23, 3),
                       stem_width=64, aa=False, c4_blocks=23, avd=False,
                       avd_first=True, **kwargs)


@register_model
def se_cotnetd_152(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_152", pretrained, (3, 8, 36, 3),
                       stem_width=64, aa=True, c4_blocks=36, avd=True,
                       avd_first=False, **kwargs)


@register_model
def se_cotnetd_152_L(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_152_L", pretrained, (3, 8, 36, 3),
                       stem_width=64, aa=True, c4_blocks=36, avd=True,
                       avd_first=False, **kwargs)


@register_model
def se_cotnetd_200(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_200", pretrained, (3, 24, 36, 3),
                       stem_width=64, aa=True, c4_blocks=36, avd=True,
                       avd_first=False, **kwargs)


@register_model
def se_cotnetd_270(pretrained=False, **kwargs):
    return _se_cotnetd("se_cotnetd_270", pretrained, (4, 29, 53, 4),
                       stem_width=64, aa=True, c4_blocks=53, avd=True,
                       avd_first=False, **kwargs)
