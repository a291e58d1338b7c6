"""Selective-Kernel networks (reference models/sknet.py): bottleneck with
the 3x3 conv replaced by SelectiveKernelConv."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    Conv2d,
    DropPath,
    SelectiveKernelConv,
    batch_norm,
    create_attn,
    get_act_fn,
)

default_cfgs = {}


class SelectiveKernelBottleneck(fnn.Module):
    expansion = 4

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "relu"
    attn_layer: Optional[str] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    sk_kwargs: Optional[dict] = None
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        outplanes = self.planes * self.expansion
        act = get_act_fn(self.act)
        residual = x

        y = Conv2d(width // self.reduce_first, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        y = SelectiveKernelConv(
            out_channels=width, stride=self.stride,
            dilation=self.first_dilation or self.dilation,
            groups=self.cardinality, act=self.act, dtype=self.dtype,
            axis_name=self.axis_name, name="conv2",
            **(self.sk_kwargs or {}))(y, training=training)
        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se")
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)


class SelectiveKernelBasic(fnn.Module):
    """SK conv + 3x3 conv basic block (reference sknet.py:15-61)."""

    expansion = 1

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "relu"
    attn_layer: Optional[str] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    sk_kwargs: Optional[dict] = None
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        assert self.cardinality == 1 and self.base_width == 64
        first_planes = self.planes // self.reduce_first
        outplanes = self.planes * self.expansion
        act = get_act_fn(self.act)
        residual = x

        y = SelectiveKernelConv(
            out_channels=first_planes, stride=self.stride,
            dilation=self.first_dilation or self.dilation, act=self.act,
            dtype=self.dtype, axis_name=self.axis_name, name="conv1",
            **(self.sk_kwargs or {}))(x, training=training)
        y = Conv2d(outplanes, 3, 1, self.dilation, self.dilation,
                   dtype=self.dtype, name="conv2")(y)
        bn2_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn2_scale)
        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se")
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)


def _create_sknet(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


# reference models/sknet.py:146-248
_sk_small = dict(min_attn_channels=16, attn_reduction=8, split_input=True)
SKNET_VARIANTS = {
    "skresnet18": dict(block=SelectiveKernelBasic, layers=(2, 2, 2, 2),
                       zero_init_last_bn=False,
                       block_args=dict(sk_kwargs=_sk_small)),
    "skresnet34": dict(block=SelectiveKernelBasic, layers=(3, 4, 6, 3),
                       zero_init_last_bn=False,
                       block_args=dict(sk_kwargs=_sk_small)),
    "skresnet50": dict(block=SelectiveKernelBottleneck, layers=(3, 4, 6, 3),
                       zero_init_last_bn=False,
                       block_args=dict(sk_kwargs=dict(split_input=True))),
    "skresnet50_zerobn": dict(block=SelectiveKernelBottleneck,
                              layers=(3, 4, 6, 3), zero_init_last_bn=True,
                              block_args=dict(sk_kwargs=dict(split_input=True))),
    "skresnet50d": dict(block=SelectiveKernelBottleneck, layers=(3, 4, 6, 3),
                        stem_width=32, stem_type="deep", avg_down=True,
                        zero_init_last_bn=False,
                        block_args=dict(sk_kwargs=dict(split_input=True))),
    "skresnext50_32x4d": dict(block=SelectiveKernelBottleneck,
                              layers=(3, 4, 6, 3), cardinality=32,
                              base_width=4, zero_init_last_bn=False),
    "skresnext50_32x4d_zerobn": dict(block=SelectiveKernelBottleneck,
                                     layers=(3, 4, 6, 3), cardinality=32,
                                     base_width=4, zero_init_last_bn=True),
    "skresnext101_32x4d_zerobn": dict(block=SelectiveKernelBottleneck,
                                      layers=(3, 4, 23, 3), cardinality=32,
                                      base_width=4, zero_init_last_bn=True),
}

default_cfgs = {
    name: default_cfg(first_conv="conv1.0" if "50d" in name else "conv1")
    for name in SKNET_VARIANTS}

register_variant_table(__name__, _create_sknet, SKNET_VARIANTS)
