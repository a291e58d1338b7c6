"""Selective-Kernel networks (reference models/sknet.py): bottleneck with
the 3x3 conv replaced by SelectiveKernelConv."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    Conv2d,
    DropPath,
    SelectiveKernelConv,
    batch_norm,
    create_attn,
    get_act_fn,
)

default_cfgs = {
    "skresnet50": default_cfg(),
    "skresnext50_32x4d": default_cfg(),
}


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


def _create_sknet(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


@register_model
def skresnet50(pretrained=False, **kwargs):
    return _create_sknet(
        "skresnet50", pretrained, block=SelectiveKernelBottleneck,
        layers=(3, 4, 6, 3),
        block_args=dict(sk_kwargs=dict(split_input=True)), **kwargs)


@register_model
def skresnext50_32x4d(pretrained=False, **kwargs):
    return _create_sknet(
        "skresnext50_32x4d", pretrained, block=SelectiveKernelBottleneck,
        layers=(3, 4, 6, 3), cardinality=32, base_width=4, **kwargs)
