"""ResNeSt (reference models/resnest.py): split-attention bottleneck with
radix-2 SplitAttnConv2d and avd average-pool stride handling."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    Conv2d,
    DropPath,
    SplitAttnConv2d,
    avg_pool2d,
    batch_norm,
    get_act_fn,
)

default_cfgs = {
    "resnest50d": default_cfg(first_conv="conv1.0"),
    "resnest101e": default_cfg(input_size=(3, 256, 256), pool_size=(8, 8),
                               first_conv="conv1.0"),
}


class ResNestBottleneck(fnn.Module):
    """Reference resnest.py:20-106."""

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
    radix: int = 2
    avd: bool = True
    avd_first: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        act = get_act_fn(self.act)
        residual = x
        use_avd = self.avd and self.stride > 1
        # avd takes over ALL striding (conv2 runs stride-1 either way)
        stride = 1 if use_avd else self.stride

        y = Conv2d(width // self.reduce_first, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if use_avd and self.avd_first:
            y = avg_pool2d(y, 3, self.stride, padding=1)
        if self.radix >= 1:
            y = SplitAttnConv2d(
                out_channels=width, kernel_size=3, stride=stride, padding=fd,
                dilation=fd, groups=self.cardinality, radix=self.radix,
                act=self.act, dtype=self.dtype, axis_name=self.axis_name,
                name="conv2")(y, training=training)
        else:
            y = Conv2d(width, 3, stride, fd, fd, groups=self.cardinality,
                       dtype=self.dtype, name="conv2")(y)
            y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = act(y)
        if use_avd and not self.avd_first:
            y = avg_pool2d(y, 3, self.stride, padding=1)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)


def _create_resnest(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


@register_model
def resnest50d(pretrained=False, **kwargs):
    return _create_resnest(
        "resnest50d", pretrained, block=ResNestBottleneck, layers=(3, 4, 6, 3),
        stem_type="deep", stem_width=32, avg_down=True, base_width=64,
        block_args=dict(radix=2, avd=True, avd_first=False), **kwargs)


@register_model
def resnest101e(pretrained=False, **kwargs):
    return _create_resnest(
        "resnest101e", pretrained, block=ResNestBottleneck, layers=(3, 4, 23, 3),
        stem_type="deep", stem_width=64, avg_down=True, base_width=64,
        block_args=dict(radix=2, avd=True, avd_first=False), **kwargs)
