"""ResNet-DW (reference models/resnet_dw.py): bottleneck whose 3x3 is a
1x1 conv+BN+act followed by a depthwise 3x3, with avg-pool stride."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import Conv2d, DropPath, avg_pool2d, batch_norm, create_attn, get_act_fn

default_cfgs = {"resnet50_dw": default_cfg()}


class DwBottleneck(fnn.Module):
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

        y = Conv2d(width // self.reduce_first, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if self.stride > 1:
            y = avg_pool2d(y, 3, 2, padding=1)
        # conv2: 1x1 + BN + act, then depthwise 3x3 (resnet_dw.py:58-64)
        y = Conv2d(width, 1, dtype=self.dtype, name="conv2_pw")(y)
        y = batch_norm(y, training, name="conv2_bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        y = Conv2d(width, 3, 1, fd, fd, groups=width, dtype=self.dtype,
                   name="conv2_dw")(y)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)

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


@register_model
def resnet50_dw(pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, "resnet50_dw", default_cfgs["resnet50_dw"],
        pretrained=pretrained, block=DwBottleneck, layers=(3, 4, 6, 3),
        **kwargs)
