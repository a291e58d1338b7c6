"""PS-ResNet (reference models/psresnet.py): poly-scale convolution —
a grouped dilated conv + a half-rolled grouped double-dilated conv + a
sparsity-masked full conv, summed."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import Conv2d, DropPath, batch_norm, create_attn, get_act_fn

default_cfgs = {
    "psresnet50": default_cfg(),
    "psresnet50_32x4d": default_cfg(),
}


class PSConv2d(fnn.Module):
    """Reference psresnet.py:28-52.  The full conv's weight positions where
    the grouped convs already connect are masked to zero (the reference
    zeroes them and blocks their gradients with a hook; here the mask
    multiplies the kernel, which zeroes both value and gradient)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    parts: int = 4
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        c = x.shape[-1]
        d = self.dilation
        gw = Conv2d(self.out_channels, self.kernel_size, self.stride, d, d,
                    groups=self.parts, dtype=self.dtype, name="gwconv")(x)
        # half-roll the channel groups, conv at double dilation
        x1, x2 = jnp.split(x, 2, axis=-1)
        x_shift = jnp.concatenate([x2, x1], axis=-1)
        gws = Conv2d(self.out_channels, self.kernel_size, self.stride,
                     2 * d, 2 * d, groups=self.parts, dtype=self.dtype,
                     name="gwconv_shift")(x_shift)

        # masked dense conv
        in_feats = c
        kernel = self.param(
            "conv_kernel",
            fnn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size, in_feats, self.out_channels),
            jnp.float32)
        mask = np.ones((in_feats, self.out_channels), np.float32)
        ic, oc = in_feats // self.parts, self.out_channels // self.parts
        for i in range(self.parts):
            mask[i * ic:(i + 1) * ic, i * oc:(i + 1) * oc] = 0
            j = (i + self.parts // 2) % self.parts
            mask[i * ic:(i + 1) * ic, j * oc:(j + 1) * oc] = 0
        kernel = kernel * jnp.asarray(mask)[None, None]
        import jax.lax as lax
        dense = lax.conv_general_dilated(
            x.astype(kernel.dtype), kernel,
            (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(gw.dtype)
        return gw + dense + gws


class PSBottleneck(fnn.Module):
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
        y = PSConv2d(width, 3, self.stride, fd, fd, dtype=self.dtype,
                     name="conv2")(y)
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
def psresnet50(pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, "psresnet50", default_cfgs["psresnet50"],
        pretrained=pretrained, block=PSBottleneck, layers=(3, 4, 6, 3),
        **kwargs)


@register_model
def psresnet50_32x4d(pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, "psresnet50_32x4d", default_cfgs["psresnet50_32x4d"],
        pretrained=pretrained, block=PSBottleneck, layers=(3, 4, 6, 3),
        cardinality=32, base_width=4, **kwargs)
