"""Xception (reference models/xception.py, 206 LoC): separable-conv entry/
middle/exit flows."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, batch_norm, get_act_fn, max_pool2d

default_cfgs = {
    "xception": default_cfg(input_size=(3, 299, 299), crop_pct=0.8975,
                            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                            first_conv="conv1", classifier="fc"),
}


class SeparableConv(fnn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        x = Conv2d(c, self.kernel_size, self.stride, None, 1, groups=c,
                   dtype=self.dtype, name="dw")(x)
        x = Conv2d(self.out_channels, 1, dtype=self.dtype, name="pw")(x)
        return batch_norm(x, training, name="bn", dtype=self.dtype,
                          axis_name=self.axis_name)


class XceptionBlock(fnn.Module):
    out_channels: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        in_ch = x.shape[-1]
        if self.out_channels != in_ch or self.stride != 1:
            skip = Conv2d(self.out_channels, 1, self.stride, 0,
                          dtype=self.dtype, name="skip_conv")(x)
            skip = batch_norm(skip, training, name="skip_bn",
                              dtype=self.dtype, axis_name=self.axis_name)
        else:
            skip = x

        y = x
        ch = in_ch
        for i in range(self.reps):
            if i > 0 or self.start_with_relu:
                y = relu(y)
            grow = (i == 0 and self.grow_first) or (
                i == self.reps - 1 and not self.grow_first)
            ch = self.out_channels if grow or ch == self.out_channels else ch
            y = SeparableConv(ch, 3, dtype=self.dtype,
                              axis_name=self.axis_name, name=f"sep{i}")(
                                  y, training)
        if self.stride != 1:
            y = max_pool2d(y, 3, self.stride, 1)
        return y + skip


class Xception(fnn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        x = Conv2d(32, 3, 2, 0, dtype=self.dtype, name="conv1")(x)
        x = relu(batch_norm(x, training, name="bn1", dtype=self.dtype,
                            axis_name=self.axis_name))
        x = Conv2d(64, 3, 1, 0, dtype=self.dtype, name="conv2")(x)
        x = relu(batch_norm(x, training, name="bn2", dtype=self.dtype,
                            axis_name=self.axis_name))

        x = XceptionBlock(128, 2, 2, start_with_relu=False, dtype=self.dtype,
                          axis_name=self.axis_name, name="block1")(x, training)
        x = XceptionBlock(256, 2, 2, dtype=self.dtype,
                          axis_name=self.axis_name, name="block2")(x, training)
        x = XceptionBlock(728, 2, 2, dtype=self.dtype,
                          axis_name=self.axis_name, name="block3")(x, training)
        for i in range(8):
            x = XceptionBlock(728, 3, 1, dtype=self.dtype,
                              axis_name=self.axis_name,
                              name=f"block{i + 4}")(x, training)
        x = XceptionBlock(1024, 2, 2, grow_first=False, dtype=self.dtype,
                          axis_name=self.axis_name, name="block12")(x, training)

        x = SeparableConv(1536, 3, dtype=self.dtype,
                          axis_name=self.axis_name, name="conv3")(x, training)
        x = relu(x)
        x = SeparableConv(2048, 3, dtype=self.dtype,
                          axis_name=self.axis_name, name="conv4")(x, training)
        x = relu(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


@register_model
def xception(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(Xception, "xception",
                                default_cfgs["xception"],
                                pretrained=pretrained, **kwargs)
