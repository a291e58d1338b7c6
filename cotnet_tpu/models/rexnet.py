"""ReXNet (reference models/rexnet.py, 262 LoC): linear-bottleneck inverted
residuals with progressively growing channels and SE."""

from __future__ import annotations

from math import ceil
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import Conv2d, SEModule, batch_norm, get_act_fn

default_cfgs = {}


class LinearBottleneck(fnn.Module):
    out_channels: int
    stride: int = 1
    expand: float = 6.0
    use_se: bool = True
    se_reduction: int = 12
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        in_ch = x.shape[-1]
        swish = get_act_fn("swish")
        relu6 = get_act_fn("relu6")
        y = x
        if self.expand != 1.0:
            mid = int(round(in_ch * self.expand))
            y = Conv2d(mid, 1, dtype=self.dtype, name="conv_exp")(y)
            y = batch_norm(y, training, name="bn_exp", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = swish(y)
        else:
            mid = in_ch
        y = Conv2d(mid, 3, self.stride, 1, groups=mid, dtype=self.dtype,
                   name="conv_dw")(y)
        y = batch_norm(y, training, name="bn_dw", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.use_se:
            # SEWithNorm (reference rexnet.py:58-75): BN between fc1 and fc2
            y = SEModule(mid, reduction_channels=max(mid // self.se_reduction, 1),
                         norm=True, dtype=self.dtype, name="se")(y,
                                                                 training=training)
        y = relu6(y)
        y = Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv_pwl")(y)
        y = batch_norm(y, training, name="bn_pwl", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.stride == 1 and in_ch <= self.out_channels:
            # rexnet adds the input onto the FIRST in_ch channels
            y = y.at[..., :in_ch].add(x)
        return y


def _make_divisible(v, divisor=8, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ReXNet(fnn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    ch_div: int = 1  # rexnetr_*: round all widths to a multiple (mod 8)
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.2
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        swish = get_act_fn("swish")
        layers = [1, 2, 2, 3, 3, 5]
        strides = [1, 2, 2, 2, 1, 2]
        layers = [ceil(l * self.depth_mult) for l in layers]
        use_ses = [False, False, True, True, True, True]

        depth = sum(layers)
        stem_ch = int(round(32 * self.width_mult)) if self.width_mult >= 1 \
            else 32
        if self.ch_div > 1:
            stem_ch = _make_divisible(stem_ch, self.ch_div)
        x = Conv2d(stem_ch, 3, 2, 1, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(x, training, name="stem_bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = swish(x)

        # base widths are only renormalized when SHRINKING the net
        # (reference rexnet.py:126: initial_chs / wm if wm < 1 else initial_chs)
        inplanes = 16 / self.width_mult if self.width_mult < 1.0 else 16.0
        final_ch = 180
        blocks = []
        ch = inplanes
        idx = 0
        feats = []
        for si, (n, s, use_se) in enumerate(zip(layers, strides, use_ses)):
            for bi in range(n):
                out_ch = int(round((inplanes + idx * final_ch / depth)
                                   * self.width_mult))
                if self.ch_div > 1:
                    out_ch = _make_divisible(out_ch, self.ch_div)
                x = LinearBottleneck(
                    out_channels=out_ch, stride=s if bi == 0 else 1,
                    expand=1.0 if idx == 0 else 6.0, use_se=use_se,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"block_{idx}")(x, training)
                idx += 1
            feats.append(x)
        if self.features_only:
            return feats
        pen = int(round(1280 * self.width_mult))
        if self.ch_div > 1:
            pen = _make_divisible(pen, self.ch_div)
        x = Conv2d(pen, 1, dtype=self.dtype, name="head_conv")(x)
        x = batch_norm(x, training, name="head_bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = swish(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def _rexnet(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(ReXNet, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference models/rexnet.py:216-262; rexnetr_* round channels to mod 8
REXNET_VARIANTS = {
    "rexnet_100": dict(width_mult=1.0),
    "rexnet_130": dict(width_mult=1.3),
    "rexnet_150": dict(width_mult=1.5),
    "rexnet_200": dict(width_mult=2.0),
    "rexnetr_100": dict(width_mult=1.0, ch_div=8),
    "rexnetr_130": dict(width_mult=1.3, ch_div=8),
    "rexnetr_150": dict(width_mult=1.5, ch_div=8),
    "rexnetr_200": dict(width_mult=2.0, ch_div=8),
}

default_cfgs = {name: default_cfg(first_conv="stem.conv",
                                  classifier="head.fc")
                for name in REXNET_VARIANTS}

register_variant_table(__name__, _rexnet, REXNET_VARIANTS)
