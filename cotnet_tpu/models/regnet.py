"""RegNet X/Y (reference models/regnet.py, 460 LoC): stages of grouped-conv
bottlenecks with widths from published per-variant tables."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, SEModule, batch_norm, get_act_fn

default_cfgs = {
    "regnetx_016": default_cfg(first_conv="stem.conv", classifier="head.fc"),
    "regnetx_032": default_cfg(first_conv="stem.conv", classifier="head.fc"),
    "regnety_016": default_cfg(first_conv="stem.conv", classifier="head.fc"),
    "regnety_032": default_cfg(first_conv="stem.conv", classifier="head.fc"),
}

# (widths per stage, depths per stage, group width, se)
_CFGS = {
    "regnetx_016": ((72, 168, 408, 912), (2, 4, 10, 2), 24, False),
    "regnetx_032": ((96, 192, 432, 1008), (2, 6, 15, 2), 48, False),
    "regnety_016": ((48, 120, 336, 888), (2, 6, 17, 2), 24, True),
    "regnety_032": ((72, 216, 576, 1512), (2, 5, 13, 1), 24, True),
}


class RegBottleneck(fnn.Module):
    width: int
    stride: int = 1
    group_width: int = 24
    se: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        in_ch = x.shape[-1]
        groups = self.width // self.group_width
        y = Conv2d(self.width, 1, dtype=self.dtype, name="conv1")(x)
        y = relu(batch_norm(y, training, name="bn1", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = Conv2d(self.width, 3, self.stride, 1, groups=groups,
                   dtype=self.dtype, name="conv2")(y)
        y = relu(batch_norm(y, training, name="bn2", dtype=self.dtype,
                            axis_name=self.axis_name))
        if self.se:
            y = SEModule(self.width, reduction_channels=max(in_ch // 4, 8),
                         dtype=self.dtype, name="se")(y, training=training)
        y = Conv2d(self.width, 1, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.stride != 1 or in_ch != self.width:
            sc = Conv2d(self.width, 1, self.stride, 0, dtype=self.dtype,
                        name="downsample_conv")(x)
            sc = batch_norm(sc, training, name="downsample_bn",
                            dtype=self.dtype, axis_name=self.axis_name)
        else:
            sc = x
        return relu(y + sc)


class RegNet(fnn.Module):
    widths: Sequence[int] = (72, 168, 408, 912)
    depths: Sequence[int] = (2, 4, 10, 2)
    group_width: int = 24
    se: bool = False
    stem_width: int = 32
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        x = Conv2d(self.stem_width, 3, 2, 1, dtype=self.dtype,
                   name="stem_conv")(x)
        x = relu(batch_norm(x, training, name="stem_bn", dtype=self.dtype,
                            axis_name=self.axis_name))
        feats = []
        for si, (w, d) in enumerate(zip(self.widths, self.depths)):
            for bi in range(d):
                x = RegBottleneck(w, stride=2 if bi == 0 else 1,
                                  group_width=self.group_width, se=self.se,
                                  dtype=self.dtype, axis_name=self.axis_name,
                                  name=f"s{si + 1}_b{bi + 1}")(x, training)
            feats.append(x)
        if self.features_only:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def _regnet(model_name, pretrained=False, **kwargs):
    widths, depths, gw, se = _CFGS[model_name]
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        RegNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        widths=widths, depths=depths, group_width=gw, se=se, **kwargs)


@register_model
def regnetx_016(pretrained=False, **kwargs):
    return _regnet("regnetx_016", pretrained, **kwargs)


@register_model
def regnetx_032(pretrained=False, **kwargs):
    return _regnet("regnetx_032", pretrained, **kwargs)


@register_model
def regnety_016(pretrained=False, **kwargs):
    return _regnet("regnety_016", pretrained, **kwargs)


@register_model
def regnety_032(pretrained=False, **kwargs):
    return _regnet("regnety_032", pretrained, **kwargs)
