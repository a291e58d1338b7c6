"""ResNetV2 / Big Transfer (reference models/resnetv2.py, 655 LoC):
pre-activation bottlenecks with GroupNorm + weight-standardized convs."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import StdConv2d, get_act_fn, max_pool2d, pad_same

default_cfgs = {
    "resnetv2_50x1_bitm": default_cfg(
        input_size=(3, 448, 448), crop_pct=1.0, mean=(0.5, 0.5, 0.5),
        std=(0.5, 0.5, 0.5), first_conv="stem.conv", classifier="head.fc"),
    "resnetv2_101x1_bitm": default_cfg(
        input_size=(3, 448, 448), crop_pct=1.0, mean=(0.5, 0.5, 0.5),
        std=(0.5, 0.5, 0.5), first_conv="stem.conv", classifier="head.fc"),
}


def _gn(x, name, dtype=None, groups=32):
    return fnn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype,
                         name=name)(x)


class PreActBottleneck(fnn.Module):
    out_channels: int
    mid_channels: int
    stride: int = 1
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        in_ch = x.shape[-1]
        y = relu(_gn(x, "norm1", self.dtype))
        if self.stride != 1 or in_ch != self.out_channels:
            shortcut = StdConv2d(self.out_channels, 1, self.stride, 0,
                                 dtype=self.dtype, name="downsample")(y)
        else:
            shortcut = x
        y = StdConv2d(self.mid_channels, 1, 1, 0, dtype=self.dtype,
                      name="conv1")(y)
        y = relu(_gn(y, "norm2", self.dtype))
        y = StdConv2d(self.mid_channels, 3, self.stride, 1, dtype=self.dtype,
                      name="conv2")(y)
        y = relu(_gn(y, "norm3", self.dtype))
        y = StdConv2d(self.out_channels, 1, 1, 0, dtype=self.dtype,
                      name="conv3")(y)
        return y + shortcut


class ResNetV2(fnn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    width_factor: int = 1
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        wf = self.width_factor
        relu = get_act_fn("relu")
        x = StdConv2d(64 * wf, 7, 2, 3, dtype=self.dtype, name="stem_conv")(x)
        x = pad_same(x, (3, 3), (2, 2))
        x = max_pool2d(x, 3, 2, 0)

        feats = []
        ch = 256
        for si, depth in enumerate(self.layers):
            for bi in range(depth):
                x = PreActBottleneck(
                    out_channels=ch * wf, mid_channels=ch * wf // 4,
                    stride=2 if (bi == 0 and si > 0) else 1,
                    dtype=self.dtype, name=f"stage{si + 1}_block{bi + 1}")(
                        x, training)
            feats.append(x)
            ch *= 2
        if self.features_only:
            return feats
        x = relu(_gn(x, "norm", self.dtype))
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def _resnetv2(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(ResNetV2, model_name,
                                default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


@register_model
def resnetv2_50x1_bitm(pretrained=False, **kwargs):
    return _resnetv2("resnetv2_50x1_bitm", pretrained,
                     layers=(3, 4, 6, 3), width_factor=1, **kwargs)


@register_model
def resnetv2_101x1_bitm(pretrained=False, **kwargs):
    return _resnetv2("resnetv2_101x1_bitm", pretrained,
                     layers=(3, 4, 23, 3), width_factor=1, **kwargs)
