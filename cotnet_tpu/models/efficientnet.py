"""EfficientNet / MNASNet / MobileNetV2/V3 (reference models/efficientnet.py
+ efficientnet_builder.py + efficientnet_blocks.py, ~2.5k LoC of arch-string
machinery).  Here the standard architectures are data tables driving three
block types (DepthwiseSeparable, InvertedResidual/MBConv, EdgeResidual) —
behaviorally equivalent, minus the string-decoder indirection.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
    build_model_with_cfg,
    default_cfg,
)
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, DropPath, SEModule, batch_norm, get_act_fn

default_cfgs = {
    f"efficientnet_b{i}": default_cfg(
        input_size=(3, r, r), crop_pct=c, first_conv="conv_stem",
        classifier="classifier")
    for i, (r, c) in enumerate([(224, 0.875), (240, 0.882), (260, 0.89),
                                (300, 0.904), (380, 0.922), (456, 0.934)])
}
default_cfgs["mobilenetv2_100"] = default_cfg(first_conv="conv_stem",
                                              classifier="classifier")
default_cfgs["mobilenetv3_large_100"] = default_cfg(
    first_conv="conv_stem", classifier="classifier", crop_pct=0.875)
default_cfgs["mnasnet_100"] = default_cfg(first_conv="conv_stem",
                                          classifier="classifier")

# EfficientNet-B0 stage table: (block, expand, kernel, stride, channels,
# repeats, se_ratio)
_EFFNET_B0 = (
    ("ds", 1, 3, 1, 16, 1, 0.25),
    ("ir", 6, 3, 2, 24, 2, 0.25),
    ("ir", 6, 5, 2, 40, 2, 0.25),
    ("ir", 6, 3, 2, 80, 3, 0.25),
    ("ir", 6, 5, 1, 112, 3, 0.25),
    ("ir", 6, 5, 2, 192, 4, 0.25),
    ("ir", 6, 3, 1, 320, 1, 0.25),
)

_MOBILENETV2 = (
    ("ds", 1, 3, 1, 16, 1, 0.0),
    ("ir", 6, 3, 2, 24, 2, 0.0),
    ("ir", 6, 3, 2, 32, 3, 0.0),
    ("ir", 6, 3, 2, 64, 4, 0.0),
    ("ir", 6, 3, 1, 96, 3, 0.0),
    ("ir", 6, 3, 2, 160, 3, 0.0),
    ("ir", 6, 3, 1, 320, 1, 0.0),
)

# MNASNet-B1 (no SE; the SE variant is mnasnet-a1)
_MNASNET = (
    ("ds", 1, 3, 1, 16, 1, 0.0),
    ("ir", 3, 3, 2, 24, 3, 0.0),
    ("ir", 3, 5, 2, 40, 3, 0.0),
    ("ir", 6, 5, 2, 80, 3, 0.0),
    ("ir", 6, 3, 1, 96, 2, 0.0),
    ("ir", 6, 5, 2, 192, 4, 0.0),
    ("ir", 6, 3, 1, 320, 1, 0.0),
)

# (width_mult, depth_mult, dropout) per b-index
_EFFNET_SCALE = [(1.0, 1.0, 0.2), (1.0, 1.1, 0.2), (1.1, 1.2, 0.3),
                 (1.2, 1.4, 0.3), (1.4, 1.8, 0.4), (1.6, 2.2, 0.4)]


def round_channels(c, multiplier=1.0, divisor=8, min_ch=None):
    """timm/TF channel rounding (efficientnet_builder.py)."""
    if not multiplier:
        return c
    c *= multiplier
    min_ch = min_ch or divisor
    new_c = max(min_ch, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


class MBConv(fnn.Module):
    """Inverted residual w/ optional SE (efficientnet_blocks.py MBConv)."""

    out_channels: int
    expand: float = 6.0
    kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    act: str = "swish"
    se_from_mid: bool = False     # mnv3: SE channels from mid, hard-sigmoid
    se_gate: str = "sigmoid"
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        in_ch = x.shape[-1]
        mid = round_channels(in_ch * self.expand, 1.0)
        shortcut = x

        y = x
        if self.expand != 1:
            y = Conv2d(mid, 1, dtype=self.dtype, name="conv_pw")(y)
            y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = act(y)
        y = Conv2d(mid, self.kernel_size, self.stride, None, 1, groups=mid,
                   dtype=self.dtype, name="conv_dw")(y)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if self.se_ratio > 0:
            if self.se_from_mid:  # mobilenetv3 (timm se w/ divisor rounding)
                rc = round_channels(mid * self.se_ratio, 1.0)
            else:  # efficientnet: relative to the block INPUT channels
                rc = max(1, int(in_ch * self.se_ratio))
            y = SEModule(mid, reduction_channels=rc,
                         act="relu" if self.se_from_mid else self.act,
                         gate=self.se_gate,
                         dtype=self.dtype, name="se")(y, training=training)
        y = Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv_pwl")(y)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.stride == 1 and in_ch == self.out_channels:
            if self.drop_path_rate > 0:
                y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
            y = y + shortcut
        return y


class DepthwiseSeparable(fnn.Module):
    """DS conv block (efficientnet_blocks.py DepthwiseSeparableConv)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    act: str = "swish"
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        in_ch = x.shape[-1]
        shortcut = x
        y = Conv2d(in_ch, self.kernel_size, self.stride, None, 1,
                   groups=in_ch, dtype=self.dtype, name="conv_dw")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if self.se_ratio > 0:
            y = SEModule(in_ch, reduction_channels=max(
                1, int(in_ch * self.se_ratio)), act=self.act,
                dtype=self.dtype, name="se")(y, training=training)
        y = Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv_pw")(y)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.stride == 1 and in_ch == self.out_channels:
            if self.drop_path_rate > 0:
                y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
            y = y + shortcut
        return y


class EfficientNet(fnn.Module):
    arch: Tuple = _EFFNET_B0
    width_mult: float = 1.0
    depth_mult: float = 1.0
    stem_size: int = 32
    num_features: int = 1280
    num_classes: int = 1000
    in_chans: int = 3
    act: str = "swish"
    drop_rate: float = 0.2
    drop_path_rate: float = 0.2
    fix_stem_head: bool = False  # mobilenet/mnasnet: don't scale stem/head
    se_from_mid: bool = False    # mobilenetv3 SE convention
    se_gate: str = "sigmoid"
    head_hidden: int = 0         # mnv3: Dense pre-classifier after pooling
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        stem = (self.stem_size if self.fix_stem_head
                else round_channels(self.stem_size, self.width_mult))
        x = Conv2d(stem, 3, 2, dtype=self.dtype, name="conv_stem")(x)
        x = batch_norm(x, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = act(x)

        total_blocks = sum(int(math.ceil(r * self.depth_mult))
                           for entry in self.arch for r in [entry[5]])
        idx = 0
        feats = []
        for si, entry in enumerate(self.arch):
            btype, expand, ks, stride, ch, repeats, se = entry[:7]
            stage_act = entry[7] if len(entry) > 7 else self.act
            out_ch = round_channels(ch, self.width_mult)
            reps = int(math.ceil(repeats * self.depth_mult))
            for bi in range(reps):
                dpr = self.drop_path_rate * idx / max(total_blocks - 1, 1)
                s = stride if bi == 0 else 1
                cls = DepthwiseSeparable if btype == "ds" else MBConv
                kw = dict(out_channels=out_ch, kernel_size=ks, stride=s,
                          se_ratio=se, act=stage_act, drop_path_rate=dpr,
                          dtype=self.dtype, axis_name=self.axis_name,
                          name=f"blocks_{si}_{bi}")
                if btype != "ds":
                    kw["expand"] = expand
                    kw["se_from_mid"] = self.se_from_mid
                    kw["se_gate"] = self.se_gate
                x = cls(**kw)(x, training)
                idx += 1
            feats.append(x)

        if self.features_only:
            return feats
        head = (self.num_features if self.fix_stem_head
                else round_channels(self.num_features, self.width_mult))
        x = Conv2d(head, 1, dtype=self.dtype, name="conv_head")(x)
        x = batch_norm(x, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = act(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.head_hidden:
            # mnv3: 1x1 conv (as Dense) after pooling, act, no BN
            x = fnn.Dense(self.head_hidden, dtype=self.dtype,
                          name="head_hidden")(x)
            x = act(x)
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype,
                          name="classifier")(x)
        return x


def _effnet(model_name, pretrained=False, b=0, **kwargs):
    wm, dm, drop = _EFFNET_SCALE[b]
    kwargs.setdefault("width_mult", wm)
    kwargs.setdefault("depth_mult", dm)
    kwargs.setdefault("drop_rate", drop)
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(EfficientNet, model_name,
                                default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


for _i in range(6):
    def _make(i):
        def entry(pretrained=False, **kwargs):
            return _effnet(f"efficientnet_b{i}", pretrained, b=i, **kwargs)
        entry.__name__ = f"efficientnet_b{i}"
        return entry
    globals()[f"efficientnet_b{_i}"] = register_model(_make(_i))


@register_model
def mobilenetv2_100(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        EfficientNet, "mobilenetv2_100", default_cfgs["mobilenetv2_100"],
        pretrained=pretrained, arch=_MOBILENETV2, act="relu6",
        fix_stem_head=True, num_features=1280, drop_path_rate=0.0, **kwargs)


# MobileNetV3-Large-100: per-block entries with explicit acts
_MOBILENETV3_LARGE = (
    ("ds", 1, 3, 1, 16, 1, 0.0, "relu"),
    ("ir", 4, 3, 2, 24, 1, 0.0, "relu"),
    ("ir", 3, 3, 1, 24, 1, 0.0, "relu"),
    ("ir", 3, 5, 2, 40, 1, 0.25, "relu"),
    ("ir", 3, 5, 1, 40, 2, 0.25, "relu"),
    ("ir", 6, 3, 2, 80, 1, 0.0, "hard_swish"),
    ("ir", 2.5, 3, 1, 80, 1, 0.0, "hard_swish"),
    ("ir", 2.3, 3, 1, 80, 2, 0.0, "hard_swish"),
    ("ir", 6, 3, 1, 112, 2, 0.25, "hard_swish"),
    ("ir", 6, 5, 2, 160, 1, 0.25, "hard_swish"),
    ("ir", 6, 5, 1, 160, 2, 0.25, "hard_swish"),
)


@register_model
def mobilenetv3_large_100(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        EfficientNet, "mobilenetv3_large_100",
        default_cfgs["mobilenetv3_large_100"], pretrained=pretrained,
        arch=_MOBILENETV3_LARGE, act="hard_swish", stem_size=16,
        fix_stem_head=True, num_features=960, head_hidden=1280,
        se_from_mid=True, se_gate="hard_sigmoid", drop_path_rate=0.0,
        **kwargs)


@register_model
def mnasnet_100(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        EfficientNet, "mnasnet_100", default_cfgs["mnasnet_100"],
        pretrained=pretrained, arch=_MNASNET, act="relu",
        fix_stem_head=True, num_features=1280, drop_path_rate=0.0, **kwargs)
