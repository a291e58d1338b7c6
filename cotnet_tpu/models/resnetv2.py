"""ResNetV2 / Big Transfer (reference models/resnetv2.py, 655 LoC).

Pre-activation (and non-preact) bottlenecks with a pluggable conv/norm pair:
BiT variants use weight-standardized convs + GroupNorm (resnetv2.py:146-147),
the resnetv2_50/101/152[d/t] variants use plain convs + BatchNorm
(resnetv2.py:592-648).  Stem types '', 'fixed', 'same', 'deep', 'tiered'
mirror create_resnetv2_stem (resnetv2.py:298-336); 'same' is what the ViT
hybrid backbones consume.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD,
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import (
    Conv2d, StdConv2d, avg_pool2d, batch_norm, get_act_fn, max_pool2d,
    max_pool2d_same, pad_same)


def _bit_cfg(**kw):
    base = dict(input_size=(3, 448, 448), crop_pct=1.0,
                mean=IMAGENET_INCEPTION_MEAN, std=IMAGENET_INCEPTION_STD,
                first_conv="stem.conv", classifier="head.fc")
    base.update(kw)
    return default_cfg(**base)


class _ConvNorm(fnn.Module):
    """conv -> norm[-act] unit with the family's conv/norm selection."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    std_conv: bool = True
    norm: str = "gn"          # 'gn' | 'bn' | 'none'
    apply_act: bool = True
    pad_mode: str = "symmetric"  # 'symmetric' | 'same'
    conv_eps: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size - 1) // 2
        if self.pad_mode == "same" and self.kernel_size > 1:
            x = pad_same(x, (self.kernel_size,) * 2, (self.stride,) * 2)
            pad = 0
        if self.std_conv:
            y = StdConv2d(self.features, self.kernel_size, self.stride, pad,
                          groups=self.groups, eps=self.conv_eps,
                          dtype=self.dtype, name="conv")(x)
        else:
            y = Conv2d(self.features, self.kernel_size, self.stride, pad,
                       groups=self.groups, dtype=self.dtype, name="conv")(x)
        if self.norm == "gn":
            y = fnn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                              name="norm")(y)
        elif self.norm == "bn":
            y = batch_norm(y, training, name="norm", dtype=self.dtype,
                           axis_name=self.axis_name)
        if self.apply_act:
            y = get_act_fn("relu")(y)
        return y


class PreActBottleneck(fnn.Module):
    """norm-conv x3 with shortcut off the pre-activated input
    (reference resnetv2.py:138-183)."""

    out_channels: int
    mid_channels: int
    stride: int = 1
    avg_down: bool = False
    std_conv: bool = True
    norm: str = "gn"
    pad_mode: str = "symmetric"
    conv_eps: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None

    def _norm(self, x, name, training):
        if self.norm == "gn":
            x = fnn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                              name=name)(x)
        else:
            x = batch_norm(x, training, name=name, dtype=self.dtype,
                           axis_name=self.axis_name)
        return get_act_fn("relu")(x)

    @fnn.compact
    def __call__(self, x, training: bool = False):
        def conv(feats, k, stride, pad, name, xin):
            if self.pad_mode == "same" and k > 1:
                xin = pad_same(xin, (k, k), (stride, stride))
                pad = 0
            if self.std_conv:
                return StdConv2d(feats, k, stride, pad, eps=self.conv_eps,
                                 dtype=self.dtype, name=name)(xin)
            return Conv2d(feats, k, stride, pad, dtype=self.dtype,
                          name=name)(xin)

        in_ch = x.shape[-1]
        y = self._norm(x, "norm1", training)
        if self.stride != 1 or in_ch != self.out_channels:
            sc = y
            if self.avg_down and self.stride > 1:
                sc = avg_pool2d(sc, 2, self.stride, ceil_mode=True,
                                count_include_pad=False)
            shortcut = conv(self.out_channels, 1,
                            1 if self.avg_down else self.stride, 0,
                            "downsample", sc)
        else:
            shortcut = x
        y = conv(self.mid_channels, 1, 1, 0, "conv1", y)
        y = self._norm(y, "norm2", training)
        y = conv(self.mid_channels, 3, self.stride, 1, "conv2", y)
        y = self._norm(y, "norm3", training)
        y = conv(self.out_channels, 1, 1, 0, "conv3", y)
        return y + shortcut


class Bottleneck(fnn.Module):
    """Non-preact variant (reference resnetv2.py:186-232)."""

    out_channels: int
    mid_channels: int
    stride: int = 1
    avg_down: bool = False
    std_conv: bool = True
    norm: str = "gn"
    pad_mode: str = "symmetric"
    conv_eps: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        in_ch = x.shape[-1]
        kw = dict(std_conv=self.std_conv, norm=self.norm, dtype=self.dtype,
                  axis_name=self.axis_name, pad_mode=self.pad_mode,
                  conv_eps=self.conv_eps)
        if self.stride != 1 or in_ch != self.out_channels:
            sc = x
            if self.avg_down and self.stride > 1:
                sc = avg_pool2d(sc, 2, self.stride, ceil_mode=True,
                                count_include_pad=False)
            shortcut = _ConvNorm(self.out_channels, 1,
                                 1 if self.avg_down else self.stride, 0,
                                 apply_act=False, name="downsample", **kw)(
                sc, training)
        else:
            shortcut = x
        y = _ConvNorm(self.mid_channels, 1, 1, 0, name="c1", **kw)(x, training)
        y = _ConvNorm(self.mid_channels, 3, self.stride, 1, name="c2", **kw)(
            y, training)
        y = _ConvNorm(self.out_channels, 1, 1, 0, apply_act=False, name="c3",
                      **kw)(y, training)
        return relu(y + shortcut)


class ResNetV2(fnn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    width_factor: int = 1
    num_classes: int = 1000
    in_chans: int = 3
    stem_type: str = "fixed"   # '' | 'fixed' | 'same' | 'deep' | 'tiered'
    preact: bool = True
    std_conv: bool = True
    norm: str = "gn"
    avg_down: bool = False
    stem_chs: int = 64
    drop_rate: float = 0.0
    conv_eps: float = 1e-5  # hybrid-ViT backbones use 1e-8 (vth.py:154)
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        wf = self.width_factor
        relu = get_act_fn("relu")
        if self.std_conv:
            def conv_cls(*a, **kw):
                return StdConv2d(*a, eps=self.conv_eps, **kw)
        else:
            conv_cls = Conv2d
        deep = self.stem_type in ("deep", "tiered")
        stem_out = self.stem_chs * wf
        pad_mode = "same" if "same" in self.stem_type else "symmetric"
        nkw = dict(std_conv=self.std_conv, norm=self.norm, dtype=self.dtype,
                   axis_name=self.axis_name, pad_mode=pad_mode,
                   conv_eps=self.conv_eps)

        if deep:
            if self.stem_type == "tiered":
                c1, c2 = 3 * stem_out // 8, stem_out // 2
            else:
                c1, c2 = stem_out // 2, stem_out // 2
            x = _ConvNorm(c1, 3, 2, name="stem_c1", **nkw)(x, training)
            x = _ConvNorm(c2, 3, 1, name="stem_c2", **nkw)(x, training)
            if self.preact:
                x = conv_cls(stem_out, 3, 1, 1, dtype=self.dtype,
                             name="stem_conv3")(x)
            else:
                x = _ConvNorm(stem_out, 3, 1, name="stem_c3", **nkw)(
                    x, training)
        else:
            if self.preact:
                if pad_mode == "same":
                    x = pad_same(x, (7, 7), (2, 2))
                    x = conv_cls(stem_out, 7, 2, 0, dtype=self.dtype,
                                 name="stem_conv")(x)
                else:
                    x = conv_cls(stem_out, 7, 2, 3, dtype=self.dtype,
                                 name="stem_conv")(x)
            else:
                x = _ConvNorm(stem_out, 7, 2, name="stem_c", **nkw)(
                    x, training)

        if "fixed" in self.stem_type:
            # BiT's fixed 'SAME' approximation: constant zero-pad 1 + valid
            # pool (resnetv2.py:324-327)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = max_pool2d(x, 3, 2, 0)
        elif "same" in self.stem_type:
            x = max_pool2d_same(x, 3, 2)
        else:
            x = max_pool2d(x, 3, 2, 1)

        block_cls = PreActBottleneck if self.preact else Bottleneck
        feats = []
        ch = 256
        for si, depth in enumerate(self.layers):
            for bi in range(depth):
                x = block_cls(
                    out_channels=ch * wf, mid_channels=ch * wf // 4,
                    stride=2 if (bi == 0 and si > 0) else 1,
                    avg_down=self.avg_down, std_conv=self.std_conv,
                    norm=self.norm, pad_mode=pad_mode,
                    conv_eps=self.conv_eps, dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"stage{si + 1}_block{bi + 1}")(x, training)
            feats.append(x)
            ch *= 2
        if self.features_only:
            return feats
        if self.preact:
            if self.norm == "gn":
                x = relu(fnn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       dtype=self.dtype, name="norm")(x))
            else:
                x = relu(batch_norm(x, training, name="norm",
                                    dtype=self.dtype,
                                    axis_name=self.axis_name))
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


# BiT rows: layers + width factor; _in21k rows set 21843 classes
# (reference resnetv2.py:480-590)
def _bit(layers, wf, num_classes=1000):
    return dict(layers=layers, width_factor=wf, stem_type="fixed",
                num_classes=num_classes)


# BN rows: plain conv + BatchNorm + torch-style stem (resnetv2.py:592-648)
def _bn(layers, stem_type="", avg_down=False):
    return dict(layers=layers, width_factor=1, stem_type=stem_type,
                std_conv=False, norm="bn", avg_down=avg_down)


RESNETV2_VARIANTS = {
    "resnetv2_50x1_bitm": _bit((3, 4, 6, 3), 1),
    "resnetv2_50x3_bitm": _bit((3, 4, 6, 3), 3),
    "resnetv2_101x1_bitm": _bit((3, 4, 23, 3), 1),
    "resnetv2_101x3_bitm": _bit((3, 4, 23, 3), 3),
    "resnetv2_152x2_bitm": _bit((3, 8, 36, 3), 2),
    "resnetv2_152x4_bitm": _bit((3, 8, 36, 3), 4),
    "resnetv2_50x1_bitm_in21k": _bit((3, 4, 6, 3), 1, 21843),
    "resnetv2_50x3_bitm_in21k": _bit((3, 4, 6, 3), 3, 21843),
    "resnetv2_101x1_bitm_in21k": _bit((3, 4, 23, 3), 1, 21843),
    "resnetv2_101x3_bitm_in21k": _bit((3, 4, 23, 3), 3, 21843),
    "resnetv2_152x2_bitm_in21k": _bit((3, 8, 36, 3), 2, 21843),
    "resnetv2_152x4_bitm_in21k": _bit((3, 8, 36, 3), 4, 21843),
    "resnetv2_50x1_bit_distilled": _bit((3, 4, 6, 3), 1),
    "resnetv2_152x2_bit_teacher": _bit((3, 8, 36, 3), 2),
    "resnetv2_152x2_bit_teacher_384": _bit((3, 8, 36, 3), 2),
    "resnetv2_50": _bn((3, 4, 6, 3)),
    "resnetv2_50d": _bn((3, 4, 6, 3), "deep", True),
    "resnetv2_50t": _bn((3, 4, 6, 3), "tiered", True),
    "resnetv2_101": _bn((3, 4, 23, 3)),
    "resnetv2_101d": _bn((3, 4, 23, 3), "deep", True),
    "resnetv2_152": _bn((3, 8, 36, 3)),
    "resnetv2_152d": _bn((3, 8, 36, 3), "deep", True),
}

default_cfgs = {}
for _name, _row in RESNETV2_VARIANTS.items():
    if "bit" in _name:
        _size = 384 if _name.endswith("_384") else (
            224 if _name.endswith(("_in21k", "distilled", "teacher")) else 448)
        default_cfgs[_name] = _bit_cfg(
            input_size=(3, _size, _size),
            crop_pct=1.0 if _size >= 384 else 0.875,
            num_classes=_row.get("num_classes", 1000))
    else:
        default_cfgs[_name] = default_cfg(
            interpolation="bicubic", first_conv="stem.conv",
            classifier="head.fc")

register_variant_table(__name__, _resnetv2, RESNETV2_VARIANTS)
