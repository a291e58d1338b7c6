"""EfficientNet superfamily: EfficientNet B0-B8/L2 (+ TF/AP/NS ports),
EdgeTPU (es/em/el), CondConv, Lite, MixNet S/M/L/XL/XXL, MnasNet A1/B1/small,
SE-MnasNet, FBNet-C, Single-Path-NAS, MobileNetV2 (+110d/120d/140),
MobileNetV3-Large.

Rebuilt from the reference's three-file machinery (models/efficientnet.py:1-1727,
models/efficientnet_builder.py:1-413, models/efficientnet_blocks.py:1-397) as a
single NHWC/Flax module driven by the same arch-string notation
(``ir_r2_k3_s2_e6_c24_se0.25`` — efficientnet_builder.py:36-152).  The string
tables and scaling constants are architecture *data* and therefore match the
reference; the execution model is jit-first Flax: no nn.Sequential, no
hooks, blocks are flat ``blocks_{stage}_{idx}`` modules so converted torch
checkpoints (``blocks.{stage}.{idx}.*``) map 1:1.

TPU notes: ``pad_type='same'`` maps to XLA's native SAME padding (identical
asymmetric semantics to the reference's Conv2dSame, conv2d_same.py:14-25) so
TF-ported variants cost nothing extra; CondConv routing is one shared sigmoid
Dense per block as in CondConvResidual (efficientnet_blocks.py:303-326).

The ``*_pruned`` variants: the reference adapts channel counts from
``models/pruned/<variant>.txt`` (helpers.py:248-251) but ships no such files,
so those entrypoints cannot build their pruned shape offline anywhere; we
register the keys, accept ``pruned=True``, and build the unpruned architecture
with a warning (reference behavior is a FileNotFoundError).
"""

from __future__ import annotations

import logging
import math
import os
import re
from typing import Any, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
    build_model_with_cfg,
    default_cfg,
    register_variant_table,
)
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, DropPath, SEModule, batch_norm, get_act_fn
from cotnet_tpu.nn.extra import CondConv2d, MixedConv2d

_logger = logging.getLogger(__name__)

BN_EPS_TF_DEFAULT = 1e-3          # reference efficientnet_blocks.py:19
BN_MOMENTUM_TF_DEFAULT = 0.99     # torch momentum 0.01 == flax/TF momentum .99


# ---------------------------------------------------------------------------
# channel / divisor math (reference efficientnet_blocks.py:67-81)
# ---------------------------------------------------------------------------

def make_divisible(v, divisor: int = 8, min_value: Optional[int] = None) -> int:
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def round_channels(channels, multiplier: float = 1.0, divisor: int = 8,
                   channel_min: Optional[int] = None) -> int:
    if not multiplier:
        return channels
    return make_divisible(channels * multiplier, divisor, channel_min)


# ---------------------------------------------------------------------------
# arch-string decoder (reference efficientnet_builder.py:29-210)
# ---------------------------------------------------------------------------

class BlockArgs(NamedTuple):
    block_type: str
    out_chs: int
    stride: int = 1
    dw_kernel_size: Union[int, Tuple[int, ...]] = 3
    exp_kernel_size: Union[int, Tuple[int, ...]] = 1
    pw_kernel_size: Union[int, Tuple[int, ...]] = 1
    exp_ratio: float = 1.0
    se_ratio: float = 0.0
    act: Optional[str] = None      # None -> model default
    noskip: bool = False
    pw_act: bool = False           # 'dsa' blocks
    num_experts: int = 0           # CondConv
    fake_in_chs: int = 0           # EdgeTPU stem mismatch hack


_ACT_CODES = {"re": "relu", "r6": "relu6", "hs": "hard_swish", "sw": "swish"}


def _parse_ksize(ss: str):
    if ss.isdigit():
        return int(ss)
    return tuple(int(k) for k in ss.split("."))


def _decode_block_str(block_str: str):
    """``ir_r2_k3_s2_e6_c24_se0.25`` -> (BlockArgs, repeats).

    Mirrors efficientnet_builder.py:36-152 (same option letters: r repeats,
    k dw-kernel, a exp-kernel, p pw-kernel, s stride, e expansion, c channels,
    se ratio, cc experts, fc fake-in-chs, n act, noskip)."""
    ops = block_str.split("_")
    block_type = ops[0]
    options: dict = {}
    noskip = False
    for op in ops[1:]:
        if op == "noskip":
            noskip = True
        elif op.startswith("n") and op[1:] in _ACT_CODES:
            options["n"] = _ACT_CODES[op[1:]]
        else:
            m = re.match(r"([a-z]+)(\d.*)", op)
            if m:
                options[m.group(1)] = m.group(2)

    act = options.get("n")
    num_repeat = int(options["r"])
    common = dict(out_chs=int(options["c"]), stride=int(options["s"]),
                  act=act, noskip=noskip,
                  se_ratio=float(options.get("se", 0.0)))
    if block_type == "ir":
        ba = BlockArgs(
            "ir",
            dw_kernel_size=_parse_ksize(options["k"]),
            exp_kernel_size=_parse_ksize(options.get("a", "1")),
            pw_kernel_size=_parse_ksize(options.get("p", "1")),
            exp_ratio=float(options["e"]),
            num_experts=int(options.get("cc", 0)),
            **common)
    elif block_type in ("ds", "dsa"):
        ba = BlockArgs(
            "ds",
            dw_kernel_size=_parse_ksize(options["k"]),
            pw_kernel_size=_parse_ksize(options.get("p", "1")),
            pw_act=block_type == "dsa",
            **dict(common, noskip=block_type == "dsa" or noskip))
    elif block_type == "er":
        ba = BlockArgs(
            "er",
            exp_kernel_size=_parse_ksize(options["k"]),
            pw_kernel_size=_parse_ksize(options.get("p", "1")),
            exp_ratio=float(options["e"]),
            fake_in_chs=int(options.get("fc", 0)),
            **common)
    elif block_type == "cn":
        ba = BlockArgs(
            "cn", dw_kernel_size=int(options["k"]), **common)
    else:
        raise ValueError(f"unknown block type {block_type!r}")
    return ba, num_repeat


def _scale_stage_depth(stack_args, repeats, depth_multiplier=1.0,
                       depth_trunc="ceil"):
    """Per-stage depth scaling (efficientnet_builder.py:155-190): scale the
    stage total, then allocate in reverse so first blocks scale last."""
    num_repeat = sum(repeats)
    if depth_trunc == "round":
        num_repeat_scaled = max(1, round(num_repeat * depth_multiplier))
    else:
        num_repeat_scaled = int(math.ceil(num_repeat * depth_multiplier))
    repeats_scaled = []
    for r in repeats[::-1]:
        rs = max(1, round(r / num_repeat * num_repeat_scaled))
        repeats_scaled.append(rs)
        num_repeat -= r
        num_repeat_scaled -= rs
    repeats_scaled = repeats_scaled[::-1]
    out = []
    for ba, rep in zip(stack_args, repeats_scaled):
        out.extend([ba] * rep)
    return tuple(out)


def decode_arch_def(arch_def, depth_multiplier=1.0, depth_trunc="ceil",
                    experts_multiplier=1, fix_first_last=False):
    """arch-string table -> tuple of stages, each a tuple of BlockArgs
    (efficientnet_builder.py:193-210)."""
    arch_args = []
    for stack_idx, block_strings in enumerate(arch_def):
        stack_args, repeats = [], []
        for block_str in block_strings:
            ba, rep = _decode_block_str(block_str)
            if ba.num_experts > 0 and experts_multiplier > 1:
                ba = ba._replace(num_experts=ba.num_experts * experts_multiplier)
            stack_args.append(ba)
            repeats.append(rep)
        dm = (1.0 if fix_first_last and stack_idx in (0, len(arch_def) - 1)
              else depth_multiplier)
        arch_args.append(_scale_stage_depth(stack_args, repeats, dm, depth_trunc))
    return tuple(arch_args)


# ---------------------------------------------------------------------------
# blocks (reference efficientnet_blocks.py)
# ---------------------------------------------------------------------------

def _conv(x, out_chs, kernel_size, stride=1, pad_type="", depthwise=False,
          num_experts=0, routing=None, dtype=None, name=None):
    """create_conv2d dispatch (reference layers/create_conv2d.py:11-31):
    tuple kernel -> MixedConv2d, num_experts>0 -> CondConv2d, else Conv2d."""
    if isinstance(kernel_size, tuple):
        return MixedConv2d(out_chs, kernel_size, stride, depthwise=depthwise,
                           pad_type=pad_type, dtype=dtype, name=name)(x)
    if num_experts > 0:
        pad = "same" if pad_type == "same" else None
        return CondConv2d(out_chs, kernel_size, stride, padding=pad,
                          groups=out_chs if depthwise else 1,
                          num_experts=num_experts, dtype=dtype,
                          name=name)(x, routing=routing)
    pad = "same" if pad_type == "same" else None
    groups = out_chs if depthwise else 1
    return Conv2d(out_chs, kernel_size, stride, pad, 1, groups,
                  dtype=dtype, name=name)(x)


class _BlockBase(fnn.Module):
    """Shared static config for all EfficientNet block types."""

    ba: BlockArgs
    out_chs: int                   # post-rounding
    stride: int                    # post "only first block strides"
    act: str
    pad_type: str = ""
    se_act: Optional[str] = None   # None -> block act
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    drop_path_rate: float = 0.0
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Any = None
    axis_name: Optional[str] = None

    def _bn(self, x, training, name):
        return batch_norm(x, training, name=name, momentum=self.bn_momentum,
                          epsilon=self.bn_eps, dtype=self.dtype,
                          axis_name=self.axis_name)

    def _se(self, y, in_chs, training):
        """SqueezeExcite (efficientnet_blocks.py:105-120): reduction channels
        from the block INPUT chs unless reduce_mid (resolve_se_args :45-57)."""
        if not self.ba.se_ratio or self.ba.se_ratio <= 0.0:
            return y
        base = y.shape[-1] if self.se_reduce_mid else in_chs
        rc = make_divisible(base * self.ba.se_ratio, self.se_divisor)
        return SEModule(y.shape[-1], reduction_channels=rc,
                        act=self.se_act or self.act, gate=self.se_gate,
                        dtype=self.dtype, name="se")(y, training=training)

    def _skip(self, y, shortcut, training):
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        return y + shortcut


class ConvBnActBlock(_BlockBase):
    """'cn' (efficientnet_blocks.py:123-144)."""

    @fnn.compact
    def __call__(self, x, training: bool = False):
        x = _conv(x, self.out_chs, self.ba.dw_kernel_size, self.stride,
                  self.pad_type, dtype=self.dtype, name="conv")
        x = self._bn(x, training, "bn1")
        return get_act_fn(self.act)(x)


class DepthwiseSeparable(_BlockBase):
    """'ds'/'dsa' (efficientnet_blocks.py:147-204)."""

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        in_chs = x.shape[-1]
        shortcut = x
        y = _conv(x, in_chs, self.ba.dw_kernel_size, self.stride,
                  self.pad_type, depthwise=True, dtype=self.dtype,
                  name="conv_dw")
        y = act(self._bn(y, training, "bn1"))
        y = self._se(y, in_chs, training)
        y = _conv(y, self.out_chs, self.ba.pw_kernel_size, 1, self.pad_type,
                  dtype=self.dtype, name="conv_pw")
        y = self._bn(y, training, "bn2")
        if self.ba.pw_act:
            y = act(y)
        if self.stride == 1 and in_chs == self.out_chs and not self.ba.noskip:
            y = self._skip(y, shortcut, training)
        return y


class InvertedResidual(_BlockBase):
    """'ir' incl. CondConv routing (efficientnet_blocks.py:207-332)."""

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        in_chs = x.shape[-1]
        mid_chs = make_divisible(in_chs * self.ba.exp_ratio)
        shortcut = x
        routing = None
        if self.ba.num_experts > 0:
            # one routing vector shared by all three convs
            # (CondConvResidual, efficientnet_blocks.py:301-326)
            routing = jax.nn.sigmoid(
                fnn.Dense(self.ba.num_experts, dtype=self.dtype,
                          name="routing_fn")(jnp.mean(x, axis=(1, 2))))
        y = _conv(x, mid_chs, self.ba.exp_kernel_size, 1, self.pad_type,
                  num_experts=self.ba.num_experts, routing=routing,
                  dtype=self.dtype, name="conv_pw")
        y = act(self._bn(y, training, "bn1"))
        y = _conv(y, mid_chs, self.ba.dw_kernel_size, self.stride,
                  self.pad_type, depthwise=True,
                  num_experts=self.ba.num_experts, routing=routing,
                  dtype=self.dtype, name="conv_dw")
        y = act(self._bn(y, training, "bn2"))
        y = self._se(y, in_chs, training)
        y = _conv(y, self.out_chs, self.ba.pw_kernel_size, 1, self.pad_type,
                  num_experts=self.ba.num_experts, routing=routing,
                  dtype=self.dtype, name="conv_pwl")
        y = self._bn(y, training, "bn3")
        if in_chs == self.out_chs and self.stride == 1 and not self.ba.noskip:
            y = self._skip(y, shortcut, training)
        return y


class EdgeResidual(_BlockBase):
    """'er' — full k×k expansion conv, stride on the pointwise-linear
    (efficientnet_blocks.py:335-397)."""

    fake_in_chs: int = 0           # post-rounding

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        in_chs = x.shape[-1]
        mid_chs = make_divisible(
            (self.fake_in_chs or in_chs) * self.ba.exp_ratio)
        shortcut = x
        y = _conv(x, mid_chs, self.ba.exp_kernel_size, 1, self.pad_type,
                  dtype=self.dtype, name="conv_exp")
        y = act(self._bn(y, training, "bn1"))
        y = self._se(y, in_chs, training)
        y = _conv(y, self.out_chs, self.ba.pw_kernel_size, self.stride,
                  self.pad_type, dtype=self.dtype, name="conv_pwl")
        y = self._bn(y, training, "bn2")
        if in_chs == self.out_chs and self.stride == 1 and not self.ba.noskip:
            y = self._skip(y, shortcut, training)
        return y


_BLOCK_CLS = {"ir": InvertedResidual, "ds": DepthwiseSeparable,
              "er": EdgeResidual, "cn": ConvBnActBlock}


# ---------------------------------------------------------------------------
# model (reference efficientnet.py:316-395)
# ---------------------------------------------------------------------------

class EfficientNet(fnn.Module):
    block_args: Tuple[Tuple[BlockArgs, ...], ...]
    num_classes: int = 1000
    num_features: int = 1280
    stem_size: int = 32
    channel_multiplier: float = 1.0
    channel_divisor: int = 8
    channel_min: Optional[int] = None
    fix_stem: bool = False
    pad_type: str = ""
    act: str = "relu"
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    se_act: Optional[str] = None
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    head_hidden: int = 0           # mobilenetv3: Dense after pooling
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    def _round(self, chs):
        return round_channels(chs, self.channel_multiplier,
                              self.channel_divisor, self.channel_min)

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        stem = self.stem_size if self.fix_stem else self._round(self.stem_size)
        pad = "same" if self.pad_type == "same" else None
        x = Conv2d(stem, 3, 2, pad, dtype=self.dtype, name="conv_stem")(x)
        x = batch_norm(x, training, name="bn1", momentum=self.bn_momentum,
                       epsilon=self.bn_eps, dtype=self.dtype,
                       axis_name=self.axis_name)
        x = act(x)

        total_blocks = sum(len(s) for s in self.block_args)
        feats = []
        if self.block_args[0][0].stride > 1:
            feats.append(x)        # stem is the stride-2 feature
        idx = 0
        for si, stack in enumerate(self.block_args):
            for bi, ba in enumerate(stack):
                cls = _BLOCK_CLS[ba.block_type]
                kw = dict(
                    ba=ba, out_chs=self._round(ba.out_chs),
                    stride=ba.stride if bi == 0 else 1,
                    act=ba.act or self.act, pad_type=self.pad_type,
                    se_act=self.se_act, se_reduce_mid=self.se_reduce_mid,
                    se_divisor=self.se_divisor, se_gate=self.se_gate,
                    drop_path_rate=self.drop_path_rate * idx / total_blocks,
                    bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"blocks_{si}_{bi}")
                if ba.block_type == "er" and ba.fake_in_chs:
                    kw["fake_in_chs"] = self._round(ba.fake_in_chs)
                x = cls(**kw)(x, training)
                idx += 1
            last = si + 1 == len(self.block_args)
            if last or self.block_args[si + 1][0].stride > 1:
                feats.append(x)
        if self.features_only:
            return feats

        x = Conv2d(self.num_features, 1, 1, pad, dtype=self.dtype,
                   name="conv_head")(x)
        x = batch_norm(x, training, name="bn2", momentum=self.bn_momentum,
                       epsilon=self.bn_eps, dtype=self.dtype,
                       axis_name=self.axis_name)
        x = act(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.head_hidden:
            x = fnn.Dense(self.head_hidden, dtype=self.dtype,
                          name="head_hidden")(x)
            x = act(x)
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype,
                          name="classifier")(x)
        return x


# ---------------------------------------------------------------------------
# generators (reference efficientnet.py:472-876); arch strings are data
# ---------------------------------------------------------------------------

def _resolve_bn_args(kwargs):
    """bn_tf/bn_momentum/bn_eps knobs (efficientnet_blocks.py:27-35); torch
    momentum m == flax momentum 1-m."""
    out = {}
    if kwargs.pop("bn_tf", False):
        out = {"bn_eps": BN_EPS_TF_DEFAULT, "bn_momentum": BN_MOMENTUM_TF_DEFAULT}
    m = kwargs.pop("bn_momentum", None)
    if m is not None:
        out["bn_momentum"] = 1.0 - m
    e = kwargs.pop("bn_eps", None)
    if e is not None:
        out["bn_eps"] = e
    return out


def _build(variant, pretrained, pruned=False, **model_kwargs):
    model_kwargs.update(_resolve_bn_args(model_kwargs))
    model_kwargs.pop("in_chans", None)
    if pruned:
        path = os.path.join(os.path.dirname(__file__), "pruned",
                            variant + ".txt")
        if os.path.exists(path):
            raise NotImplementedError(
                f"pruned channel spec {path} found but per-layer pruning is "
                "not wired; see models/pruned README")
        _logger.warning(
            "%s: reference prune spec models/pruned/%s.txt is not shipped by "
            "the upstream repo; building the unpruned architecture "
            "(reference helpers.py:248-251 would raise FileNotFoundError)",
            variant, variant)
    return build_model_with_cfg(EfficientNet, variant, default_cfgs[variant],
                                pretrained=pretrained, **model_kwargs)


_EFFNET_ARCH = (
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)


def _gen_efficientnet(variant, pretrained=False, channel_multiplier=1.0,
                      depth_multiplier=1.0, **kwargs):
    """reference efficientnet.py:667-710."""
    kwargs.setdefault("act", "swish")
    return _build(
        variant, pretrained,
        block_args=decode_arch_def(_EFFNET_ARCH, depth_multiplier),
        num_features=round_channels(1280, channel_multiplier, 8, None),
        stem_size=32, channel_multiplier=channel_multiplier, **kwargs)


def _gen_efficientnet_edge(variant, pretrained=False, channel_multiplier=1.0,
                           depth_multiplier=1.0, **kwargs):
    """reference efficientnet.py:713-739."""
    arch = (
        ("er_r1_k3_s1_e4_c24_fc24_noskip",),
        ("er_r2_k3_s2_e8_c32",),
        ("er_r4_k3_s2_e8_c48",),
        ("ir_r5_k5_s2_e8_c96",),
        ("ir_r4_k5_s1_e8_c144",),
        ("ir_r2_k5_s2_e8_c192",),
    )
    kwargs.setdefault("act", "relu")
    return _build(
        variant, pretrained,
        block_args=decode_arch_def(arch, depth_multiplier),
        num_features=round_channels(1280, channel_multiplier, 8, None),
        stem_size=32, channel_multiplier=channel_multiplier, **kwargs)


def _gen_efficientnet_condconv(variant, pretrained=False,
                               channel_multiplier=1.0, depth_multiplier=1.0,
                               experts_multiplier=1, **kwargs):
    """reference efficientnet.py:742-769."""
    arch = (
        ("ds_r1_k3_s1_e1_c16_se0.25",),
        ("ir_r2_k3_s2_e6_c24_se0.25",),
        ("ir_r2_k5_s2_e6_c40_se0.25",),
        ("ir_r3_k3_s2_e6_c80_se0.25",),
        ("ir_r3_k5_s1_e6_c112_se0.25_cc4",),
        ("ir_r4_k5_s2_e6_c192_se0.25_cc4",),
        ("ir_r1_k3_s1_e6_c320_se0.25_cc4",),
    )
    kwargs.setdefault("act", "swish")
    return _build(
        variant, pretrained,
        block_args=decode_arch_def(arch, depth_multiplier,
                                   experts_multiplier=experts_multiplier),
        num_features=round_channels(1280, channel_multiplier, 8, None),
        stem_size=32, channel_multiplier=channel_multiplier, **kwargs)


def _gen_efficientnet_lite(variant, pretrained=False, channel_multiplier=1.0,
                           depth_multiplier=1.0, **kwargs):
    """reference efficientnet.py:772-810 — no SE, relu6, fixed stem/head."""
    arch = (
        ("ds_r1_k3_s1_e1_c16",),
        ("ir_r2_k3_s2_e6_c24",),
        ("ir_r2_k5_s2_e6_c40",),
        ("ir_r3_k3_s2_e6_c80",),
        ("ir_r3_k5_s1_e6_c112",),
        ("ir_r4_k5_s2_e6_c192",),
        ("ir_r1_k3_s1_e6_c320",),
    )
    kwargs.setdefault("act", "relu6")
    return _build(
        variant, pretrained,
        block_args=decode_arch_def(arch, depth_multiplier,
                                   fix_first_last=True),
        num_features=1280, stem_size=32, fix_stem=True,
        channel_multiplier=channel_multiplier, **kwargs)


def _gen_mnasnet_a1(variant, pretrained=False, channel_multiplier=1.0,
                    **kwargs):
    """reference efficientnet.py:472-505."""
    arch = (
        ("ds_r1_k3_s1_e1_c16_noskip",),
        ("ir_r2_k3_s2_e6_c24",),
        ("ir_r3_k5_s2_e3_c40_se0.25",),
        ("ir_r4_k3_s2_e6_c80",),
        ("ir_r2_k3_s1_e6_c112_se0.25",),
        ("ir_r3_k5_s2_e6_c160_se0.25",),
        ("ir_r1_k3_s1_e6_c320",),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), stem_size=32,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_mnasnet_b1(variant, pretrained=False, channel_multiplier=1.0,
                    **kwargs):
    """reference efficientnet.py:508-541."""
    arch = (
        ("ds_r1_k3_s1_c16_noskip",),
        ("ir_r3_k3_s2_e3_c24",),
        ("ir_r3_k5_s2_e3_c40",),
        ("ir_r3_k5_s2_e6_c80",),
        ("ir_r2_k3_s1_e6_c96",),
        ("ir_r4_k5_s2_e6_c192",),
        ("ir_r1_k3_s1_e6_c320_noskip",),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), stem_size=32,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_mnasnet_small(variant, pretrained=False, channel_multiplier=1.0,
                       **kwargs):
    """reference efficientnet.py:544-570."""
    arch = (
        ("ds_r1_k3_s1_c8",),
        ("ir_r1_k3_s2_e3_c16",),
        ("ir_r2_k3_s2_e6_c16",),
        ("ir_r4_k5_s2_e6_c32_se0.25",),
        ("ir_r3_k3_s1_e6_c32_se0.25",),
        ("ir_r3_k5_s2_e6_c88_se0.25",),
        ("ir_r1_k3_s1_e6_c144",),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), stem_size=8,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_mobilenet_v2(variant, pretrained=False, channel_multiplier=1.0,
                      depth_multiplier=1.0, fix_stem_head=False, **kwargs):
    """reference efficientnet.py:573-599."""
    arch = (
        ("ds_r1_k3_s1_c16",),
        ("ir_r2_k3_s2_e6_c24",),
        ("ir_r3_k3_s2_e6_c32",),
        ("ir_r4_k3_s2_e6_c64",),
        ("ir_r3_k3_s1_e6_c96",),
        ("ir_r3_k3_s2_e6_c160",),
        ("ir_r1_k3_s1_e6_c320",),
    )
    kwargs.setdefault("act", "relu6")
    return _build(
        variant, pretrained,
        block_args=decode_arch_def(arch, depth_multiplier,
                                   fix_first_last=fix_stem_head),
        num_features=(1280 if fix_stem_head
                      else round_channels(1280, channel_multiplier, 8, None)),
        stem_size=32, fix_stem=fix_stem_head,
        channel_multiplier=channel_multiplier, **kwargs)


def _gen_fbnetc(variant, pretrained=False, channel_multiplier=1.0, **kwargs):
    """reference efficientnet.py:602-629."""
    arch = (
        ("ir_r1_k3_s1_e1_c16",),
        ("ir_r1_k3_s2_e6_c24", "ir_r2_k3_s1_e1_c24"),
        ("ir_r1_k5_s2_e6_c32", "ir_r1_k5_s1_e3_c32", "ir_r1_k5_s1_e6_c32",
         "ir_r1_k3_s1_e6_c32"),
        ("ir_r1_k5_s2_e6_c64", "ir_r1_k5_s1_e3_c64", "ir_r2_k5_s1_e6_c64"),
        ("ir_r3_k5_s1_e6_c112", "ir_r1_k5_s1_e3_c112"),
        ("ir_r4_k5_s2_e6_c184",),
        ("ir_r1_k3_s1_e6_c352",),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), stem_size=16,
                  num_features=1984,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_spnasnet(variant, pretrained=False, channel_multiplier=1.0, **kwargs):
    """reference efficientnet.py:632-664."""
    arch = (
        ("ds_r1_k3_s1_c16_noskip",),
        ("ir_r3_k3_s2_e3_c24",),
        ("ir_r1_k5_s2_e6_c40", "ir_r3_k3_s1_e3_c40"),
        ("ir_r1_k5_s2_e6_c80", "ir_r3_k3_s1_e3_c80"),
        ("ir_r1_k5_s1_e6_c96", "ir_r3_k5_s1_e3_c96"),
        ("ir_r4_k5_s2_e6_c192",),
        ("ir_r1_k3_s1_e6_c320_noskip",),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), stem_size=32,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_mixnet_s(variant, pretrained=False, channel_multiplier=1.0,
                  **kwargs):
    """reference efficientnet.py:813-843."""
    arch = (
        ("ds_r1_k3_s1_e1_c16",),
        ("ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24"),
        ("ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw",
         "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
        ("ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw",
         "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw"),
        ("ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
         "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
        ("ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
         "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), num_features=1536,
                  stem_size=16, channel_multiplier=channel_multiplier,
                  **kwargs)


def _gen_mixnet_m(variant, pretrained=False, channel_multiplier=1.0,
                  depth_multiplier=1.0, **kwargs):
    """reference efficientnet.py:846-876."""
    arch = (
        ("ds_r1_k3_s1_e1_c24",),
        ("ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32"),
        ("ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw",
         "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
        ("ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw",
         "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e6_c80_se0.25_nsw"),
        ("ir_r1_k3_s1_e6_c120_se0.5_nsw",
         "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
        ("ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw",
         "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
    )
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch, depth_multiplier,
                                             depth_trunc="round"),
                  num_features=1536, stem_size=24,
                  channel_multiplier=channel_multiplier, **kwargs)


def _gen_mobilenet_v3_large(variant, pretrained=False, channel_multiplier=1.0,
                            **kwargs):
    """MobileNetV3-Large (not a reference registry key; kept as a useful
    extra on the same builder)."""
    arch = (
        ("ds_r1_k3_s1_c16_nre",),
        ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
        ("ir_r1_k5_s2_e3_c40_se0.25_nre", "ir_r2_k5_s1_e3_c40_se0.25_nre"),
        ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
        ("ir_r2_k3_s1_e6_c112_se0.25",),
        ("ir_r1_k5_s2_e6_c160_se0.25", "ir_r2_k5_s1_e6_c160_se0.25"),
    )
    kwargs.setdefault("act", "hard_swish")
    return _build(variant, pretrained,
                  block_args=decode_arch_def(arch), num_features=960,
                  head_hidden=1280, stem_size=16, fix_stem=True,
                  se_act="relu", se_reduce_mid=True, se_divisor=8,
                  se_gate="hard_sigmoid",
                  channel_multiplier=channel_multiplier, **kwargs)


# ---------------------------------------------------------------------------
# default_cfgs (reference efficientnet.py:44-311) — pure data
# ---------------------------------------------------------------------------

def _cfg(size=224, crop=0.875, pool=7, **kw):
    return default_cfg(input_size=(3, size, size), crop_pct=crop,
                       pool_size=(pool, pool), first_conv="conv_stem",
                       classifier="classifier", **kw)


_INCEPTION = dict(mean=IMAGENET_INCEPTION_MEAN, std=IMAGENET_INCEPTION_STD)

# (size, crop_pct, pool) per EfficientNet b-index; l2 and l2_475 keyed by str
_BSIZE = {0: (224, 0.875, 7), 1: (240, 0.882, 8), 2: (260, 0.890, 9),
          3: (300, 0.904, 10), 4: (380, 0.922, 12), 5: (456, 0.934, 15),
          6: (528, 0.942, 17), 7: (600, 0.949, 19), 8: (672, 0.954, 21),
          "l2": (800, 0.961, 25), "l2_475": (475, 0.936, 15)}
# (channel_multiplier, depth_multiplier) per b-index
_BSCALE = {0: (1.0, 1.0), 1: (1.0, 1.1), 2: (1.1, 1.2), 3: (1.2, 1.4),
           4: (1.4, 1.8), 5: (1.6, 2.2), 6: (1.8, 2.6), 7: (2.0, 3.1),
           8: (2.2, 3.6), "l2": (4.3, 5.3)}
_BDROP = {0: 0.2, 1: 0.2, 2: 0.3, 3: 0.3, 4: 0.4, 5: 0.4, 6: 0.5, 7: 0.5,
          8: 0.5, "l2": 0.5}

default_cfgs = {
    "mnasnet_050": _cfg(), "mnasnet_075": _cfg(), "mnasnet_100": _cfg(),
    "mnasnet_140": _cfg(), "semnasnet_050": _cfg(), "semnasnet_075": _cfg(),
    "semnasnet_100": _cfg(), "semnasnet_140": _cfg(), "mnasnet_small": _cfg(),
    "mobilenetv2_100": _cfg(), "mobilenetv2_110d": _cfg(),
    "mobilenetv2_120d": _cfg(), "mobilenetv2_140": _cfg(),
    "mobilenetv3_large_100": _cfg(),
    "fbnetc_100": _cfg(interpolation="bilinear"),
    "spnasnet_100": _cfg(interpolation="bilinear"),
    "efficientnet_b2a": _cfg(288, 1.0, 9),
    "efficientnet_b3a": _cfg(320, 1.0, 10),
    "efficientnet_es": _cfg(), "efficientnet_em": _cfg(240, 0.882, 8),
    "efficientnet_el": _cfg(300, 0.904, 10),
    "efficientnet_cc_b0_4e": _cfg(), "efficientnet_cc_b0_8e": _cfg(),
    "efficientnet_cc_b1_8e": _cfg(240, 0.882, 8),
    "tf_efficientnet_es": _cfg(**_INCEPTION),
    "tf_efficientnet_em": _cfg(240, 0.882, 8, **_INCEPTION),
    "tf_efficientnet_el": _cfg(300, 0.904, 10, **_INCEPTION),
    "tf_efficientnet_cc_b0_4e": _cfg(**_INCEPTION),
    "tf_efficientnet_cc_b0_8e": _cfg(**_INCEPTION),
    "tf_efficientnet_cc_b1_8e": _cfg(240, 0.882, 8, **_INCEPTION),
    "mixnet_s": _cfg(), "mixnet_m": _cfg(), "mixnet_l": _cfg(),
    "mixnet_xl": _cfg(), "mixnet_xxl": _cfg(),
    "tf_mixnet_s": _cfg(), "tf_mixnet_m": _cfg(), "tf_mixnet_l": _cfg(),
    "tf_efficientnet_lite3": _cfg(300, 0.904, 10, interpolation="bilinear",
                                  **_INCEPTION),
    "tf_efficientnet_lite4": _cfg(380, 0.920, 12, interpolation="bilinear",
                                  **_INCEPTION),
}
for _i in range(9):
    _s = _BSIZE[_i]
    default_cfgs[f"efficientnet_b{_i}"] = _cfg(*_s)
    default_cfgs[f"tf_efficientnet_b{_i}"] = _cfg(*_s)
    default_cfgs[f"tf_efficientnet_b{_i}_ap"] = _cfg(*_s, **_INCEPTION)
    if _i <= 7:
        default_cfgs[f"tf_efficientnet_b{_i}_ns"] = _cfg(*_s)
    if 1 <= _i <= 3:
        default_cfgs[f"efficientnet_b{_i}_pruned"] = _cfg(*_s, **_INCEPTION)
default_cfgs["efficientnet_l2"] = _cfg(*_BSIZE["l2"])
default_cfgs["tf_efficientnet_l2_ns"] = _cfg(800, 0.96, 25)
default_cfgs["tf_efficientnet_l2_ns_475"] = _cfg(*_BSIZE["l2_475"])
for _i in range(5):
    _s = _BSIZE[_i]
    default_cfgs[f"efficientnet_lite{_i}"] = _cfg(*_s)
    if _i <= 2:
        default_cfgs[f"tf_efficientnet_lite{_i}"] = _cfg(*_s, **_INCEPTION)


# ---------------------------------------------------------------------------
# entrypoints (reference efficientnet.py:879-1727) — one table row each
# ---------------------------------------------------------------------------

_GEN_FNS = {
    "effnet": _gen_efficientnet, "edge": _gen_efficientnet_edge,
    "condconv": _gen_efficientnet_condconv, "lite": _gen_efficientnet_lite,
    "mnasnet_a1": _gen_mnasnet_a1, "mnasnet_b1": _gen_mnasnet_b1,
    "mnasnet_small": _gen_mnasnet_small, "mobilenetv2": _gen_mobilenet_v2,
    "fbnetc": _gen_fbnetc, "spnasnet": _gen_spnasnet,
    "mixnet_s": _gen_mixnet_s, "mixnet_m": _gen_mixnet_m,
    "mobilenetv3": _gen_mobilenet_v3_large,
}

_TF = dict(bn_eps=BN_EPS_TF_DEFAULT, pad_type="same")


def _effnet_entry(name, pretrained=False, gen="effnet", **kwargs):
    return _GEN_FNS[gen](name, pretrained=pretrained, **kwargs)


def _b(i, **extra):
    cm, dm = _BSCALE[i]
    return dict(gen="effnet", channel_multiplier=cm, depth_multiplier=dm,
                drop_rate=_BDROP[i], **extra)


EFFICIENTNET_VARIANTS = {
    # MNASNet family (reference efficientnet.py:879-955)
    "mnasnet_050": dict(gen="mnasnet_b1", channel_multiplier=0.5),
    "mnasnet_075": dict(gen="mnasnet_b1", channel_multiplier=0.75),
    "mnasnet_100": dict(gen="mnasnet_b1", channel_multiplier=1.0),
    "mnasnet_140": dict(gen="mnasnet_b1", channel_multiplier=1.4),
    "semnasnet_050": dict(gen="mnasnet_a1", channel_multiplier=0.5),
    "semnasnet_075": dict(gen="mnasnet_a1", channel_multiplier=0.75),
    "semnasnet_100": dict(gen="mnasnet_a1", channel_multiplier=1.0),
    "semnasnet_140": dict(gen="mnasnet_a1", channel_multiplier=1.4),
    "mnasnet_small": dict(gen="mnasnet_small", channel_multiplier=1.0),
    # MobileNetV2 (reference efficientnet.py:958-995)
    "mobilenetv2_100": dict(gen="mobilenetv2", channel_multiplier=1.0),
    "mobilenetv2_140": dict(gen="mobilenetv2", channel_multiplier=1.4),
    "mobilenetv2_110d": dict(gen="mobilenetv2", channel_multiplier=1.1,
                             depth_multiplier=1.2, fix_stem_head=True),
    "mobilenetv2_120d": dict(gen="mobilenetv2", channel_multiplier=1.2,
                             depth_multiplier=1.4, fix_stem_head=True),
    "mobilenetv3_large_100": dict(gen="mobilenetv3", channel_multiplier=1.0),
    # FBNet / SPNAS (reference efficientnet.py:998-1017)
    "fbnetc_100": dict(gen="fbnetc", channel_multiplier=1.0),
    "spnasnet_100": dict(gen="spnasnet", channel_multiplier=1.0),
    # EfficientNet core + a-variants + L2 (reference :1020-1180)
    **{f"efficientnet_b{i}": _b(i) for i in range(9)},
    "efficientnet_b2a": _b(2), "efficientnet_b3a": _b(3),
    "efficientnet_l2": _b("l2"),
    # EdgeTPU (reference :1183-1205)
    "efficientnet_es": dict(gen="edge", channel_multiplier=1.0,
                            depth_multiplier=1.0),
    "efficientnet_em": dict(gen="edge", channel_multiplier=1.0,
                            depth_multiplier=1.1),
    "efficientnet_el": dict(gen="edge", channel_multiplier=1.2,
                            depth_multiplier=1.4),
    # CondConv (reference :1208-1237)
    "efficientnet_cc_b0_4e": dict(gen="condconv", channel_multiplier=1.0,
                                  depth_multiplier=1.0),
    "efficientnet_cc_b0_8e": dict(gen="condconv", channel_multiplier=1.0,
                                  depth_multiplier=1.0, experts_multiplier=2),
    "efficientnet_cc_b1_8e": dict(gen="condconv", channel_multiplier=1.0,
                                  depth_multiplier=1.1, experts_multiplier=2),
    # Lite (reference :1240-1289)
    "efficientnet_lite0": dict(gen="lite", channel_multiplier=1.0,
                               depth_multiplier=1.0, drop_rate=0.2),
    "efficientnet_lite1": dict(gen="lite", channel_multiplier=1.0,
                               depth_multiplier=1.1, drop_rate=0.2),
    "efficientnet_lite2": dict(gen="lite", channel_multiplier=1.1,
                               depth_multiplier=1.2, drop_rate=0.3),
    "efficientnet_lite3": dict(gen="lite", channel_multiplier=1.2,
                               depth_multiplier=1.4, drop_rate=0.3),
    "efficientnet_lite4": dict(gen="lite", channel_multiplier=1.4,
                               depth_multiplier=1.8, drop_rate=0.4),
    # pruned (reference :1292-1329; see module docstring)
    "efficientnet_b1_pruned": _b(1, pruned=True, **_TF),
    "efficientnet_b2_pruned": _b(2, pruned=True, **_TF),
    "efficientnet_b3_pruned": _b(3, pruned=True, **_TF),
    # TF ports (reference :1332-1560): TF bn eps + SAME padding
    **{f"tf_efficientnet_b{i}": _b(i, **_TF) for i in range(9)},
    **{f"tf_efficientnet_b{i}_ap": _b(i, **_TF) for i in range(9)},
    **{f"tf_efficientnet_b{i}_ns": _b(i, **_TF) for i in range(8)},
    "tf_efficientnet_l2_ns": _b("l2", **_TF),
    "tf_efficientnet_l2_ns_475": _b("l2", **_TF),
    "tf_efficientnet_es": dict(gen="edge", channel_multiplier=1.0,
                               depth_multiplier=1.0, **_TF),
    "tf_efficientnet_em": dict(gen="edge", channel_multiplier=1.0,
                               depth_multiplier=1.1, **_TF),
    "tf_efficientnet_el": dict(gen="edge", channel_multiplier=1.2,
                               depth_multiplier=1.4, **_TF),
    "tf_efficientnet_cc_b0_4e": dict(gen="condconv", channel_multiplier=1.0,
                                     depth_multiplier=1.0, **_TF),
    "tf_efficientnet_cc_b0_8e": dict(gen="condconv", channel_multiplier=1.0,
                                     depth_multiplier=1.0,
                                     experts_multiplier=2, **_TF),
    "tf_efficientnet_cc_b1_8e": dict(gen="condconv", channel_multiplier=1.0,
                                     depth_multiplier=1.1,
                                     experts_multiplier=2, **_TF),
    "tf_efficientnet_lite0": dict(gen="lite", channel_multiplier=1.0,
                                  depth_multiplier=1.0, **_TF),
    "tf_efficientnet_lite1": dict(gen="lite", channel_multiplier=1.0,
                                  depth_multiplier=1.1, **_TF),
    "tf_efficientnet_lite2": dict(gen="lite", channel_multiplier=1.1,
                                  depth_multiplier=1.2, **_TF),
    "tf_efficientnet_lite3": dict(gen="lite", channel_multiplier=1.2,
                                  depth_multiplier=1.4, **_TF),
    "tf_efficientnet_lite4": dict(gen="lite", channel_multiplier=1.4,
                                  depth_multiplier=1.8, **_TF),
    # MixNet (reference :1650-1727)
    "mixnet_s": dict(gen="mixnet_s", channel_multiplier=1.0),
    "mixnet_m": dict(gen="mixnet_m", channel_multiplier=1.0),
    "mixnet_l": dict(gen="mixnet_m", channel_multiplier=1.3),
    "mixnet_xl": dict(gen="mixnet_m", channel_multiplier=1.6,
                      depth_multiplier=1.2),
    "mixnet_xxl": dict(gen="mixnet_m", channel_multiplier=2.4,
                       depth_multiplier=1.3),
    "tf_mixnet_s": dict(gen="mixnet_s", channel_multiplier=1.0, **_TF),
    "tf_mixnet_m": dict(gen="mixnet_m", channel_multiplier=1.0, **_TF),
    "tf_mixnet_l": dict(gen="mixnet_m", channel_multiplier=1.3, **_TF),
}

register_variant_table(__name__, _effnet_entry, EFFICIENTNET_VARIANTS)


@register_model
def mnasnet_b1(pretrained=False, **kwargs):
    """Alias of mnasnet_100 (reference efficientnet.py:898-901)."""
    return mnasnet_100(pretrained, **kwargs)  # noqa: F821 (table-generated)


@register_model
def mnasnet_a1(pretrained=False, **kwargs):
    """Alias of semnasnet_100 (reference efficientnet.py:931-934)."""
    return semnasnet_100(pretrained, **kwargs)  # noqa: F821
