"""ResNet chassis + classic block zoo (reference models/resnet.py:448-613).

The chassis is shared by resnet/resnext/seresnet AND (via ``block`` injection)
the CoT family — exactly the reference's architecture-injection pattern, but
as flax Modules on NHWC.  A single class covers both the classic chassis
(stem maxpool, stage-0 stride 1; resnet.py:519-613) and the hybrid ResNet-D
chassis (no stem pool, every stage stride 2; cotnet_hybrid.py:338-445) via
``replace_stem_pool``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import (
    batch_norm,
    BlurPool2d,
    ClassifierHead,
    Conv2d,
    DropBlock2d,
    DropPath,
    avg_pool2d,
    create_attn,
    get_act_fn,
    get_padding,
    max_pool2d,
)

default_cfgs = {}  # populated next to the variant table below


class Downsample(fnn.Module):
    """Identity-path projection: 1x1 (or KxK) conv, optionally preceded by an
    avg-pool (ResNet-D trick; reference resnet.py:365-395)."""

    out_channels: int
    stride: int = 1
    kernel_size: int = 1
    dilation: int = 1
    first_dilation: int = 1
    avg: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        if self.avg:
            avg_stride = self.stride if self.dilation == 1 else 1
            if not (self.stride == 1 and self.dilation == 1):
                x = avg_pool2d(x, 2, avg_stride, ceil_mode=True,
                               count_include_pad=False)
            x = Conv2d(self.out_channels, 1, 1, 0, dtype=self.dtype,
                       name="conv")(x)
        else:
            ks = 1 if self.stride == 1 and self.dilation == 1 else self.kernel_size
            fd = (self.first_dilation or self.dilation) if ks > 1 else 1
            p = get_padding(ks, self.stride, fd)
            x = Conv2d(self.out_channels, ks, self.stride, p, fd,
                       dtype=self.dtype, name="conv")(x)
        return batch_norm(x, training, name="bn", dtype=self.dtype, axis_name=self.axis_name)


class BasicBlock(fnn.Module):
    """Two 3x3 convs (reference resnet.py:219-283)."""

    expansion = 1

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
        assert self.cardinality == 1 and self.base_width == 64
        first_planes = self.planes // self.reduce_first
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        act = get_act_fn(self.act)
        use_aa = self.aa and self.stride == 2
        residual = x

        y = Conv2d(first_planes, 3, 1 if use_aa else self.stride,
                   fd, fd, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype, axis_name=self.axis_name)
        y = self._maybe_drop_block(y, training)
        y = act(y)
        if use_aa:
            y = BlurPool2d(stride=self.stride, name="aa")(y)

        y = Conv2d(outplanes, 3, 1, self.dilation, self.dilation,
                   dtype=self.dtype, name="conv2")(y)
        bn2_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn2_scale)
        y = self._maybe_drop_block(y, training)

        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se")
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)

    def _maybe_drop_block(self, y, training):
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            return DropBlock2d(rate, bs, gamma)(y, training=training)
        return y


class Bottleneck(fnn.Module):
    """1x1 -> 3x3 -> 1x1 (reference resnet.py:286-362)."""

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
    attn_kwargs: Optional[dict] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        width = int((self.planes * (self.base_width / 64))) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        act = get_act_fn(self.act)
        use_aa = self.aa and self.stride == 2
        residual = x

        y = Conv2d(first_planes, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype, axis_name=self.axis_name)
        y = self._maybe_drop_block(y, training)
        y = act(y)

        y = Conv2d(width, 3, 1 if use_aa else self.stride, fd, fd,
                   groups=self.cardinality, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype, axis_name=self.axis_name)
        y = self._maybe_drop_block(y, training)
        y = act(y)
        if use_aa:
            y = BlurPool2d(stride=self.stride, name="aa")(y)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        y = self._maybe_drop_block(y, training)

        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se", **(self.attn_kwargs or {}))
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)

    def _maybe_drop_block(self, y, training):
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            return DropBlock2d(rate, bs, gamma)(y, training=training)
        return y


def drop_block_cfgs(drop_block_rate: float):
    """Per-stage DropBlock configs (reference resnet.py:397-402)."""
    if not drop_block_rate:
        return [None, None, None, None]
    return [None, None, (drop_block_rate, 5, 0.25), (drop_block_rate, 3, 1.00)]


class ResNet(fnn.Module):
    """The chassis.  ``block`` is the block Module class; per-family block
    kwargs arrive via ``block_args`` (reference block_args injection,
    resnet.py:556-561)."""

    block: Any
    layers: Sequence[int]
    num_classes: int = 1000
    in_chans: int = 3
    cardinality: int = 1
    base_width: int = 64
    stem_width: int = 64
    stem_type: str = ""
    replace_stem_pool: bool = False  # hybrid chassis: no maxpool, stages stride 2
    output_stride: int = 32
    block_reduce_first: int = 1
    down_kernel_size: int = 1
    avg_down: bool = False
    act: str = "relu"
    stem_act: Optional[str] = None  # hybrid uses relu stem even w/ swish blocks
    aa_layer: Optional[str] = None  # 'blur' or None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    drop_block_rate: float = 0.0
    global_pool: str = "avg"
    zero_init_last_bn: bool = True
    block_args: Optional[dict] = None
    features_only: bool = False
    out_indices: Sequence[int] = (1, 2, 3, 4)
    remat: bool = False  # jax.checkpoint each block (trade FLOPs for HBM)
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        assert self.output_stride in (8, 16, 32)
        # drop args the block type doesn't declare (e.g. the CoT-only
        # ``impl`` kernel selector reaching a plain BasicBlock via the
        # config's model.kernel_impl knob)
        block_args = {k: v for k, v in (self.block_args or {}).items()
                      if k in self.block.__dataclass_fields__}
        stem_act = get_act_fn(self.stem_act or self.act)

        # --- stem ---
        deep_stem = "deep" in self.stem_type
        inplanes = self.stem_width * 2 if deep_stem else 64
        if deep_stem:
            c1 = c2 = self.stem_width
            if "tiered" in self.stem_type:
                c1 = 3 * (self.stem_width // 4)
                c2 = (self.stem_width if "narrow" in self.stem_type
                      else 6 * (self.stem_width // 4))
            x = Conv2d(c1, 3, 2, 1, dtype=self.dtype, name="conv1_0")(x)
            x = batch_norm(x, training, name="bn1_0", dtype=self.dtype, axis_name=self.axis_name)
            x = stem_act(x)
            x = Conv2d(c2, 3, 1, 1, dtype=self.dtype, name="conv1_1")(x)
            x = batch_norm(x, training, name="bn1_1", dtype=self.dtype, axis_name=self.axis_name)
            x = stem_act(x)
            x = Conv2d(inplanes, 3, 1, 1, dtype=self.dtype, name="conv1_2")(x)
        else:
            x = Conv2d(inplanes, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(x, training, name="bn1", dtype=self.dtype, axis_name=self.axis_name)
        x = stem_act(x)
        features = [x]

        if self.replace_stem_pool:
            net_stride = 2  # stages will each stride 2 (cotnet_hybrid.py:250-256)
        else:
            if self.aa_layer is not None:
                x = max_pool2d(x, 3, 1, 1)
                x = BlurPool2d(stride=2, name="stem_aa")(x)
            else:
                x = max_pool2d(x, 3, 2, 1)
            net_stride = 4

        # --- stages ---
        channels = (64, 128, 256, 512)
        expansion = self.block.expansion
        net_num_blocks = sum(self.layers)
        net_block_idx = 0
        dilation = prev_dilation = 1
        dbs = drop_block_cfgs(self.drop_block_rate)
        for stage_idx, (planes, num_blocks, db) in enumerate(
                zip(channels, self.layers, dbs)):
            if self.replace_stem_pool:
                stride = 2
            else:
                stride = 1 if stage_idx == 0 else 2
            if net_stride >= self.output_stride:
                dilation *= stride
                stride = 1
            else:
                net_stride *= stride

            for block_idx in range(num_blocks):
                b_stride = stride if block_idx == 0 else 1
                downsample = None
                if block_idx == 0 and (
                        b_stride != 1 or x.shape[-1] != planes * expansion):
                    downsample = dict(
                        stride=b_stride, kernel_size=self.down_kernel_size,
                        dilation=dilation, first_dilation=prev_dilation,
                        avg=self.avg_down)
                dpr = self.drop_path_rate * net_block_idx / max(
                    net_num_blocks - 1, 1)
                block_cls = (fnn.remat(self.block,
                                       static_argnums=(2,))
                             if self.remat else self.block)
                x = block_cls(
                    planes=planes,
                    stride=b_stride,
                    downsample=downsample,
                    cardinality=self.cardinality,
                    base_width=self.base_width,
                    reduce_first=self.block_reduce_first,
                    dilation=dilation,
                    first_dilation=prev_dilation,
                    act=self.act,
                    aa=self.aa_layer is not None,
                    drop_block=db,
                    drop_path_rate=dpr,
                    zero_init_last_bn=self.zero_init_last_bn,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                    **({"block_idx": block_idx}
                       if "block_idx" in self.block.__dataclass_fields__ else {}),
                    **block_args,
                )(x, training)  # positional: remat's static_argnums needs it
                prev_dilation = dilation
                net_block_idx += 1
            features.append(x)
            # features_only prunes trailing stages beyond the last requested
            # index (reference FeatureListNet trims unused modules,
            # features.py:153-235)
            if self.features_only and stage_idx + 1 >= max(self.out_indices):
                break

        if self.features_only:
            return [features[i] for i in self.out_indices]

        return ClassifierHead(
            num_classes=self.num_classes, pool_type=self.global_pool,
            drop_rate=self.drop_rate, dtype=self.dtype, name="head",
        )(x, training=training)




def _create_resnet(model_name: str, pretrained: bool = False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs.get(model_name, default_cfg()),
        pretrained=pretrained, **_strip(kwargs))


def _strip(kwargs):
    """Drop factory kwargs the chassis doesn't take."""
    kwargs.pop("in_chans_unused", None)
    # pruned channel maps are not shipped by the reference either
    # (models/helpers.py:248-251 reads models/pruned/<variant>.txt, absent
    # from the tree): *_pruned keys build the base architecture
    kwargs.pop("pruned", None)
    return kwargs


# --- variant tables (reference models/resnet.py:614-1233) -------------------
# One row per @register_model entrypoint: architecture kwargs on the shared
# chassis.  B/N = BasicBlock/Bottleneck; eca/se rows set block attention.

_B, _N = BasicBlock, Bottleneck
_deep32 = dict(stem_width=32, stem_type="deep", avg_down=True)
_se = dict(block_args=dict(attn_layer="se"))
_eca = dict(block_args=dict(attn_layer="eca"))

RESNET_VARIANTS = {
    # ResNet / ResNet-D (resnet.py:620-737)
    "resnet18": dict(block=_B, layers=(2, 2, 2, 2)),
    "resnet18d": dict(block=_B, layers=(2, 2, 2, 2), **_deep32),
    "resnet34": dict(block=_B, layers=(3, 4, 6, 3)),
    "resnet34d": dict(block=_B, layers=(3, 4, 6, 3), **_deep32),
    "resnet26": dict(block=_N, layers=(2, 2, 2, 2)),
    "resnet26d": dict(block=_N, layers=(2, 2, 2, 2), **_deep32),
    "resnet50": dict(block=_N, layers=(3, 4, 6, 3)),
    "resnet50d": dict(block=_N, layers=(3, 4, 6, 3), **_deep32),
    "resnet66d": dict(block=_B, layers=(3, 4, 23, 3), **_deep32),
    "resnet101": dict(block=_N, layers=(3, 4, 23, 3)),
    "resnet101d": dict(block=_N, layers=(3, 4, 23, 3), **_deep32),
    "resnet152": dict(block=_N, layers=(3, 8, 36, 3)),
    "resnet152d": dict(block=_N, layers=(3, 8, 36, 3), **_deep32),
    "resnet200": dict(block=_N, layers=(3, 24, 36, 3)),
    "resnet200d": dict(block=_N, layers=(3, 24, 36, 3), **_deep32),
    # torchvision-weight aliases (resnet.py:745-773)
    "tv_resnet34": dict(block=_B, layers=(3, 4, 6, 3)),
    "tv_resnet50": dict(block=_N, layers=(3, 4, 6, 3)),
    "tv_resnet101": dict(block=_N, layers=(3, 4, 23, 3)),
    "tv_resnet152": dict(block=_N, layers=(3, 8, 36, 3)),
    # Wide ResNet (resnet.py:777-796)
    "wide_resnet50_2": dict(block=_N, layers=(3, 4, 6, 3), base_width=128),
    "wide_resnet101_2": dict(block=_N, layers=(3, 4, 23, 3), base_width=128),
    # ResNeXt (resnet.py:800-852)
    "resnext26_32x4d": dict(block=_N, layers=(2, 2, 2, 2), cardinality=32,
                            base_width=4),
    "resnext50_32x4d": dict(block=_N, layers=(3, 4, 6, 3), cardinality=32,
                            base_width=4),
    "resnext50d_32x4d": dict(block=_N, layers=(3, 4, 6, 3), cardinality=32,
                             base_width=4, **_deep32),
    "resnext101_32x4d": dict(block=_N, layers=(3, 4, 23, 3), cardinality=32,
                             base_width=4),
    "resnext101_32x8d": dict(block=_N, layers=(3, 4, 23, 3), cardinality=32,
                             base_width=8),
    "resnext101_64x4d": dict(block=_N, layers=(3, 4, 23, 3), cardinality=64,
                             base_width=4),
    "tv_resnext50_32x4d": dict(block=_N, layers=(3, 4, 6, 3), cardinality=32,
                               base_width=4),
    # Instagram WSL ResNeXts (resnet.py:856-896)
    "ig_resnext101_32x8d": dict(block=_N, layers=(3, 4, 23, 3),
                                cardinality=32, base_width=8),
    "ig_resnext101_32x16d": dict(block=_N, layers=(3, 4, 23, 3),
                                 cardinality=32, base_width=16),
    "ig_resnext101_32x32d": dict(block=_N, layers=(3, 4, 23, 3),
                                 cardinality=32, base_width=32),
    "ig_resnext101_32x48d": dict(block=_N, layers=(3, 4, 23, 3),
                                 cardinality=32, base_width=48),
    # SSL / SWSL pretraining aliases (resnet.py:900-1022)
    "ssl_resnet18": dict(block=_B, layers=(2, 2, 2, 2)),
    "ssl_resnet50": dict(block=_N, layers=(3, 4, 6, 3)),
    "ssl_resnext50_32x4d": dict(block=_N, layers=(3, 4, 6, 3),
                                cardinality=32, base_width=4),
    "ssl_resnext101_32x4d": dict(block=_N, layers=(3, 4, 23, 3),
                                 cardinality=32, base_width=4),
    "ssl_resnext101_32x8d": dict(block=_N, layers=(3, 4, 23, 3),
                                 cardinality=32, base_width=8),
    "ssl_resnext101_32x16d": dict(block=_N, layers=(3, 4, 23, 3),
                                  cardinality=32, base_width=16),
    "swsl_resnet18": dict(block=_B, layers=(2, 2, 2, 2)),
    "swsl_resnet50": dict(block=_N, layers=(3, 4, 6, 3)),
    "swsl_resnext50_32x4d": dict(block=_N, layers=(3, 4, 6, 3),
                                 cardinality=32, base_width=4),
    "swsl_resnext101_32x4d": dict(block=_N, layers=(3, 4, 23, 3),
                                  cardinality=32, base_width=4),
    "swsl_resnext101_32x8d": dict(block=_N, layers=(3, 4, 23, 3),
                                  cardinality=32, base_width=8),
    "swsl_resnext101_32x16d": dict(block=_N, layers=(3, 4, 23, 3),
                                   cardinality=32, base_width=16),
    # ECA ResNets (resnet.py:1026-1103)
    "ecaresnet18": dict(block=_B, layers=(2, 2, 2, 2), **_eca),
    "ecaresnet50": dict(block=_N, layers=(3, 4, 6, 3), **_eca),
    "ecaresnet50d": dict(block=_N, layers=(3, 4, 6, 3), **_deep32, **_eca),
    "ecaresnet50d_pruned": dict(block=_N, layers=(3, 4, 6, 3), **_deep32,
                                **_eca),
    "ecaresnetlight": dict(block=_N, layers=(1, 1, 11, 3), stem_width=32,
                           avg_down=True, **_eca),
    "ecaresnet101d": dict(block=_N, layers=(3, 4, 23, 3), **_deep32, **_eca),
    "ecaresnet101d_pruned": dict(block=_N, layers=(3, 4, 23, 3), **_deep32,
                                 **_eca),
    "ecaresnext26tn_32x4d": dict(block=_N, layers=(2, 2, 2, 2),
                                 cardinality=32, base_width=4, stem_width=32,
                                 stem_type="deep_tiered_narrow",
                                 avg_down=True, **_eca),
    # anti-aliased (resnet.py:1107-1119)
    "resnetblur18": dict(block=_B, layers=(2, 2, 2, 2), aa_layer="blur"),
    "resnetblur50": dict(block=_N, layers=(3, 4, 6, 3), aa_layer="blur"),
    # SE ResNets / ResNeXts / SENet (resnet.py:1123-1233)
    "seresnet18": dict(block=_B, layers=(2, 2, 2, 2), **_se),
    "seresnet34": dict(block=_B, layers=(3, 4, 6, 3), **_se),
    "seresnet50": dict(block=_N, layers=(3, 4, 6, 3), **_se),
    "seresnet50tn": dict(block=_N, layers=(3, 4, 6, 3), stem_width=32,
                         stem_type="deep_tiered_narrow", avg_down=True, **_se),
    "seresnet101": dict(block=_N, layers=(3, 4, 23, 3), **_se),
    "seresnet152": dict(block=_N, layers=(3, 8, 36, 3), **_se),
    "seresnext26_32x4d": dict(block=_N, layers=(2, 2, 2, 2), cardinality=32,
                              base_width=4, **_se),
    "seresnext26d_32x4d": dict(block=_N, layers=(2, 2, 2, 2), cardinality=32,
                               base_width=4, **_deep32, **_se),
    "seresnext26t_32x4d": dict(block=_N, layers=(2, 2, 2, 2), cardinality=32,
                               base_width=4, stem_width=32,
                               stem_type="deep_tiered", avg_down=True, **_se),
    "seresnext26tn_32x4d": dict(block=_N, layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, stem_width=32,
                                stem_type="deep_tiered_narrow", avg_down=True,
                                **_se),
    "seresnext50_32x4d": dict(block=_N, layers=(3, 4, 6, 3), cardinality=32,
                              base_width=4, **_se),
    "seresnext101_32x4d": dict(block=_N, layers=(3, 4, 23, 3), cardinality=32,
                               base_width=4, **_se),
    "seresnext101_32x8d": dict(block=_N, layers=(3, 4, 23, 3), cardinality=32,
                               base_width=8, **_se),
    "senet154": dict(block=_N, layers=(3, 8, 36, 3), cardinality=64,
                     base_width=4, stem_type="deep", down_kernel_size=3,
                     block_reduce_first=2, **_se),
}

# data configs: bilinear for the torchvision/fb-weight lineages, bicubic for
# the timm-trained ones; deep stems expose first_conv=conv1.0
_BILINEAR = {"resnet18", "resnet34", "resnet101", "resnet152", "resnet200",
             "tv_resnet34", "tv_resnet50", "tv_resnet101", "tv_resnet152",
             "tv_resnext50_32x4d", "wide_resnet101_2",
             "resnext101_32x4d", "resnext101_32x8d", "resnext101_64x4d",
             "ecaresnet18", "ecaresnet50",
             "ig_resnext101_32x8d", "ig_resnext101_32x16d",
             "ig_resnext101_32x32d", "ig_resnext101_32x48d",
             "ssl_resnet18", "ssl_resnet50", "ssl_resnext50_32x4d",
             "ssl_resnext101_32x4d", "ssl_resnext101_32x8d",
             "ssl_resnext101_32x16d", "swsl_resnet18", "swsl_resnet50",
             "swsl_resnext50_32x4d", "swsl_resnext101_32x4d",
             "swsl_resnext101_32x8d", "swsl_resnext101_32x16d"}

for _name, _row in RESNET_VARIANTS.items():
    _interp = "bilinear" if _name in _BILINEAR else "bicubic"
    _fc = "conv1.0" if "deep" in str(_row.get("stem_type", "")) else "conv1"
    default_cfgs[_name] = default_cfg(interpolation=_interp, first_conv=_fc)

register_variant_table(__name__, _create_resnet, RESNET_VARIANTS)
