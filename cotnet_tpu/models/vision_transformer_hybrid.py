"""Hybrid ViT (reference models/vision_transformer_hybrid.py, 362 LoC).

A CNN backbone's last feature map feeds the transformer as patch tokens
(HybridEmbed, reference :100-142).  Two backbone families:
- ResNetV2 with weight-standardized convs + GroupNorm + TF-SAME padding
  (reference _resnetv2 :150-162); ``layers=()`` is the stem-only R+Ti case;
- timm ResNet d-variants (resnet26d/resnet50d) via features_only.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.resnet import Bottleneck as ResNetBottleneck, ResNet
from cotnet_tpu.models.resnetv2 import ResNetV2, _ConvNorm
from cotnet_tpu.models.vision_transformer import VisionTransformer
from cotnet_tpu.nn import max_pool2d_same


class _R50Stem(fnn.Module):
    """Stem-only ResNetV2 backbone (reference create_resnetv2_stem with
    stem_type='same', preact=False — vision_transformer_hybrid.py:158-162)."""

    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        x = _ConvNorm(64, 7, 2, std_conv=True, norm="gn", pad_mode="same",
                      conv_eps=1e-8, dtype=self.dtype,
                      axis_name=self.axis_name, name="stem_c")(x, training)
        return max_pool2d_same(x, 3, 2)


def _r_backbone(layers, dtype=None):
    """ResNetV2 feature backbone (std conv + GN + SAME pad, non-preact)."""
    if not layers:
        return _R50Stem(dtype=dtype, name="backbone")
    return ResNetV2(layers=layers, stem_type="same", preact=False,
                    std_conv=True, norm="gn", features_only=True,
                    conv_eps=1e-8, dtype=dtype, name="backbone")


def _d_backbone(layers, out_stage, dtype=None):
    """timm resnet26d/50d backbone at a chosen stage (features_only +
    out_indices, vision_transformer_hybrid.py:323-362)."""
    return ResNet(block=ResNetBottleneck, layers=layers, stem_width=32,
                  stem_type="deep", avg_down=True, features_only=True,
                  out_indices=(out_stage,), dtype=dtype, name="backbone")


def _vit_hybrid(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    backbone_kind = kwargs.pop("backbone_kind")
    backbone_layers = kwargs.pop("backbone_layers")
    dtype = kwargs.get("dtype")
    if backbone_kind == "r":
        backbone = _r_backbone(backbone_layers, dtype=dtype)
    else:
        layers, out_stage = backbone_layers
        backbone = _d_backbone(layers, out_stage, dtype=dtype)
    cfg_nc = default_cfgs[model_name].get("num_classes", 1000)
    if kwargs.get("representation_size") and \
            kwargs.get("num_classes", cfg_nc) != cfg_nc:
        kwargs.pop("representation_size")
    return build_model_with_cfg(
        VisionTransformer, model_name, default_cfgs[model_name],
        pretrained=pretrained, backbone=backbone, patch_size=kwargs.pop(
            "patch_size", 1), **kwargs)


def _r(layers, dim, depth, heads, patch=1, **extra):
    d = dict(backbone_kind="r", backbone_layers=tuple(layers),
             patch_size=patch, embed_dim=dim, depth=depth, num_heads=heads)
    d.update(extra)
    return d


def _d(layers, out_stage, dim, depth, heads, mlp_ratio=4.0):
    return dict(backbone_kind="d", backbone_layers=(tuple(layers), out_stage),
                patch_size=1, embed_dim=dim, depth=depth, num_heads=heads,
                mlp_ratio=mlp_ratio)


# reference vision_transformer_hybrid.py:166-362
VIT_HYBRID_VARIANTS = {
    "vit_tiny_r_s16_p8_224": _r((), 192, 12, 3, patch=8),
    "vit_tiny_r_s16_p8_384": _r((), 192, 12, 3, patch=8),
    "vit_small_r26_s32_224": _r((2, 2, 2, 2), 384, 12, 6),
    "vit_small_r26_s32_384": _r((2, 2, 2, 2), 384, 12, 6),
    "vit_base_r26_s32_224": _r((2, 2, 2, 2), 768, 12, 12),
    "vit_base_r50_s16_224": _r((3, 4, 9), 768, 12, 12),
    "vit_base_r50_s16_384": _r((3, 4, 9), 768, 12, 12),
    "vit_base_resnet50_384": _r((3, 4, 9), 768, 12, 12),  # deprecated alias
    "vit_large_r50_s32_224": _r((3, 4, 6, 3), 1024, 24, 16),
    "vit_large_r50_s32_384": _r((3, 4, 6, 3), 1024, 24, 16),
    "vit_tiny_r_s16_p8_224_in21k": _r((), 192, 12, 3, patch=8),
    "vit_small_r26_s32_224_in21k": _r((2, 2, 2, 2), 384, 12, 6),
    "vit_base_r50_s16_224_in21k": _r((3, 4, 9), 768, 12, 12,
                                     representation_size=768),
    "vit_base_resnet50_224_in21k": _r((3, 4, 9), 768, 12, 12,
                                      representation_size=768),  # alias
    "vit_large_r50_s32_224_in21k": _r((3, 4, 6, 3), 1024, 24, 16),
    # timm-resnet backbones (vision_transformer_hybrid.py:323-362)
    "vit_small_resnet26d_224": _d((2, 2, 2, 2), 4, 768, 8, 8, mlp_ratio=3.0),
    "vit_small_resnet50d_s16_224": _d((3, 4, 6, 3), 3, 768, 8, 8,
                                      mlp_ratio=3.0),
    "vit_base_resnet26d_224": _d((2, 2, 2, 2), 4, 768, 12, 12),
    "vit_base_resnet50d_224": _d((3, 4, 6, 3), 4, 768, 12, 12),
}

default_cfgs = {}
for _name, _row in VIT_HYBRID_VARIANTS.items():
    _size = 384 if "_384" in _name else 224
    _nc = 21843 if "in21k" in _name else 1000
    if _row["backbone_kind"] == "d":
        _mean, _std = IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
        _fc = "patch_embed.backbone.conv1.0"
    else:
        _mean, _std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
        _fc = "patch_embed.backbone.stem.conv"
    default_cfgs[_name] = default_cfg(
        input_size=(3, _size, _size), num_classes=_nc,
        crop_pct=1.0 if _size == 384 else 0.9, mean=_mean, std=_std,
        first_conv=_fc, classifier="head")

register_variant_table(__name__, _vit_hybrid, VIT_HYBRID_VARIANTS)
