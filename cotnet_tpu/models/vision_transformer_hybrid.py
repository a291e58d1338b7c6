"""Hybrid ViT (reference models/vision_transformer_hybrid.py): a CNN
backbone's feature map feeds the transformer as patch tokens."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Bottleneck, ResNet
from cotnet_tpu.models.vision_transformer import VisionTransformer

default_cfgs = {
    "vit_base_r50_s16_224": default_cfg(
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), crop_pct=0.9,
        first_conv="patch_embed.backbone.conv", classifier="head"),
}


class HybridViT(fnn.Module):
    """ResNet50 stage-3 features -> 1x1 patch embed -> ViT blocks."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        backbone = ResNet(
            block=Bottleneck, layers=(3, 4, 9), features_only=True,
            out_indices=(3,), stem_type="deep", stem_width=64, avg_down=False,
            dtype=self.dtype, axis_name=self.axis_name, name="backbone")
        feats = backbone(x, training=training)[0]  # stride-16 features
        vit = VisionTransformer(
            patch_size=1, embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, num_classes=self.num_classes,
            drop_rate=self.drop_rate, drop_path_rate=self.drop_path_rate,
            dtype=self.dtype, features_only=self.features_only, name="vit")
        return vit(feats, training=training)


@register_model
def vit_base_r50_s16_224(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        HybridViT, "vit_base_r50_s16_224",
        default_cfgs["vit_base_r50_s16_224"], pretrained=pretrained, **kwargs)
