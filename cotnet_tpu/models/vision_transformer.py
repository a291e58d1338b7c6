"""Vision Transformer (reference models/vision_transformer.py, 893 LoC).

Standard ViT: patch embed -> [cls] + pos embed -> pre-LN transformer blocks
-> LN -> head.  Pure MXU work; attention is jnp einsum (at 224/16 the 197-
token sequences are far below any flash-attention crossover on TPU).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import Conv2d, DropPath, get_act_fn

default_cfgs = {}  # populated next to the variant table below


class Attention(fnn.Module):
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = fnn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                        name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [n, h, l, dh]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (dh ** -0.5), axis=-1).astype(
            self.dtype or x.dtype)
        if self.attn_drop and training:
            attn = fnn.Dropout(self.attn_drop, deterministic=False)(attn)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(n, l, d)
        y = fnn.Dense(d, dtype=self.dtype, name="proj")(y)
        if self.proj_drop and training:
            y = fnn.Dropout(self.proj_drop, deterministic=False)(y)
        return y


class Mlp(fnn.Module):
    hidden: int
    drop: float = 0.0
    act: str = "gelu"
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        x = fnn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = get_act_fn(self.act)(x)
        if self.drop and training:
            x = fnn.Dropout(self.drop, deterministic=False)(x)
        x = fnn.Dense(d, dtype=self.dtype, name="fc2")(x)
        if self.drop and training:
            x = fnn.Dropout(self.drop, deterministic=False)(x)
        return x


class Block(fnn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop, dtype=self.dtype, name="attn")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path1")(y, training)
        x = x + y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), self.drop, dtype=self.dtype,
                name="mlp")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path2")(y, training)
        return x + y


class VisionTransformer(fnn.Module):
    """``distilled`` adds the DeiT distillation token + second head
    (reference vision_transformer.py:235-330); at inference the two heads are
    averaged, and this implementation returns the average in training mode
    too (the reference returns both logits for the distillation loss — train
    deit against a teacher by reading the two heads from params directly).
    ``representation_size`` inserts the tanh pre-logits layer the in21k/SAM
    checkpoints carry (vision_transformer.py:283-288)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = False
    representation_size: Optional[int] = None
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    backbone: Any = None  # hybrid: a flax Module producing an NHWC feature map
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n = x.shape[0]
        p = self.patch_size
        if self.backbone is not None:
            x = self.backbone(x, training=training)
            if isinstance(x, (list, tuple)):
                x = x[-1]
        x = Conv2d(self.embed_dim, p, p, 0, use_bias=True, dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)

        n_prefix = 2 if self.distilled else 1
        cls = self.param("cls_token", fnn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        prefix = [jnp.broadcast_to(cls, (n, 1, self.embed_dim)).astype(x.dtype)]
        if self.distilled:
            dist = self.param("dist_token", fnn.initializers.zeros,
                              (1, 1, self.embed_dim), jnp.float32)
            prefix.append(
                jnp.broadcast_to(dist, (n, 1, self.embed_dim)).astype(x.dtype))
        pos = self.param("pos_embed",
                         fnn.initializers.normal(0.02),
                         (1, gh * gw + n_prefix, self.embed_dim), jnp.float32)
        x = jnp.concatenate(prefix + [x], axis=1)
        x = x + pos.astype(x.dtype)
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)

        feats = []
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.drop_rate, self.attn_drop_rate, dpr,
                      dtype=self.dtype, name=f"blocks_{i}")(x, training)
            feats.append(x)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.features_only:
            return feats
        cls_out = x[:, 0]
        if self.representation_size and not self.distilled:
            cls_out = jnp.tanh(fnn.Dense(self.representation_size,
                                         dtype=self.dtype,
                                         name="pre_logits")(cls_out))
        if self.num_classes > 0:
            out = fnn.Dense(self.num_classes, dtype=self.dtype,
                            name="head")(cls_out)
            if self.distilled:
                out_dist = fnn.Dense(self.num_classes, dtype=self.dtype,
                                     name="head_dist")(x[:, 1])
                out = (out + out_dist) / 2
            return out
        return cls_out


def _vit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    # reference drops the pre-logits layer when fine-tuning to a new class
    # count (vision_transformer.py:530-536)
    cfg_nc = default_cfgs.get(model_name, {}).get("num_classes", 1000)
    if kwargs.get("representation_size") and \
            kwargs.get("num_classes", cfg_nc) != cfg_nc:
        kwargs.pop("representation_size")
    return build_model_with_cfg(
        VisionTransformer, model_name, default_cfgs[model_name],
        pretrained=pretrained, **kwargs)


# --- variant tables (reference vision_transformer.py:548-892) --------------

def _dims(patch, dim, depth, heads, **extra):
    d = dict(patch_size=patch, embed_dim=dim, depth=depth, num_heads=heads)
    d.update(extra)
    return d


_TINY = (16, 192, 12, 3)
_SMALL = (16, 384, 12, 6)
_BASE = (16, 768, 12, 12)
_LARGE = (16, 1024, 24, 16)

VIT_VARIANTS = {
    "vit_tiny_patch16_224": _dims(*_TINY),
    "vit_tiny_patch16_384": _dims(*_TINY),
    "vit_small_patch32_224": _dims(32, 384, 12, 6),
    "vit_small_patch32_384": _dims(32, 384, 12, 6),
    "vit_small_patch16_224": _dims(*_SMALL),
    "vit_small_patch16_384": _dims(*_SMALL),
    "vit_base_patch32_224": _dims(32, 768, 12, 12),
    "vit_base_patch32_384": _dims(32, 768, 12, 12),
    "vit_base_patch16_224": _dims(*_BASE),
    "vit_base_patch16_384": _dims(*_BASE),
    "vit_large_patch32_224": _dims(32, 1024, 24, 16),
    "vit_large_patch32_384": _dims(32, 1024, 24, 16),
    "vit_large_patch16_224": _dims(*_LARGE),
    "vit_large_patch16_384": _dims(*_LARGE),
    # SAM-pretrained (repr layer kept, vision_transformer.py:683-695)
    "vit_base_patch16_sam_224": _dims(*_BASE, representation_size=768),
    "vit_base_patch32_sam_224": _dims(32, 768, 12, 12,
                                      representation_size=768),
    # in21k (21843-class default_cfg; large_p32 + huge keep pre-logits)
    "vit_tiny_patch16_224_in21k": _dims(*_TINY),
    "vit_small_patch32_224_in21k": _dims(32, 384, 12, 6),
    "vit_small_patch16_224_in21k": _dims(*_SMALL),
    "vit_base_patch32_224_in21k": _dims(32, 768, 12, 12),
    "vit_base_patch16_224_in21k": _dims(*_BASE),
    "vit_large_patch32_224_in21k": _dims(32, 1024, 24, 16,
                                         representation_size=1024),
    "vit_large_patch16_224_in21k": _dims(*_LARGE),
    "vit_huge_patch14_224_in21k": _dims(14, 1280, 32, 16,
                                        representation_size=1280),
    # DeiT (vision_transformer.py:793-876)
    "deit_tiny_patch16_224": _dims(*_TINY),
    "deit_small_patch16_224": _dims(*_SMALL),
    "deit_base_patch16_224": _dims(*_BASE),
    "deit_base_patch16_384": _dims(*_BASE),
    "deit_tiny_distilled_patch16_224": _dims(*_TINY, distilled=True),
    "deit_small_distilled_patch16_224": _dims(*_SMALL, distilled=True),
    "deit_base_distilled_patch16_224": _dims(*_BASE, distilled=True),
    "deit_base_distilled_patch16_384": _dims(*_BASE, distilled=True),
    # MIIL (qkv_bias=False)
    "vit_base_patch16_224_miil_in21k": _dims(*_BASE, qkv_bias=False),
    "vit_base_patch16_224_miil": _dims(*_BASE, qkv_bias=False),
}

for _name, _row in VIT_VARIANTS.items():
    _size = 384 if "_384" in _name else 224
    _nc = 21843 if "in21k" in _name else 1000
    if "miil" in _name:
        _mean, _std, _interp = (0, 0, 0), (1, 1, 1), "bilinear"
    elif _name.startswith("deit"):
        _mean, _std, _interp = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                                "bicubic")
    else:
        _mean, _std, _interp = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), "bicubic"
    default_cfgs[_name] = default_cfg(
        input_size=(3, _size, _size), num_classes=_nc,
        crop_pct=1.0 if _size == 384 else 0.9, interpolation=_interp,
        mean=_mean, std=_std, first_conv="patch_embed.proj",
        classifier="head")

register_variant_table(__name__, _vit, VIT_VARIANTS)
