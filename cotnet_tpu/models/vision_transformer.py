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

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, DropPath, get_act_fn

default_cfgs = {
    "vit_tiny_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                        std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                        first_conv="patch_embed.proj",
                                        classifier="head"),
    "vit_small_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                         std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                         first_conv="patch_embed.proj",
                                         classifier="head"),
    "vit_base_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                        std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                        first_conv="patch_embed.proj",
                                        classifier="head"),
    "vit_base_patch32_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                        std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                        first_conv="patch_embed.proj",
                                        classifier="head"),
    "vit_large_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                         std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                         first_conv="patch_embed.proj",
                                         classifier="head"),
}


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
        y = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop, dtype=self.dtype, name="attn")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path1")(y, training)
        x = x + y
        y = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), self.drop, dtype=self.dtype,
                name="mlp")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path2")(y, training)
        return x + y


class VisionTransformer(fnn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, hh, ww, _ = x.shape
        p = self.patch_size
        x = Conv2d(self.embed_dim, p, p, 0, use_bias=True, dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)

        cls = self.param("cls_token", fnn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        pos = self.param("pos_embed",
                         fnn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1)
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
        x = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.features_only:
            return feats
        cls_out = x[:, 0]
        if self.num_classes > 0:
            return fnn.Dense(self.num_classes, dtype=self.dtype,
                             name="head")(cls_out)
        return cls_out


def _vit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        VisionTransformer, model_name, default_cfgs[model_name],
        pretrained=pretrained, **kwargs)


@register_model
def vit_tiny_patch16_224(pretrained=False, **kwargs):
    return _vit("vit_tiny_patch16_224", pretrained, patch_size=16,
                embed_dim=192, depth=12, num_heads=3, **kwargs)


@register_model
def vit_small_patch16_224(pretrained=False, **kwargs):
    return _vit("vit_small_patch16_224", pretrained, patch_size=16,
                embed_dim=384, depth=12, num_heads=6, **kwargs)


@register_model
def vit_base_patch16_224(pretrained=False, **kwargs):
    return _vit("vit_base_patch16_224", pretrained, patch_size=16,
                embed_dim=768, depth=12, num_heads=12, **kwargs)


@register_model
def vit_base_patch32_224(pretrained=False, **kwargs):
    return _vit("vit_base_patch32_224", pretrained, patch_size=32,
                embed_dim=768, depth=12, num_heads=12, **kwargs)


@register_model
def vit_large_patch16_224(pretrained=False, **kwargs):
    return _vit("vit_large_patch16_224", pretrained, patch_size=16,
                embed_dim=1024, depth=24, num_heads=16, **kwargs)
