"""TNT — Transformer-in-Transformer (reference models/tnt.py, 268 LoC):
inner transformer over pixel tokens within each patch, projected into the
outer transformer over patch tokens."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.vision_transformer import Attention, Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {
    "tnt_s_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                     std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                     first_conv="pixel_embed.proj",
                                     classifier="head"),
    "tnt_b_patch16_224": default_cfg(mean=(0.5, 0.5, 0.5),
                                     std=(0.5, 0.5, 0.5), crop_pct=0.9,
                                     first_conv="pixel_embed.proj",
                                     classifier="head"),
}


class TNTBlock(fnn.Module):
    outer_heads: int = 6
    inner_heads: int = 4
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, patch_tokens, pixel_tokens, training: bool = False):
        # inner transformer on pixel tokens [N*L, P, c_in]
        c_in = pixel_tokens.shape[-1]
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="norm_in")(pixel_tokens)
        # qkv_bias=False throughout TNT (reference tnt.py:47-56, :153)
        y = Attention(self.inner_heads, qkv_bias=False, dtype=self.dtype,
                      name="attn_in")(y, training)
        pixel_tokens = pixel_tokens + y
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="norm_mlp_in")(pixel_tokens)
        y = Mlp(int(c_in * self.mlp_ratio), dtype=self.dtype,
                name="mlp_in")(y, training)
        pixel_tokens = pixel_tokens + y

        # project pixel tokens into the patch embedding
        n_l, p, _ = pixel_tokens.shape
        d = patch_tokens.shape[-1]
        nl = patch_tokens.shape[1] - 1  # minus cls
        proj = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm1_proj")(pixel_tokens)
        proj = proj.reshape(-1, nl, p * c_in)
        proj = fnn.Dense(d, dtype=self.dtype, name="proj")(proj)
        patch_tokens = jnp.concatenate(
            [patch_tokens[:, :1], patch_tokens[:, 1:] + proj], axis=1)

        # outer transformer on patch tokens
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="norm_out")(patch_tokens)
        y = Attention(self.outer_heads, qkv_bias=False, dtype=self.dtype,
                      name="attn_out")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp")(y, training)
        patch_tokens = patch_tokens + y
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="norm_mlp")(patch_tokens)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return patch_tokens + y, pixel_tokens


class TNT(fnn.Module):
    patch_size: int = 16
    inner_stride: int = 4
    embed_dim: int = 384
    inner_dim: int = 24
    depth: int = 12
    outer_heads: int = 6
    inner_heads: int = 4
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, hh, ww, _ = x.shape
        ps, st = self.patch_size, self.inner_stride
        gh, gw = hh // ps, ww // ps
        num_patches = gh * gw
        inner_grid = ps // st  # pixel tokens per side
        p = inner_grid * inner_grid

        # pixel embed: conv stride inner_stride, then split into patches
        y = Conv2d(self.inner_dim, 7, st, 3, use_bias=True, dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="pixel_embed")(x)
        y = y.reshape(n, gh, inner_grid, gw, inner_grid, self.inner_dim)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n * num_patches, p, self.inner_dim)
        pixel_pos = self.param("pixel_pos", fnn.initializers.normal(0.02),
                               (1, p, self.inner_dim), jnp.float32)
        pixel_tokens = y + pixel_pos.astype(y.dtype)

        # patch embed from pixel tokens: LN -> proj -> LN
        # (reference tnt.py: norm1_proj, proj, norm2_proj)
        pt = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_proj")(
            pixel_tokens.reshape(n, num_patches, p * self.inner_dim))
        pt = fnn.Dense(self.embed_dim, dtype=self.dtype, name="proj_embed")(pt)
        pt = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="norm2_proj")(pt)
        cls = self.param("cls_token", fnn.initializers.normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32)
        patch_tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)).astype(pt.dtype),
             pt], axis=1)
        patch_pos = self.param("patch_pos", fnn.initializers.normal(0.02),
                               (1, num_patches + 1, self.embed_dim),
                               jnp.float32)
        patch_tokens = patch_tokens + patch_pos.astype(pt.dtype)

        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            patch_tokens, pixel_tokens = TNTBlock(
                self.outer_heads, self.inner_heads, drop_path_rate=dpr,
                dtype=self.dtype, name=f"blocks_{i}")(
                    patch_tokens, pixel_tokens, training)
        if self.features_only:
            return [patch_tokens[:, 1:].reshape(n, gh, gw, self.embed_dim)]
        out = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm")(patch_tokens[:, 0])
        if self.num_classes > 0:
            return fnn.Dense(self.num_classes, dtype=self.dtype,
                             name="head")(out)
        return out


@register_model
def tnt_s_patch16_224(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        TNT, "tnt_s_patch16_224", default_cfgs["tnt_s_patch16_224"],
        pretrained=pretrained, embed_dim=384, inner_dim=24, depth=12,
        outer_heads=6, inner_heads=4, **kwargs)


@register_model
def tnt_b_patch16_224(pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        TNT, "tnt_b_patch16_224", default_cfgs["tnt_b_patch16_224"],
        pretrained=pretrained, embed_dim=640, inner_dim=40, depth=12,
        outer_heads=10, inner_heads=4, **kwargs)
