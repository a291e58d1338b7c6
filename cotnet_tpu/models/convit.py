"""ConViT (reference models/convit.py, 349 LoC): gated positional
self-attention (GPSA) blocks — a learned blend of content attention and a
convolution-like positional attention — followed by plain ViT blocks."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.vision_transformer import Block, Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {
    "convit_tiny": default_cfg(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                               first_conv="patch_embed.proj",
                               classifier="head"),
    "convit_small": default_cfg(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                                first_conv="patch_embed.proj",
                                classifier="head"),
    "convit_base": default_cfg(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                               first_conv="patch_embed.proj",
                               classifier="head"),
}


def _rel_indices(num_patches: int) -> np.ndarray:
    """[1, L, L, 3] relative (dx, dy, d^2) table (convit.py get_rel_indices)."""
    size = int(num_patches ** 0.5)
    ind = np.arange(size).reshape(1, -1) - np.arange(size).reshape(-1, 1)
    indx = np.tile(ind, (size, size))
    indy = np.repeat(np.repeat(ind, size, axis=0), size, axis=1)
    indd = indx ** 2 + indy ** 2
    out = np.stack([indx, indy, indd], axis=-1).astype(np.float32)
    return out[None]


class GPSA(fnn.Module):
    num_heads: int
    locality_strength: float = 1.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        # qkv_bias=False (reference convit.py:69-70)
        qk = fnn.Dense(2 * d, use_bias=False, dtype=self.dtype, name="qk")(x)
        qk = qk.reshape(n, l, 2, h, dh).transpose(2, 0, 3, 1, 4)
        q, k = qk[0], qk[1]
        v = fnn.Dense(d, use_bias=False, dtype=self.dtype, name="v")(x)
        v = v.reshape(n, l, h, dh).transpose(0, 2, 1, 3)

        patch_attn = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", q * (dh ** -0.5), k
                       ).astype(jnp.float32), -1)

        rel = jnp.asarray(_rel_indices(l))  # [1, L, L, 3]
        pos_proj = fnn.Dense(h, use_bias=True, dtype=jnp.float32,
                             name="pos_proj")  # 3 -> heads
        pos_score = pos_proj(rel).transpose(0, 3, 1, 2)  # [1, h, L, L]
        pos_attn = jax.nn.softmax(pos_score, -1)

        gating = self.param("gating_param", fnn.initializers.ones, (h,),
                            jnp.float32)
        g = jax.nn.sigmoid(gating)[None, :, None, None]
        attn = (1.0 - g) * patch_attn + g * pos_attn
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        attn = attn.astype(self.dtype or x.dtype)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(n, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class GPSABlock(fnn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    locality_strength: float = 1.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = GPSA(self.num_heads, self.locality_strength, dtype=self.dtype,
                 name="attn")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp1")(y, training)
        x = x + y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


class ConViT(fnn.Module):
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 4
    local_layers: int = 10
    locality_strength: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n = x.shape[0]
        p = self.patch_size
        x = Conv2d(self.embed_dim, p, p, 0, use_bias=True, dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)
        pos = self.param("pos_embed", fnn.initializers.normal(0.02),
                         (1, gh * gw, self.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            if i < self.local_layers:
                x = GPSABlock(self.num_heads,
                              locality_strength=self.locality_strength,
                              drop_path_rate=dpr, dtype=self.dtype,
                              name=f"blocks_{i}")(x, training)
            else:
                if i == self.local_layers:
                    cls = self.param("cls_token",
                                     fnn.initializers.normal(0.02),
                                     (1, 1, self.embed_dim), jnp.float32)
                    x = jnp.concatenate(
                        [jnp.broadcast_to(cls, (n, 1, self.embed_dim)
                                          ).astype(x.dtype), x], axis=1)
                x = Block(self.num_heads, 4.0, False, self.drop_rate, 0.0,
                          dpr, dtype=self.dtype,
                          name=f"blocks_{i}")(x, training)
        if self.features_only:
            return [x[:, 1:].reshape(n, gh, gw, self.embed_dim)]
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        out = x[:, 0]
        if self.num_classes > 0:
            return fnn.Dense(self.num_classes, dtype=self.dtype,
                             name="head")(out)
        return out


def _convit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(ConViT, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


@register_model
def convit_tiny(pretrained=False, **kwargs):
    return _convit("convit_tiny", pretrained, embed_dim=192, num_heads=4,
                   **kwargs)


@register_model
def convit_small(pretrained=False, **kwargs):
    return _convit("convit_small", pretrained, embed_dim=432, num_heads=9,
                   **kwargs)


@register_model
def convit_base(pretrained=False, **kwargs):
    return _convit("convit_base", pretrained, embed_dim=768, num_heads=16,
                   **kwargs)
