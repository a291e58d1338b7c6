"""Visformer (reference models/visformer.py, 417 LoC): conv stem, a conv
stage (spatial MLP blocks, attention disabled), two attention stages, BN
norms throughout."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.nn import Conv2d, DropPath, batch_norm, get_act_fn

default_cfgs = {
    "visformer_tiny": default_cfg(first_conv="stem.0", classifier="head"),
    "visformer_small": default_cfg(first_conv="stem.0", classifier="head"),
}


class SpatialMlp(fnn.Module):
    """conv1x1 -> gelu -> [grouped 3x3 -> gelu] -> conv1x1
    (visformer.py:50-88)."""

    hidden: int
    spatial_conv: bool = False
    group: int = 8
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        gelu = get_act_fn("gelu")
        hidden = (d * 2 if self.spatial_conv and self.group >= 2
                  else self.hidden)
        y = Conv2d(hidden, 1, dtype=self.dtype, name="conv1")(x)
        y = gelu(y)
        if self.spatial_conv:
            y = Conv2d(hidden, 3, 1, 1, groups=self.group, dtype=self.dtype,
                       name="conv2")(y)
            y = gelu(y)
        return Conv2d(d, 1, dtype=self.dtype, name="conv3")(y)


class VisAttention(fnn.Module):
    """2-D attention with conv qkv (visformer.py:90-116)."""

    num_heads: int
    head_dim_ratio: float = 1.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, d = x.shape
        nh = self.num_heads
        dh = round(d // nh * self.head_dim_ratio)
        qkv = Conv2d(dh * nh * 3, 1, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, h * w, 3, nh, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k
                       ).astype(jnp.float32), -1).astype(self.dtype or x.dtype)
        y = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(n, h, w, nh * dh)
        return Conv2d(d, 1, dtype=self.dtype, name="proj")(y)


class VisBlock(fnn.Module):
    num_heads: int
    head_dim_ratio: float = 1.0
    mlp_ratio: float = 4.0
    group: int = 8
    attn_disabled: bool = False
    spatial_conv: bool = False
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        if not self.attn_disabled:
            y = batch_norm(x, training, name="norm1", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = VisAttention(self.num_heads, self.head_dim_ratio,
                             dtype=self.dtype, name="attn")(y, training)
            if self.drop_path_rate > 0:
                y = DropPath(self.drop_path_rate, name="dp1")(y, training)
            x = x + y
        y = batch_norm(x, training, name="norm2", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = SpatialMlp(int(d * self.mlp_ratio), self.spatial_conv, self.group,
                       dtype=self.dtype, name="mlp")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


class Visformer(fnn.Module):
    init_channels: int = 32
    embed_dim: int = 384
    depths: Sequence[int] = (7, 4, 4)
    num_heads: int = 6
    mlp_ratio: float = 4.0
    group: int = 8
    attn_stage: str = "011"
    spatial_conv: str = "100"
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        total = sum(self.depths)
        x = Conv2d(self.init_channels, 7, 2, 3, dtype=self.dtype,
                   name="stem_conv")(x)
        x = batch_norm(x, training, name="stem_bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = relu(x)

        dims = (self.embed_dim // 2, self.embed_dim, self.embed_dim * 2)
        patch = (4, 2, 2)
        ratios = (0.5, 1.0, 1.0)
        idx = 0
        feats = []
        for si in range(3):
            # proj conv keeps its bias (reference visformer PatchEmbed uses a
            # default torch Conv2d, bias=True, even with the BN that follows)
            x = Conv2d(dims[si], patch[si], patch[si], 0, use_bias=True,
                       dtype=self.dtype, name=f"patch_embed{si + 1}")(x)
            x = batch_norm(x, training, name=f"embed_norm{si + 1}",
                           dtype=self.dtype, axis_name=self.axis_name)
            pos = self.param(f"pos_embed{si + 1}",
                             fnn.initializers.normal(0.02),
                             (1, x.shape[1], x.shape[2], dims[si]),
                             jnp.float32)
            x = x + pos.astype(x.dtype)
            for bi in range(self.depths[si]):
                dpr = self.drop_path_rate * idx / max(total - 1, 1)
                x = VisBlock(self.num_heads, ratios[si], self.mlp_ratio,
                             self.group,
                             attn_disabled=self.attn_stage[si] == "0",
                             spatial_conv=self.spatial_conv[si] == "1",
                             drop_path_rate=dpr, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"stage{si + 1}_{bi}")(x, training)
                idx += 1
            feats.append(x)
        if self.features_only:
            return feats
        x = batch_norm(x, training, name="norm", dtype=self.dtype,
                       axis_name=self.axis_name)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


def _visformer(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(Visformer, model_name,
                                default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


@register_model
def visformer_tiny(pretrained=False, **kwargs):
    return _visformer("visformer_tiny", pretrained, init_channels=16,
                      embed_dim=192, num_heads=3, **kwargs)


@register_model
def visformer_small(pretrained=False, **kwargs):
    return _visformer("visformer_small", pretrained, init_channels=32,
                      embed_dim=384, num_heads=6, **kwargs)
