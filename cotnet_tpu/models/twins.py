"""Twins-SVT (reference models/twins.py, 422 LoC): alternating locally-
grouped self-attention (windows) and global sub-sampled attention, with
conv positional encodings between stages."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.vision_transformer import Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {}  # populated next to the variant table below


class LocallyGroupedAttn(fnn.Module):
    num_heads: int
    ws: int = 7
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, d = x.shape
        ws = min(self.ws, h, w)
        hh, ww = h // ws, w // ws
        nh = self.num_heads
        dh = d // nh
        xw = x.reshape(n, hh, ws, ww, ws, d).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(n * hh * ww, ws * ws, d)
        qkv = fnn.Dense(3 * d, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(-1, ws * ws, 3, nh, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k
                       ).astype(jnp.float32), -1).astype(self.dtype or x.dtype)
        y = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(-1, ws * ws, d)
        y = fnn.Dense(d, dtype=self.dtype, name="proj")(y)
        y = y.reshape(n, hh, ww, ws, ws, d).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, h, w, d)


class GlobalSubSampleAttn(fnn.Module):
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, d = x.shape
        nh = self.num_heads
        dh = d // nh
        q = fnn.Dense(d, dtype=self.dtype, name="q")(x.reshape(n, h * w, d))
        if self.sr_ratio > 1:
            kvsrc = Conv2d(d, self.sr_ratio, self.sr_ratio, 0, use_bias=True,
                           dtype=self.dtype,
                           kernel_init=fnn.initializers.lecun_normal(),
                           name="sr")(x)
            # plain nn.LayerNorm in the reference (twins.py:170) -> eps 1e-5
            kvsrc = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="sr_norm")(kvsrc)
            kvsrc = kvsrc.reshape(n, -1, d)
        else:
            kvsrc = x.reshape(n, h * w, d)
        kv = fnn.Dense(2 * d, dtype=self.dtype, name="kv")(kvsrc)
        lk = kv.shape[1]
        kv = kv.reshape(n, lk, 2, nh, dh).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        q = q.reshape(n, h * w, nh, dh).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k
                       ).astype(jnp.float32), -1).astype(self.dtype or x.dtype)
        y = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(n, h * w, d)
        y = fnn.Dense(d, dtype=self.dtype, name="proj")(y)
        return y.reshape(n, h, w, d)


class TwinsBlock(fnn.Module):
    num_heads: int
    local: bool
    ws: int = 7
    sr_ratio: int = 1
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, d = x.shape
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.local:
            y = LocallyGroupedAttn(self.num_heads, self.ws, dtype=self.dtype,
                                   name="attn")(y, training)
        else:
            y = GlobalSubSampleAttn(self.num_heads, self.sr_ratio,
                                    dtype=self.dtype, name="attn")(y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp1")(y, training)
        x = x + y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y.reshape(n, h * w, d), training).reshape(n, h, w, d)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


class Twins(fnn.Module):
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    depths: Sequence[int] = (2, 2, 10, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    wss: Sequence[int] = (7, 7, 7, 7)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    block_style: str = "svt"  # 'svt' alternates local/global; 'pcpvt' is
    # global sub-sampled attention in every block (PVT + PEG)
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        total = sum(self.depths)
        idx = 0
        feats = []
        for si, (dim, heads, depth, sr, ps, ws, mr) in enumerate(zip(
                self.embed_dims, self.num_heads, self.depths, self.sr_ratios,
                self.patch_sizes, self.wss, self.mlp_ratios)):
            x = Conv2d(dim, ps, ps, 0, use_bias=True, dtype=self.dtype,
                       kernel_init=fnn.initializers.lecun_normal(),
                       name=f"patch_embed{si}")(x)
            n, h, w, _ = x.shape
            # PatchEmbed norm is a plain nn.LayerNorm (twins.py:256) -> eps 1e-5
            x = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name=f"embed_norm{si}")(x)
            for bi in range(depth):
                dpr = self.drop_path_rate * idx / max(total - 1, 1)
                local = self.block_style == "svt" and bi % 2 == 0
                x = TwinsBlock(heads, local=local, ws=ws, sr_ratio=sr,
                               mlp_ratio=mr, drop_path_rate=dpr,
                               dtype=self.dtype,
                               name=f"blocks_{si}_{bi}")(x, training)
                if bi == 0:
                    # conv positional encoding after the first block (PEG)
                    pe = Conv2d(dim, 3, 1, 1, groups=dim, use_bias=True,
                                dtype=self.dtype, name=f"pos_block{si}")(x)
                    x = x + pe
                idx += 1
            feats.append(x)
        if self.features_only:
            return feats
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


def _twins(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(Twins, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference twins.py:376-422
def _pcpvt(depths):
    return dict(embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 5, 8),
                mlp_ratios=(8, 8, 4, 4), depths=depths,
                sr_ratios=(8, 4, 2, 1), block_style="pcpvt")


TWINS_VARIANTS = {
    "twins_pcpvt_small": _pcpvt((3, 4, 6, 3)),
    "twins_pcpvt_base": _pcpvt((3, 4, 18, 3)),
    "twins_pcpvt_large": _pcpvt((3, 8, 27, 3)),
    "twins_svt_small": dict(embed_dims=(64, 128, 256, 512),
                            num_heads=(2, 4, 8, 16), depths=(2, 2, 10, 4)),
    "twins_svt_base": dict(embed_dims=(96, 192, 384, 768),
                           num_heads=(3, 6, 12, 24), depths=(2, 2, 18, 2)),
    "twins_svt_large": dict(embed_dims=(128, 256, 512, 1024),
                            num_heads=(4, 8, 16, 32), depths=(2, 2, 18, 2)),
}

default_cfgs = {
    name: default_cfg(crop_pct=0.9, first_conv="patch_embeds.0.proj",
                      classifier="head")
    for name in TWINS_VARIANTS}

register_variant_table(__name__, _twins, TWINS_VARIANTS)
