"""Swin Transformer (reference models/swin_transformer.py, 651 LoC).

Windowed attention with relative position bias + shifted windows + patch
merging.  Window partitioning is pure reshape/transpose (layout work XLA is
good at); the shift is jnp.roll.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.vision_transformer import Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {}  # populated next to the variant table below


def window_partition(x, ws):
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    n = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(fnn.Module):
    num_heads: int
    window_size: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, mask=None, training: bool = False):
        b, l, d = x.shape
        h = self.num_heads
        dh = d // h
        ws = self.window_size
        qkv = fnn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = attn * (dh ** -0.5)

        table = self.param("relative_position_bias_table",
                           fnn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, h), jnp.float32)
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(l, l, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, l, l) + mask[None, :, None]
            attn = attn.reshape(b, h, l, l)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype or x.dtype)
        y = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(b, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class SwinBlock(fnn.Module):
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # attention mask across the wrapped boundaries
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[:, :, 0]
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(self.num_heads, ws, dtype=self.dtype,
                               name="attn")(windows, mask, training)
        y = window_reverse(attn, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path1")(y, training)
        x = x + y
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y.reshape(n, h * w, c), training).reshape(
                    n, h, w, c)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path2")(y, training)
        return x + y


class SwinTransformer(fnn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        p = self.patch_size
        x = Conv2d(self.embed_dim, p, p, 0, use_bias=True, dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="patch_embed")(x)
        n, h, w, c = x.shape
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="patch_norm")(x)

        total = sum(self.depths)
        idx = 0
        feats = []
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2 ** si)
            if si > 0:
                # patch merging: 2x2 concat + reduction
                n, h, w, c = x.shape
                x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
                    0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
                # channel order (x0, x1, x2, x3) = (even/even, odd/even,
                # even/odd, odd/odd) in torch; here (h2, w2) raster — the
                # converter permutes the reduction matrix accordingly
                x = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name=f"merge_norm{si}")(x)
                x = fnn.Dense(dim, use_bias=False, dtype=self.dtype,
                              name=f"merge_reduction{si}")(x)
            for bi in range(depth):
                dpr = self.drop_path_rate * idx / max(total - 1, 1)
                x = SwinBlock(heads, self.window_size,
                              shift=0 if bi % 2 == 0 else self.window_size // 2,
                              mlp_ratio=self.mlp_ratio, drop_path_rate=dpr,
                              dtype=self.dtype,
                              name=f"layers_{si}_{bi}")(x, training)
                idx += 1
            feats.append(x)
        if self.features_only:
            return feats
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


def _swin(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(SwinTransformer, model_name,
                                default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference swin_transformer.py:566-651
def _swin_row(dim, depths, heads, window):
    return dict(patch_size=4, window_size=window, embed_dim=dim,
                depths=depths, num_heads=heads)


SWIN_VARIANTS = {
    "swin_tiny_patch4_window7_224": _swin_row(
        96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "swin_small_patch4_window7_224": _swin_row(
        96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "swin_base_patch4_window7_224": _swin_row(
        128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    "swin_base_patch4_window12_384": _swin_row(
        128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    "swin_large_patch4_window7_224": _swin_row(
        192, (2, 2, 18, 2), (6, 12, 24, 48), 7),
    "swin_large_patch4_window12_384": _swin_row(
        192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
    "swin_base_patch4_window7_224_in22k": _swin_row(
        128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    "swin_base_patch4_window12_384_in22k": _swin_row(
        128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    "swin_large_patch4_window7_224_in22k": _swin_row(
        192, (2, 2, 18, 2), (6, 12, 24, 48), 7),
    "swin_large_patch4_window12_384_in22k": _swin_row(
        192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
}

default_cfgs = {}
for _name in SWIN_VARIANTS:
    _size = 384 if "_384" in _name else 224
    default_cfgs[_name] = default_cfg(
        input_size=(3, _size, _size),
        crop_pct=1.0 if _size == 384 else 0.9,
        num_classes=21841 if "in22k" in _name else 1000,
        first_conv="patch_embed.proj", classifier="head")

register_variant_table(__name__, _swin, SWIN_VARIANTS)
