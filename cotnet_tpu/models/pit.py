"""PiT — pooling-based Vision Transformer (reference models/pit.py, 383 LoC):
conv patch embed with overlap, transformer stages separated by depthwise-conv
token pooling (cls token pooled by a Dense)."""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.vision_transformer import Block
from cotnet_tpu.nn import Conv2d

default_cfgs = {}  # populated next to the variant table below


class PoolingTransformer(fnn.Module):
    patch_size: int = 16
    stride: int = 8
    base_dims: Sequence[int] = (48, 48, 48)
    depths: Sequence[int] = (2, 6, 4)
    heads: Sequence[int] = (2, 4, 8)
    mlp_ratio: float = 4.0
    distilled: bool = False  # DeiT-style second token + head (pit.py:220+)
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
        dim0 = self.base_dims[0] * self.heads[0]
        x = Conv2d(dim0, self.patch_size, self.stride, 0, use_bias=True,
                   dtype=self.dtype,
                   kernel_init=fnn.initializers.lecun_normal(),
                   name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", fnn.initializers.normal(0.02),
                         (1, gh, gw, dim0), jnp.float32)
        x = x + pos.astype(x.dtype)
        n_tok = 2 if self.distilled else 1
        cls = self.param("cls_token", fnn.initializers.normal(0.02),
                         (1, n_tok, dim0), jnp.float32)
        cls_tok = jnp.broadcast_to(cls, (n, n_tok, dim0)).astype(x.dtype)

        total = sum(self.depths)
        idx = 0
        feats = []
        for si, (bd, depth, h) in enumerate(
                zip(self.base_dims, self.depths, self.heads)):
            dim = bd * h
            if si > 0:
                # token pooling: dw conv stride 2 on the spatial tokens,
                # Dense on the cls token (reference pit.py ConvHeadPooling)
                x = Conv2d(dim, 3, 2, 1, groups=x.shape[-1], use_bias=True,
                           dtype=self.dtype, name=f"pool{si}_conv")(x)
                gh, gw = x.shape[1], x.shape[2]
                cls_tok = fnn.Dense(dim, dtype=self.dtype,
                                    name=f"pool{si}_fc")(cls_tok)
            tokens = jnp.concatenate(
                [cls_tok, x.reshape(n, gh * gw, dim)], axis=1)
            for bi in range(depth):
                dpr = self.drop_path_rate * idx / max(total - 1, 1)
                tokens = Block(h, self.mlp_ratio, True, self.drop_rate, 0.0,
                               dpr, dtype=self.dtype,
                               name=f"transformers_{si}_blocks_{bi}")(
                                   tokens, training)
                idx += 1
            cls_tok = tokens[:, :n_tok]
            x = tokens[:, n_tok:].reshape(n, gh, gw, dim)
            feats.append(x)
        if self.features_only:
            return feats
        cls_tok = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name="norm")(cls_tok)
        cls_out = cls_tok[:, 0]
        if self.num_classes > 0:
            out = fnn.Dense(self.num_classes, dtype=self.dtype,
                            name="head")(cls_out)
            if self.distilled:
                out_dist = fnn.Dense(self.num_classes, dtype=self.dtype,
                                     name="head_dist")(cls_tok[:, 1])
                out = (out + out_dist) / 2
            return out
        return cls_out


def _pit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(PoolingTransformer, model_name,
                                default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference pit.py:283-383
_PIT_TI = dict(patch_size=16, stride=8, base_dims=(32, 32, 32),
               depths=(2, 6, 4), heads=(2, 4, 8))
_PIT_XS = dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
               depths=(2, 6, 4), heads=(2, 4, 8))
_PIT_S = dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
              depths=(2, 6, 4), heads=(3, 6, 12))
_PIT_B = dict(patch_size=14, stride=7, base_dims=(64, 64, 64),
              depths=(3, 6, 4), heads=(4, 8, 16))

PIT_VARIANTS = {
    "pit_ti_224": dict(_PIT_TI),
    "pit_xs_224": dict(_PIT_XS),
    "pit_s_224": dict(_PIT_S),
    "pit_b_224": dict(_PIT_B),
    "pit_ti_distilled_224": dict(_PIT_TI, distilled=True),
    "pit_xs_distilled_224": dict(_PIT_XS, distilled=True),
    "pit_s_distilled_224": dict(_PIT_S, distilled=True),
    "pit_b_distilled_224": dict(_PIT_B, distilled=True),
}

default_cfgs = {
    name: default_cfg(crop_pct=0.9, first_conv="patch_embed.conv",
                      classifier="head")
    for name in PIT_VARIANTS}

register_variant_table(__name__, _pit, PIT_VARIANTS)
