"""LeViT (reference models/levit.py, 564 LoC): conv stem, BN-based linear
layers, attention with learned per-head relative position biases, and
attention-subsample downsampling between stages."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import Conv2d, batch_norm, get_act_fn

default_cfgs = {}  # populated next to the variant table below


class LinearBN(fnn.Module):
    """Dense (no bias) + BatchNorm1d (levit.py Linear_BN)."""

    features: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        y = fnn.Dense(self.features, use_bias=False, dtype=self.dtype,
                      name="linear")(x)
        return batch_norm(y, training, name="bn", dtype=self.dtype,
                          axis_name=self.axis_name)


def _attn_bias_idx(res_q: int, res_kv: int, stride: int = 1) -> np.ndarray:
    """[Lq, Lkv] index into a distinct-offset bias table (levit.py)."""
    pts_kv = [(i, j) for i in range(res_kv) for j in range(res_kv)]
    pts_q = [(i * stride, j * stride) for i in range(res_q)
             for j in range(res_q)]
    offsets = {}
    idx = np.zeros((len(pts_q), len(pts_kv)), np.int32)
    for qi, (qy, qx) in enumerate(pts_q):
        for ki, (ky, kx) in enumerate(pts_kv):
            off = (abs(qy - ky), abs(qx - kx))
            if off not in offsets:
                offsets[off] = len(offsets)
            idx[qi, ki] = offsets[off]
    return idx, len(offsets)


class LevitAttention(fnn.Module):
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h, kd = self.num_heads, self.key_dim
        vd = int(self.attn_ratio * kd)
        qkv = LinearBN(h * (2 * kd + vd), dtype=self.dtype,
                       axis_name=self.axis_name, name="qkv")(x, training)
        qkv = qkv.reshape(n, l, h, 2 * kd + vd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        idx, n_off = _attn_bias_idx(self.resolution, self.resolution)
        bias_table = self.param("attention_biases",
                                fnn.initializers.zeros, (h, n_off),
                                jnp.float32)
        bias = bias_table[:, jnp.asarray(idx)]  # [h, L, L]

        attn = jnp.einsum("nhqd,nhkd->nhqk", q * (kd ** -0.5), k
                          ).astype(jnp.float32) + bias[None]
        attn = jax.nn.softmax(attn, -1).astype(self.dtype or x.dtype)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(n, l, h * vd)
        y = get_act_fn("hard_swish")(y)
        return LinearBN(d, dtype=self.dtype, axis_name=self.axis_name,
                        name="proj")(y, training)


class LevitSubsample(fnn.Module):
    """Attention downsample: queries from the stride-2 subgrid (levit.py
    AttentionSubsample)."""

    out_dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        res = self.resolution
        res_q = (res - 1) // 2 + 1
        h, kd = self.num_heads, self.key_dim
        vd = int(self.attn_ratio * kd)
        kv = LinearBN(h * (kd + vd), dtype=self.dtype,
                      axis_name=self.axis_name, name="kv")(x, training)
        kv = kv.reshape(n, l, h, kd + vd)
        k, v = jnp.split(kv, [kd], axis=-1)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # subsample queries on the stride-2 grid
        xg = x.reshape(n, res, res, d)[:, ::2, ::2].reshape(n, res_q * res_q, d)
        q = LinearBN(h * kd, dtype=self.dtype, axis_name=self.axis_name,
                     name="q")(xg, training)
        q = q.reshape(n, res_q * res_q, h, kd).transpose(0, 2, 1, 3)

        idx, n_off = _attn_bias_idx(res_q, res, stride=2)
        bias_table = self.param("attention_biases", fnn.initializers.zeros,
                                (h, n_off), jnp.float32)
        bias = bias_table[:, jnp.asarray(idx)]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * (kd ** -0.5), k
                          ).astype(jnp.float32) + bias[None]
        attn = jax.nn.softmax(attn, -1).astype(self.dtype or x.dtype)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(
            n, res_q * res_q, h * vd)
        y = get_act_fn("hard_swish")(y)
        return LinearBN(self.out_dim, dtype=self.dtype,
                        axis_name=self.axis_name, name="proj")(y, training)


class LevitMlp(fnn.Module):
    ratio: float = 2.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        y = LinearBN(int(d * self.ratio), dtype=self.dtype,
                     axis_name=self.axis_name, name="fc1")(x, training)
        y = get_act_fn("hard_swish")(y)
        return LinearBN(d, dtype=self.dtype, axis_name=self.axis_name,
                        name="fc2")(y, training)


class Levit(fnn.Module):
    embed_dims: Sequence[int] = (128, 256, 384)
    key_dim: int = 16
    num_heads: Sequence[int] = (4, 8, 12)
    depths: Sequence[int] = (4, 4, 4)
    attn_ratio: float = 2.0
    mlp_ratio: float = 2.0
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    distillation: bool = False  # reference levit.py:421 (entrypoints keep it off)
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        hs = get_act_fn("hard_swish")
        chans = [self.embed_dims[0] // 8, self.embed_dims[0] // 4,
                 self.embed_dims[0] // 2, self.embed_dims[0]]
        for i, ch in enumerate(chans):
            x = Conv2d(ch, 3, 2, 1, dtype=self.dtype, name=f"stem{i}")(x)
            x = batch_norm(x, training, name=f"stem_bn{i}", dtype=self.dtype,
                           axis_name=self.axis_name)
            if i < 3:
                x = hs(x)
        n, gh, gw, d = x.shape
        tokens = x.reshape(n, gh * gw, d)
        res = gh
        feats = []
        for si, (dim, heads, depth) in enumerate(zip(
                self.embed_dims, self.num_heads, self.depths)):
            for bi in range(depth):
                a = LevitAttention(self.key_dim, heads, self.attn_ratio, res,
                                   dtype=self.dtype, axis_name=self.axis_name,
                                   name=f"attn_{si}_{bi}")(tokens, training)
                tokens = tokens + a
                m = LevitMlp(self.mlp_ratio, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"mlp_{si}_{bi}")(tokens, training)
                tokens = tokens + m
            feats.append(tokens.reshape(n, res, res, tokens.shape[-1]))
            if si < len(self.embed_dims) - 1:
                # down_ops: heads = in_dim // key_dim, attn_ratio fixed 4
                # (reference levit.py:442-445)
                tokens = LevitSubsample(
                    self.embed_dims[si + 1], self.key_dim,
                    self.embed_dims[si] // self.key_dim,
                    4.0, res, dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"downsample_{si}")(tokens, training)
                res = (res - 1) // 2 + 1
                m = LevitMlp(self.mlp_ratio, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"ds_mlp_{si}")(tokens, training)
                tokens = tokens + m
        if self.features_only:
            return feats
        out = jnp.mean(tokens, axis=1)
        out = batch_norm(out, training, name="head_bn", dtype=self.dtype,
                         axis_name=self.axis_name)
        if self.num_classes > 0:
            logits = fnn.Dense(self.num_classes, dtype=self.dtype,
                               name="head")(out)
            if self.distillation:
                # distillation head (levit.py:494-496); averaged at inference
                dist = fnn.Dense(self.num_classes, dtype=self.dtype,
                                 name="head_dist")(out)
                logits = (logits + dist) / 2
            return logits
        return out


def _levit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(Levit, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference levit.py:69-81 model_cfgs
LEVIT_VARIANTS = {
    "levit_128s": dict(embed_dims=(128, 256, 384), key_dim=16,
                       num_heads=(4, 6, 8), depths=(2, 3, 4)),
    "levit_128": dict(embed_dims=(128, 256, 384), key_dim=16,
                      num_heads=(4, 8, 12), depths=(4, 4, 4)),
    "levit_192": dict(embed_dims=(192, 288, 384), key_dim=32,
                      num_heads=(3, 5, 6), depths=(4, 4, 4)),
    "levit_256": dict(embed_dims=(256, 384, 512), key_dim=32,
                      num_heads=(4, 6, 8), depths=(4, 4, 4)),
    "levit_384": dict(embed_dims=(384, 512, 768), key_dim=32,
                      num_heads=(6, 9, 12), depths=(4, 4, 4)),
}

default_cfgs = {
    name: default_cfg(crop_pct=0.9, first_conv="patch_embed.0.c",
                      classifier="head.l")
    for name in LEVIT_VARIANTS}

register_variant_table(__name__, _levit, LEVIT_VARIANTS)
