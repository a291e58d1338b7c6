"""XCiT (reference models/xcit.py, 810 LoC): cross-covariance attention
(channel-wise attention with L2-normalized q/k and a learned temperature),
local patch interaction convs, and class-attention head blocks."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.cait import ClassAttn
from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.vision_transformer import Mlp
from cotnet_tpu.nn import Conv2d, DropPath, batch_norm, get_act_fn

default_cfgs = {}  # populated next to the variant table below


class XCA(fnn.Module):
    """Cross-covariance attention (xcit.py XCA)."""

    num_heads: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = fnn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, dh).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [n, h, dh, L]
        q = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        temp = self.param("temperature", fnn.initializers.ones, (h, 1, 1),
                          jnp.float32)
        attn = jnp.einsum("nhdl,nhel->nhde", q, k) * temp[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype or x.dtype)
        y = jnp.einsum("nhde,nhel->nhdl", attn,
                       v.astype(self.dtype or x.dtype))
        y = y.transpose(0, 3, 1, 2).reshape(n, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class LPI(fnn.Module):
    """Local patch interaction: two depthwise 3x3 convs (xcit.py LPI)."""

    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, hw, training: bool = False):
        n, l, d = x.shape
        h, w = hw
        y = x.reshape(n, h, w, d)
        y = Conv2d(d, 3, 1, 1, groups=d, use_bias=True, dtype=self.dtype,
                   name="conv1")(y)
        y = get_act_fn("gelu")(y)
        y = batch_norm(y, training, name="bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = Conv2d(d, 3, 1, 1, groups=d, use_bias=True, dtype=self.dtype,
                   name="conv2")(y)
        return y.reshape(n, l, d)


class XCABlock(fnn.Module):
    num_heads: int
    eta: float = 1.0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, hw, training: bool = False):
        d = x.shape[-1]
        g1 = self.param("gamma1", fnn.initializers.constant(self.eta), (d,),
                        jnp.float32)
        g2 = self.param("gamma2", fnn.initializers.constant(self.eta), (d,),
                        jnp.float32)
        g3 = self.param("gamma3", fnn.initializers.constant(self.eta), (d,),
                        jnp.float32)

        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = XCA(self.num_heads, dtype=self.dtype, name="attn")(y, training)
        y = g1.astype(y.dtype) * y
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp1")(y, training)
        x = x + y

        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        y = LPI(dtype=self.dtype, axis_name=self.axis_name, name="local_mp")(
            y, hw, training)
        y = g3.astype(y.dtype) * y
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp3")(y, training)
        x = x + y

        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, training)
        y = g2.astype(y.dtype) * y
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


class XCiT(fnn.Module):
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 4
    cls_attn_layers: int = 2
    eta: float = 1.0
    tokens_norm: bool = True  # norm all tokens (vs just cls) in CA blocks
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
        # conv patch embed: stack of stride-2 3x3 conv+gelu (xcit.py
        # ConvPatchEmbed; p16 = four stride-2 convs)
        dims = [self.embed_dim // 8, self.embed_dim // 4, self.embed_dim // 2,
                self.embed_dim]
        steps = {16: 4, 8: 3}[self.patch_size]
        for i in range(steps):
            dim_i = dims[i + (4 - steps)]
            # bias-free: each conv is followed by BN (reference xcit.py
            # conv3x3 uses torch Conv2d(bias=False) inside Sequential+BN)
            x = Conv2d(dim_i, 3, 2, 1, use_bias=False, dtype=self.dtype,
                       kernel_init=fnn.initializers.lecun_normal(),
                       name=f"patch_conv{i}")(x)
            x = batch_norm(x, training, name=f"patch_bn{i}", dtype=self.dtype,
                           axis_name=self.axis_name)
            if i < steps - 1:
                x = get_act_fn("gelu")(x)
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(n, gh * gw, self.embed_dim)
        # Fourier positional encoding + learned 1x1 projection (reference
        # PositionalEncodingFourier, xcit.py:37-77): sin/cos features of
        # normalized (y, x) grid coords, hidden_dim=32 per axis
        hidden = 32
        coords = jnp.arange(1, gh + 1, dtype=jnp.float32)
        y_embed = coords[:, None] / (gh + 1e-6) * (2 * jnp.pi)
        coords_w = jnp.arange(1, gw + 1, dtype=jnp.float32)
        x_embed = coords_w[None, :] / (gw + 1e-6) * (2 * jnp.pi)
        dim_t = 10000.0 ** (2 * (jnp.arange(hidden) // 2) / hidden)
        pos_y = jnp.broadcast_to(y_embed[:, :, None],
                                 (gh, 1, hidden)) / dim_t
        pos_x = jnp.broadcast_to(x_embed[:, :, None],
                                 (1, gw, hidden)) / dim_t
        pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                           jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(
            gh, 1, hidden)
        pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                           jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(
            1, gw, hidden)
        pos = jnp.concatenate([jnp.broadcast_to(pos_y, (gh, gw, hidden)),
                               jnp.broadcast_to(pos_x, (gh, gw, hidden))],
                              axis=-1)[None]  # [1, gh, gw, 64]
        pos = Conv2d(self.embed_dim, 1, use_bias=True, dtype=self.dtype,
                     name="pos_proj")(pos)
        tokens = tokens + pos.reshape(1, gh * gw,
                                      self.embed_dim).astype(tokens.dtype)

        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            tokens = XCABlock(self.num_heads, self.eta, drop_path_rate=dpr,
                              dtype=self.dtype, axis_name=self.axis_name,
                              name=f"blocks_{i}")(tokens, (gh, gw), training)
        if self.features_only:
            return [tokens.reshape(n, gh, gw, self.embed_dim)]

        cls = self.param("cls_token", fnn.initializers.normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)
                              ).astype(tokens.dtype), tokens], axis=1)
        # class-attention blocks with per-branch layer-scale gammas and the
        # tokens_norm choice (reference ClassAttentionBlock, xcit.py:215-262)
        d = self.embed_dim
        for i in range(self.cls_attn_layers):
            g1 = self.param(f"ca_gamma1_{i}",
                            fnn.initializers.constant(self.eta), (d,),
                            jnp.float32)
            g2 = self.param(f"ca_gamma2_{i}",
                            fnn.initializers.constant(self.eta), (d,),
                            jnp.float32)
            # faithful to reference ClassAttentionBlock.forward
            # (xcit.py:236-253): the attn residual adds the *normed* patch
            # tokens scaled by gamma1, and the final residual doubles the
            # patch tokens (x_res + x with x[:,1:] == x_res[:,1:]) — both
            # quirks feed the next block's attention, so keep them.
            y = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"ca_norm{i}")(tokens)
            a = ClassAttn(self.num_heads, dtype=self.dtype,
                          name=f"cls_attn_{i}")(y, training)
            x_attn = jnp.concatenate([a, y[:, 1:]], axis=1)
            tokens = tokens + g1.astype(a.dtype) * x_attn
            if self.tokens_norm:
                tokens = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name=f"ca_norm_mlp{i}")(tokens)
            else:
                tokens = jnp.concatenate(
                    [LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   name=f"ca_norm_mlp{i}")(tokens[:, :1]),
                     tokens[:, 1:]], axis=1)
            m = Mlp(int(self.embed_dim * 4), dtype=self.dtype,
                    name=f"ca_mlp{i}")(tokens[:, :1], training)
            tokens = tokens + jnp.concatenate(
                [g2.astype(m.dtype) * m, tokens[:, 1:]], axis=1)
        out = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            name="norm")(tokens[:, 0])
        if self.num_classes > 0:
            return fnn.Dense(self.num_classes, dtype=self.dtype,
                             name="head")(out)
        return out


def _xcit(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(XCiT, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference xcit.py:477-810 — every variant is derivable from its name:
# xcit_{size}_{depth}_p{patch}_{res}[_dist]; eta=1.0 @ depth12, 1e-5 @
# depth24; tokens_norm False only for nano
_XCIT_SIZES = {"nano": (128, 4), "tiny": (192, 4), "small": (384, 8),
               "medium": (512, 8), "large": (768, 16)}

XCIT_VARIANTS = {}
for _size in ("nano", "tiny", "small", "medium", "large"):
    for _depth in (12, 24):
        if _size in ("medium", "large") and _depth == 12:
            continue
        if _size == "nano" and _depth == 24:
            continue
        for _patch in (16, 8):
            _dim, _heads = _XCIT_SIZES[_size]
            _row = dict(patch_size=_patch, embed_dim=_dim, depth=_depth,
                        num_heads=_heads,
                        eta=1.0 if _depth == 12 else 1e-5,
                        tokens_norm=_size != "nano")
            XCIT_VARIANTS[f"xcit_{_size}_{_depth}_p{_patch}_224"] = _row
            XCIT_VARIANTS[f"xcit_{_size}_{_depth}_p{_patch}_224_dist"] = _row
            XCIT_VARIANTS[f"xcit_{_size}_{_depth}_p{_patch}_384_dist"] = _row

default_cfgs = {
    name: default_cfg(
        input_size=(3, 384, 384) if "_384_" in name + "_" else (3, 224, 224),
        crop_pct=1.0, first_conv="patch_embed.proj.0.0", classifier="head")
    for name in XCIT_VARIANTS}

register_variant_table(__name__, _xcit, XCIT_VARIANTS)
