"""CaiT — class-attention image transformer (reference models/cait.py,
403 LoC): self-attention blocks with LayerScale + talking-heads, then
class-attention blocks that only update the cls token."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.norm import LayerNorm

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.vision_transformer import Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {}  # populated next to the variant table below


class TalkingHeadAttn(fnn.Module):
    """Self-attention with talking heads (cait.py ClassAttn/TalkingHeadAttn)."""

    num_heads: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = fnn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (dh ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k).astype(jnp.float32)
        # talking heads: mix heads pre- and post-softmax
        attn = fnn.DenseGeneral(h, axis=-1, dtype=jnp.float32,
                                name="proj_l")(attn.transpose(0, 2, 3, 1)
                                               ).transpose(0, 3, 1, 2)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = fnn.DenseGeneral(h, axis=-1, dtype=jnp.float32,
                                name="proj_w")(attn.transpose(0, 2, 3, 1)
                                               ).transpose(0, 3, 1, 2)
        attn = attn.astype(self.dtype or x.dtype)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(n, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class ClassAttn(fnn.Module):
    """Attention where only the cls token is the query (cait.py ClassAttn)."""

    num_heads: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        q = fnn.Dense(d, dtype=self.dtype, name="q")(x[:, :1])
        k = fnn.Dense(d, dtype=self.dtype, name="k")(x)
        v = fnn.Dense(d, dtype=self.dtype, name="v")(x)
        q = q.reshape(n, 1, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
        k = k.reshape(n, l, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(n, l, h, dh).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", q, k).astype(jnp.float32), -1
        ).astype(self.dtype or x.dtype)
        y = jnp.einsum("nhqk,nhkd->nqhd", attn, v).reshape(n, 1, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class LayerScaleBlock(fnn.Module):
    num_heads: int
    init_values: float = 1e-5
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    class_attn: bool = False
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        d = x.shape[-1]
        g1 = self.param("gamma_1", fnn.initializers.constant(self.init_values),
                        (d,), jnp.float32)
        g2 = self.param("gamma_2", fnn.initializers.constant(self.init_values),
                        (d,), jnp.float32)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.class_attn:
            a = ClassAttn(self.num_heads, dtype=self.dtype, name="attn")(
                y, training)
            a = g1.astype(a.dtype) * a
            if self.drop_path_rate > 0:
                a = DropPath(self.drop_path_rate, name="dp1")(a, training)
            x = jnp.concatenate([x[:, :1] + a, x[:, 1:]], axis=1)
        else:
            a = TalkingHeadAttn(self.num_heads, dtype=self.dtype,
                                name="attn")(y, training)
            a = g1.astype(a.dtype) * a
            if self.drop_path_rate > 0:
                a = DropPath(self.drop_path_rate, name="dp1")(a, training)
            x = x + a
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.class_attn:
            m = Mlp(int(d * self.mlp_ratio), dtype=self.dtype,
                    name="mlp")(y[:, :1], training)
            m = g2.astype(m.dtype) * m
            if self.drop_path_rate > 0:
                m = DropPath(self.drop_path_rate, name="dp2")(m, training)
            return jnp.concatenate([x[:, :1] + m, x[:, 1:]], axis=1)
        m = Mlp(int(d * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, training)
        m = g2.astype(m.dtype) * m
        if self.drop_path_rate > 0:
            m = DropPath(self.drop_path_rate, name="dp2")(m, training)
        return x + m


class Cait(fnn.Module):
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 24
    num_heads: int = 4
    depth_token_only: int = 2
    init_values: float = 1e-5
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
            x = LayerScaleBlock(self.num_heads, self.init_values,
                                drop_path_rate=dpr, dtype=self.dtype,
                                name=f"blocks_{i}")(x, training)
        if self.features_only:
            return [x.reshape(n, gh, gw, self.embed_dim)]

        cls = self.param("cls_token", fnn.initializers.normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1)
        for i in range(self.depth_token_only):
            tokens = LayerScaleBlock(self.num_heads, self.init_values,
                                     class_attn=True, dtype=self.dtype,
                                     name=f"blocks_token_only_{i}")(
                                         tokens, training)
        out = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            name="norm")(tokens[:, 0])
        if self.num_classes > 0:
            return fnn.Dense(self.num_classes, dtype=self.dtype,
                             name="head")(out)
        return out


def _cait(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(Cait, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference cait.py:330-403
def _cait_row(dim, depth, heads, init_scale):
    return dict(patch_size=16, embed_dim=dim, depth=depth, num_heads=heads,
                init_values=init_scale)


CAIT_VARIANTS = {
    "cait_xxs24_224": _cait_row(192, 24, 4, 1e-5),
    "cait_xxs24_384": _cait_row(192, 24, 4, 1e-5),
    "cait_xxs36_224": _cait_row(192, 36, 4, 1e-5),
    "cait_xxs36_384": _cait_row(192, 36, 4, 1e-5),
    "cait_xs24_384": _cait_row(288, 24, 6, 1e-5),
    "cait_s24_224": _cait_row(384, 24, 8, 1e-5),
    "cait_s24_384": _cait_row(384, 24, 8, 1e-5),
    "cait_s36_224": _cait_row(384, 36, 8, 1e-6),
    "cait_s36_384": _cait_row(384, 36, 8, 1e-6),
    "cait_m36_384": _cait_row(768, 36, 16, 1e-6),
    "cait_m48_448": _cait_row(768, 48, 16, 1e-6),
}

default_cfgs = {}
for _name in CAIT_VARIANTS:
    _size = int(_name.rsplit("_", 1)[1])
    default_cfgs[_name] = default_cfg(
        input_size=(3, _size, _size), crop_pct=1.0,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        first_conv="patch_embed.proj", classifier="head")

register_variant_table(__name__, _cait, CAIT_VARIANTS)
