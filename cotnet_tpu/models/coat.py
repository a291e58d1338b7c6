"""CoaT-Lite (reference models/coat.py, 659 LoC — the serial-block 'lite'
variants): factorized attention (softmax over keys, then k^T v) with a
convolutional relative position encoding and conv position embedding."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.vision_transformer import Mlp
from cotnet_tpu.nn import Conv2d, DropPath

default_cfgs = {
    "coat_lite_tiny": default_cfg(first_conv="patch_embed1.proj",
                                  classifier="head"),
    "coat_lite_mini": default_cfg(first_conv="patch_embed1.proj",
                                  classifier="head"),
}


class ConvRelPosEnc(fnn.Module):
    """Depthwise-conv relative position encoding on v, gated by q
    (coat.py ConvRelPosEnc; single window size per head group)."""

    num_heads: int
    window: int = 3
    dtype: Any = None

    @fnn.compact
    def __call__(self, q, v, hw):
        n, h, l, dh = q.shape
        gh, gw = hw
        vi = v.transpose(0, 2, 1, 3).reshape(n, gh, gw, h * dh)
        pad = self.window // 2
        ve = Conv2d(h * dh, self.window, 1, pad, groups=h * dh,
                    use_bias=True, dtype=self.dtype, name="conv")(vi)
        ve = ve.reshape(n, l, h, dh).transpose(0, 2, 1, 3)
        return q * ve


class FactorAttn(fnn.Module):
    """Factorized attention: softmax(k)^T v then q @ that (coat.py
    FactorAtt_ConvRelPosEnc)."""

    num_heads: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, hw, training: bool = False):
        n, l, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = fnn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        ksm = jax.nn.softmax(k.astype(jnp.float32), axis=2)
        factor = jnp.einsum("nhld,nhle->nhde", ksm,
                            v.astype(jnp.float32))  # [n,h,dh,dh]
        qf = jnp.einsum("nhld,nhde->nhle", q.astype(jnp.float32), factor)
        crpe = ConvRelPosEnc(h, dtype=self.dtype, name="crpe")(q, v, hw)
        y = (qf * (dh ** -0.5) + crpe.astype(jnp.float32)).astype(
            self.dtype or x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(n, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class CoatSerialBlock(fnn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, hw, training: bool = False):
        d = x.shape[-1]
        # conv position encoding (CPE): depthwise 3x3 residual
        gh, gw = hw
        n = x.shape[0]
        xi = x.reshape(n, gh, gw, d)
        cpe = Conv2d(d, 3, 1, 1, groups=d, use_bias=True, dtype=self.dtype,
                     name="cpe")(xi)
        x = (xi + cpe).reshape(n, gh * gw, d)

        y = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = FactorAttn(self.num_heads, dtype=self.dtype,
                       name="factoratt_crpe")(y, hw, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp1")(y, training)
        x = x + y
        y = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


class CoatLite(fnn.Module):
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: int = 8
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
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
        feats = []
        for si, (dim, depth, mr) in enumerate(zip(
                self.embed_dims, self.depths, self.mlp_ratios)):
            ps = 4 if si == 0 else 2
            x = Conv2d(dim, ps, ps, 0, use_bias=True, dtype=self.dtype,
                       kernel_init=fnn.initializers.lecun_normal(),
                       name=f"patch_embed{si + 1}")(x)
            x = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"embed_norm{si + 1}")(x)
            gh, gw = x.shape[1], x.shape[2]
            tokens = x.reshape(n, gh * gw, dim)
            for bi in range(depth):
                tokens = CoatSerialBlock(
                    self.num_heads, mr, dtype=self.dtype,
                    name=f"serial_blocks{si + 1}_{bi}")(tokens, (gh, gw),
                                                        training)
            x = tokens.reshape(n, gh, gw, dim)
            feats.append(x)
        if self.features_only:
            return feats
        out = fnn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(
            x.reshape(n, -1, self.embed_dims[-1]))
        out = jnp.mean(out, axis=1)
        if self.num_classes > 0:
            out = fnn.Dense(self.num_classes, dtype=self.dtype,
                            name="head")(out)
        return out


def _coat(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(CoatLite, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


@register_model
def coat_lite_tiny(pretrained=False, **kwargs):
    return _coat("coat_lite_tiny", pretrained,
                 embed_dims=(64, 128, 256, 320), depths=(2, 2, 2, 2),
                 **kwargs)


@register_model
def coat_lite_mini(pretrained=False, **kwargs):
    return _coat("coat_lite_mini", pretrained,
                 embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
                 **kwargs)
