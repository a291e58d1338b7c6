"""CoaT (reference models/coat.py, 659 LoC).

Co-scale conv-attentional transformers: factorized attention (softmax over
keys, then k^T v) with a multi-window depthwise-conv relative position
encoding (crpe_window {3:2, 5:3, 7:3} — heads split across window sizes,
coat.py:335) and a depthwise conv position encoding, with a cls token per
serial stage.  'Lite' variants are serial-only; coat_tiny/coat_mini add
``parallel_depth`` co-scale blocks over stages 2-4 with bilinear cross-scale
feature exchange and an aggregate head over the three cls tokens
(ParallelBlock, coat.py:231-326; aggregate Conv1d, coat.py:445,580).
"""

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

default_cfgs = {}

# heads per conv window size (reference coat.py:335)
_CRPE_WINDOWS = ((3, 2), (5, 3), (7, 3))


class ConvRelPosEnc(fnn.Module):
    """Depthwise-conv relative position encoding on v, gated by q; heads are
    split across window sizes; the cls row passes through as zero
    (coat.py ConvRelPosEnc)."""

    num_heads: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, q, v, hw):
        n, h, l, dh = q.shape
        gh, gw = hw
        has_cls = l == gh * gw + 1
        q_img = q[:, :, 1:] if has_cls else q
        v_img = v[:, :, 1:] if has_cls else v
        vi = v_img.transpose(0, 2, 1, 3).reshape(n, gh, gw, h * dh)
        outs = []
        start = 0
        for wi, (window, heads) in enumerate(_CRPE_WINDOWS):
            ch = heads * dh
            sl = vi[..., start * dh:start * dh + ch]
            pad = window // 2
            outs.append(Conv2d(ch, window, 1, pad, groups=ch, use_bias=True,
                               dtype=self.dtype, name=f"conv{wi}")(sl))
            start += heads
        ve = jnp.concatenate(outs, axis=-1)
        ve = ve.reshape(n, gh * gw, h, dh).transpose(0, 2, 1, 3)
        out = q_img * ve
        if has_cls:
            zero = jnp.zeros((n, h, 1, dh), out.dtype)
            out = jnp.concatenate([zero, out], axis=2)
        return out


class FactorAttn(fnn.Module):
    """Factorized attention: q @ (softmax(k)^T v) * scale + crpe
    (coat.py FactorAtt_ConvRelPosEnc).  ``crpe`` is a ConvRelPosEnc instance
    constructed at the CoaT level and SHARED by every block of a stage
    (reference coat.py:370-373, :141)."""

    num_heads: int
    crpe: Any = None
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
        factor = jnp.einsum("nhld,nhle->nhde", ksm, v.astype(jnp.float32))
        qf = jnp.einsum("nhld,nhde->nhle", q.astype(jnp.float32), factor)
        crpe = self.crpe(q, v, hw)
        y = (qf * (dh ** -0.5) + crpe.astype(jnp.float32)).astype(
            self.dtype or x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(n, l, d)
        return fnn.Dense(d, dtype=self.dtype, name="proj")(y)


class ConvPosEnc(fnn.Module):
    """Conv position encoding: depthwise 3x3 residual on the image tokens,
    cls token passes through (coat.py ConvPosEnc).  One instance per stage,
    shared across that stage's blocks (reference coat.py:364-367)."""

    dim: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, hw):
        n, l, d = x.shape
        gh, gw = hw
        has_cls = l == gh * gw + 1
        img = x[:, 1:] if has_cls else x
        xi = img.reshape(n, gh, gw, d)
        pe = Conv2d(d, 3, 1, 1, groups=d, use_bias=True, dtype=self.dtype,
                    name="proj")(xi)
        img = (xi + pe).reshape(n, gh * gw, d)
        if has_cls:
            return jnp.concatenate([x[:, :1], img], axis=1)
        return img


class CoatSerialBlock(fnn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    cpe: Any = None     # stage-shared ConvPosEnc
    crpe: Any = None    # stage-shared ConvRelPosEnc
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, hw, training: bool = False):
        d = x.shape[-1]
        x = self.cpe(x, hw)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = FactorAttn(self.num_heads, crpe=self.crpe, dtype=self.dtype,
                       name="factoratt_crpe")(y, hw, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp1")(y, training)
        x = x + y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="dp2")(y, training)
        return x + y


def _interpolate_tokens(x, hw, out_hw):
    """Bilinear resize of the image tokens, cls passthrough
    (ParallelBlock.interpolate, coat.py:274-291)."""
    n, l, d = x.shape
    gh, gw = hw
    cls, img = x[:, :1], x[:, 1:]
    img = img.reshape(n, gh, gw, d)
    img = jax.image.resize(img, (n, out_hw[0], out_hw[1], d), "bilinear")
    img = img.reshape(n, out_hw[0] * out_hw[1], d)
    return jnp.concatenate([cls, img], axis=1)


class CoatParallelBlock(fnn.Module):
    """Co-scale block over stages 2-4: per-scale factor attention, bilinear
    cross-scale exchange, shared MLP (coat.py:231-326).  The crpes are the
    same stage-shared instances the serial blocks use (coat.py:426)."""

    num_heads: int
    mlp_ratio: float = 4.0
    crpes: Any = None   # (crpe2, crpe3, crpe4)
    dtype: Any = None

    @fnn.compact
    def __call__(self, x2, x3, x4, sizes, training: bool = False):
        s2, s3, s4 = sizes
        d = x2.shape[-1]
        cur = []
        for i, (x, s) in enumerate(zip((x2, x3, x4), sizes)):
            y = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"norm1{i + 2}")(x)
            cur.append(FactorAttn(self.num_heads, crpe=self.crpes[i],
                                  dtype=self.dtype,
                                  name=f"factoratt_crpe{i + 2}")(
                y, s, training))
        c2 = cur[0] + _interpolate_tokens(cur[1], s3, s2) + \
            _interpolate_tokens(cur[2], s4, s2)
        c3 = cur[1] + _interpolate_tokens(cur[2], s4, s3) + \
            _interpolate_tokens(cur[0], s2, s3)
        c4 = cur[2] + _interpolate_tokens(cur[1], s3, s4) + \
            _interpolate_tokens(cur[0], s2, s4)
        x2, x3, x4 = x2 + c2, x3 + c3, x4 + c4

        # shared-weight MLP across scales (coat.py:260-264)
        mlp = Mlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")
        outs = []
        for i, x in enumerate((x2, x3, x4)):
            y = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"norm2{i + 2}")(x)
            outs.append(x + mlp(y, training))
        return tuple(outs)


class CoaT(fnn.Module):
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    serial_depths: Sequence[int] = (2, 2, 2, 2)
    parallel_depth: int = 0
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
        stage_tokens = []
        stage_sizes = []
        # one cpe/crpe per stage, shared by all of that stage's blocks
        # (reference coat.py:364-373)
        cpes = [ConvPosEnc(dim, dtype=self.dtype, name=f"cpe{i + 1}")
                for i, dim in enumerate(self.embed_dims)]
        crpes = [ConvRelPosEnc(self.num_heads, dtype=self.dtype,
                               name=f"crpe{i + 1}")
                 for i in range(len(self.embed_dims))]
        for si, (dim, depth, mr) in enumerate(zip(
                self.embed_dims, self.serial_depths, self.mlp_ratios)):
            ps = 4 if si == 0 else 2
            x = Conv2d(dim, ps, ps, 0, use_bias=True, dtype=self.dtype,
                       kernel_init=fnn.initializers.lecun_normal(),
                       name=f"patch_embed{si + 1}")(x)
            # patch-embed norm is a PLAIN nn.LayerNorm in the reference
            # (coat.py:346) -> torch default eps 1e-5, unlike the block
            # norms' 1e-6 partial (coat.py:332)
            x = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name=f"embed_norm{si + 1}")(x)
            gh, gw = x.shape[1], x.shape[2]
            cls = self.param(f"cls_token{si + 1}",
                             fnn.initializers.normal(0.02), (1, 1, dim),
                             jnp.float32)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n, 1, dim)).astype(x.dtype),
                 x.reshape(n, gh * gw, dim)], axis=1)
            for bi in range(depth):
                tokens = CoatSerialBlock(
                    self.num_heads, mr, cpe=cpes[si], crpe=crpes[si],
                    dtype=self.dtype,
                    name=f"serial_blocks{si + 1}_{bi}")(tokens, (gh, gw),
                                                        training)
            stage_tokens.append(tokens)
            stage_sizes.append((gh, gw))
            x = tokens[:, 1:].reshape(n, gh, gw, dim)
            feats.append(x)
        if self.features_only and self.parallel_depth == 0:
            return feats

        if self.parallel_depth > 0:
            t2, t3, t4 = stage_tokens[1], stage_tokens[2], stage_tokens[3]
            for pi in range(self.parallel_depth):
                # cpe2-4 re-applied before every parallel block
                # (reference coat.py:549)
                t2 = cpes[1](t2, stage_sizes[1])
                t3 = cpes[2](t3, stage_sizes[2])
                t4 = cpes[3](t4, stage_sizes[3])
                t2, t3, t4 = CoatParallelBlock(
                    self.num_heads, self.mlp_ratios[1], crpes=tuple(crpes[1:]),
                    dtype=self.dtype,
                    name=f"parallel_blocks_{pi}")(
                    t2, t3, t4, stage_sizes[1:], training)
            if self.features_only:
                return [feats[0]] + [
                    t[:, 1:].reshape(n, s[0], s[1], t.shape[-1])
                    for t, s in zip((t2, t3, t4), stage_sizes[1:])]
            # aggregate head over the three cls tokens (coat.py:573-581)
            cls_all = []
            for i, t in enumerate((t2, t3, t4)):
                y = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name=f"norm{i + 2}")(t)
                cls_all.append(y[:, :1])
            merged = jnp.concatenate(cls_all, axis=1)  # [n, 3, d]
            agg = fnn.Dense(1, use_bias=True, dtype=self.dtype,
                            name="aggregate")(merged.transpose(0, 2, 1))
            out = agg[..., 0]
        else:
            out = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(
                stage_tokens[-1])[:, 0]
        if self.drop_rate and training:
            out = fnn.Dropout(self.drop_rate, deterministic=False)(out)
        if self.num_classes > 0:
            out = fnn.Dense(self.num_classes, dtype=self.dtype,
                            name="head")(out)
        return out


def _coat(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(CoaT, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference coat.py:617-659
COAT_VARIANTS = {
    "coat_tiny": dict(embed_dims=(152, 152, 152, 152),
                      serial_depths=(2, 2, 2, 2), parallel_depth=6,
                      mlp_ratios=(4, 4, 4, 4)),
    "coat_mini": dict(embed_dims=(152, 216, 216, 216),
                      serial_depths=(2, 2, 2, 2), parallel_depth=6,
                      mlp_ratios=(4, 4, 4, 4)),
    "coat_lite_tiny": dict(embed_dims=(64, 128, 256, 320),
                           serial_depths=(2, 2, 2, 2)),
    "coat_lite_mini": dict(embed_dims=(64, 128, 320, 512),
                           serial_depths=(2, 2, 2, 2)),
    "coat_lite_small": dict(embed_dims=(64, 128, 320, 512),
                            serial_depths=(3, 4, 6, 3)),
}

default_cfgs = {
    name: default_cfg(crop_pct=0.9, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                      first_conv="patch_embed1.proj", classifier="head")
    for name in COAT_VARIANTS}

register_variant_table(__name__, _coat, COAT_VARIANTS)
