"""BoTNet-S1 (reference models/botnet.py): ResNet chassis whose stage-4
blocks replace the 3x3 conv with global multi-head self-attention using 2-D
relative position biases (RelPosSelfAttention :43-106, MHSA :172-194), at
stride 1 (stage-4 stride-2 blocks become stride-1 with a 1x1 projection,
botnet.py:218-226).  Pure einsum/MXU work — no custom kernel needed."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import Conv2d, DropBlock2d, DropPath, batch_norm, create_attn, get_act_fn

default_cfgs = {
    "BoTNetS1_59": default_cfg(input_size=(3, 256, 256), pool_size=(16, 16),
                               crop_pct=0.888),
    "BoTNetS1_128": default_cfg(input_size=(3, 256, 256), pool_size=(16, 16),
                                crop_pct=0.888),
}


def _rel_to_abs(x):
    """[B, heads, L, 2L-1] relative -> [B, heads, L, L] absolute
    (reference botnet.py:95-106, the padding/reshape trick)."""
    b, heads, length, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 1)])
    x = x.reshape(b, heads, length * 2 * length)
    x = jnp.pad(x, [(0, 0), (0, 0), (0, length - 1)])
    x = x.reshape(b, heads, length + 1, 2 * length - 1)
    return x[:, :, :length, length - 1:]


def _relative_logits_1d(q, rel_k):
    """q: [B, heads, H, W, d]; rel_k: [2W-1, d] -> [B, heads, H, W, W]
    (reference botnet.py:81-93)."""
    b, heads, h, w, d = q.shape
    logits = jnp.einsum("bnxyd,md->bnxym", q, rel_k)  # [B, heads, H, W, 2W-1]
    logits = _rel_to_abs(logits.reshape(b, heads * h, w, 2 * w - 1))
    return logits.reshape(b, heads, h, w, w)


class RelPosSelfAttention(fnn.Module):
    """Scaled dot-product attention over all HxW positions + rel-pos."""

    heads: int
    dim_head: int
    h: int
    w: int
    dtype: Any = None

    @fnn.compact
    def __call__(self, q, k, v):
        # q,k,v: [B, heads, H, W, d]
        b, heads, h, w, d = q.shape
        init = fnn.initializers.normal(self.dim_head ** -0.5)
        rel_w = self.param("rel_emb_w", init, (2 * self.w - 1, self.dim_head),
                           jnp.float32)
        rel_h = self.param("rel_emb_h", init, (2 * self.h - 1, self.dim_head),
                           jnp.float32)
        qf = q.astype(jnp.float32) * (d ** -0.5)
        logits = jnp.einsum("bnhwd,bnpqd->bnhwpq", qf, k.astype(jnp.float32))

        rel_logits_w = _relative_logits_1d(qf, rel_w)  # [b,n,h,w,w]
        rel_logits_w = rel_logits_w[:, :, :, None, :, :]  # [b,n,h,1,w,w]
        rel_logits_w = jnp.broadcast_to(
            rel_logits_w, (b, heads, h, h, w, w)).transpose(0, 1, 2, 4, 3, 5)

        qt = qf.transpose(0, 1, 3, 2, 4)  # swap h/w
        rel_logits_h = _relative_logits_1d(qt, rel_h)  # [b,n,w,h,h]
        rel_logits_h = rel_logits_h[:, :, :, None, :, :]  # [b,n,w,1,h,h]
        rel_logits_h = jnp.broadcast_to(
            rel_logits_h, (b, heads, w, w, h, h)).transpose(0, 1, 4, 2, 5, 3)

        logits = logits + rel_logits_w + rel_logits_h
        weights = jax.nn.softmax(logits.reshape(b, heads, h, w, h * w), -1)
        weights = weights.reshape(b, heads, h, w, h, w)
        out = jnp.einsum("bnhwpq,bnpqd->bhwnd", weights,
                         v.astype(jnp.float32))
        return out.reshape(b, h, w, heads * d).astype(self.dtype or v.dtype)


class MHSA(fnn.Module):
    """Grouped pointwise q/k/v projections + rel-pos attention
    (reference botnet.py:150-194)."""

    heads: int = 4
    pos_h: int = 16
    pos_w: int = 16
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        d = c // self.heads
        init = fnn.initializers.normal(c ** -0.5)

        def proj(name):
            wp = self.param(name, init, (c, self.heads, d), jnp.float32)
            y = jnp.einsum("bhwc,cnp->bnhwp", x.astype(jnp.float32),
                           wp.astype(jnp.float32))
            return y

        q, k, v = proj("q_proj"), proj("k_proj"), proj("v_proj")
        return RelPosSelfAttention(
            heads=self.heads, dim_head=d, h=self.pos_h, w=self.pos_w,
            dtype=self.dtype, name="self_attention")(q, k, v)


class BotBottleneck(fnn.Module):
    """Reference botnet.py:196-301; swish activations throughout."""

    expansion = 4

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "swish"
    attn_layer: Optional[str] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    mhsa_heads: int = 4
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        swish = get_act_fn("swish")
        residual = x
        is_mhsa = self.planes == 512
        stride = self.stride
        downsample = self.downsample
        if is_mhsa and stride == 2:
            # S1: keep resolution, 1x1-projection shortcut (botnet.py:218-226)
            downsample = dict(stride=1, avg=False)
            stride = 1

        y = Conv2d(first_planes, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            y = DropBlock2d(rate, bs, gamma)(y, training=training)
        y = swish(y)

        if is_mhsa:
            y = MHSA(heads=self.mhsa_heads, pos_h=y.shape[1], pos_w=y.shape[2],
                     dtype=self.dtype, name="mhsa")(y)
            y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = swish(y)
        else:
            y = Conv2d(width, 3, stride, fd, fd, groups=self.cardinality,
                       dtype=self.dtype, name="conv2")(y)
            y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = swish(y)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        if not is_mhsa:
            attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                               name="se")
            if attn is not None:
                y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **downsample)(residual, training)
        return swish(y + residual)


def _create_botnet(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


@register_model
def BoTNetS1_59(pretrained=False, **kwargs):
    return _create_botnet("BoTNetS1_59", pretrained, block=BotBottleneck,
                          layers=(3, 4, 6, 6),
                          block_args=dict(attn_layer="se"), **kwargs)


@register_model
def BoTNetS1_128(pretrained=False, **kwargs):
    return _create_botnet("BoTNetS1_128", pretrained, block=BotBottleneck,
                          layers=(3, 4, 23, 12),
                          block_args=dict(attn_layer="se"), **kwargs)
