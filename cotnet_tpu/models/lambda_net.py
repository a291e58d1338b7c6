"""LambdaNet (reference models/lambdAnet.py): bottleneck with LambdaLayer —
content + position lambdas.  Faithful to the reference's variant (keys
softmax over the k dim, position lambdas via an r x r conv of the values)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import Conv2d, DropPath, avg_pool2d, batch_norm, create_attn, get_act_fn

default_cfgs = {"lambdanet50": default_cfg()}


class LambdaLayer(fnn.Module):
    """Reference lambdAnet.py:33-90."""

    dim: int
    dim_k: int = 16
    r: int = 15
    heads: int = 4
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        n, h, w, _ = x.shape
        dim_v = self.dim // self.heads
        q = Conv2d(self.dim_k * self.heads, 1, dtype=self.dtype,
                   name="to_q")(x)
        q = batch_norm(q, training, name="bn_q", dtype=self.dtype,
                       axis_name=self.axis_name)
        k = Conv2d(self.dim_k, 1, dtype=self.dtype, name="to_k")(x)
        v = Conv2d(dim_v, 1, dtype=self.dtype, name="to_v")(x)
        v = batch_norm(v, training, name="bn_v", dtype=self.dtype,
                       axis_name=self.axis_name)

        emb = self.param("embeddings", fnn.initializers.normal(1.0),
                         (self.dim_k, self.r, self.r), jnp.float32)

        # position lambdas: each (k, v) output = r x r conv of value channel v
        # with embedding k (reference's conv3d, lambdAnet.py:61-66)
        pad = (self.r - 1) // 2
        # depthwise conv with channel multiplier dim_k:
        # kernel [r, r, 1, V*dim_k], output channel v*dim_k + k
        # output channel index = v * dim_k + k needs
        # kernel[..., 0, v*dim_k + k] = emb[k] (group-major layout)
        kern = jnp.broadcast_to(emb.transpose(1, 2, 0)[:, :, None, None, :],
                                (self.r, self.r, 1, dim_v, self.dim_k))
        kern = kern.reshape(self.r, self.r, 1, dim_v * self.dim_k)
        pos = lax.conv_general_dilated(
            v.astype(jnp.float32), kern.astype(jnp.float32), (1, 1),
            ((pad, pad), (pad, pad)), feature_group_count=dim_v,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        pos = pos.reshape(n, h * w, dim_v, self.dim_k)  # [b, m, v, k]

        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)  # over dim_k (ref)
        kf = k.reshape(n, h * w, self.dim_k)
        vf = v.astype(jnp.float32).reshape(n, h * w, dim_v)
        qf = q.astype(jnp.float32).reshape(n, h * w, self.heads, self.dim_k)

        content_lambda = jnp.einsum("bmk,bmv->bkv", kf, vf)
        content_out = jnp.einsum("bnhk,bkv->bnhv", qf, content_lambda)
        position_out = jnp.einsum("bnhk,bnvk->bnhv", qf, pos)
        out = (content_out + position_out).reshape(n, h, w,
                                                   self.heads * dim_v)
        return out.astype(self.dtype or x.dtype)


class LambdaBottleneck(fnn.Module):
    expansion = 4

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "relu"
    attn_layer: Optional[str] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        outplanes = self.planes * self.expansion
        act = get_act_fn(self.act)
        residual = x

        y = Conv2d(width // self.reduce_first, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        # reference lambdAnet.py:159-169: lambda layer runs at FULL
        # resolution, then bn2 + act2, then the stride-2 AvgPool
        y = LambdaLayer(dim=width, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="conv2")(y, training=training)
        y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if self.stride > 1:
            y = avg_pool2d(y, 3, 2, padding=1)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se")
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)


@register_model
def lambdanet50(pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, "lambdanet50", default_cfgs["lambdanet50"],
        pretrained=pretrained, block=LambdaBottleneck, layers=(3, 4, 6, 3),
        **kwargs)
