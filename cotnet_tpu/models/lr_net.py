"""LR-Net: local-relation self-attention blocks (reference models/lr_net.py).

SelfAttLayer (:39-100): q from a 1x1 embed, k from a 1x1 or 3x3 embed; the
K x K attention logits are the per-position dot products q . (unfold(k)+pos)
per head (head dim = dim/8), softmaxed over the window and consumed by the
same local-aggregation kernel as CoT (weight channels = heads, broadcast over
channel groups mod Cw — identical semantics in both frameworks).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import Conv2d, DropBlock2d, DropPath, avg_pool2d, batch_norm, create_attn, get_act_fn
from cotnet_tpu.ops import local_aggregate
from cotnet_tpu.ops.local_agg import extract_patches

default_cfgs = {
    "lrnet50": default_cfg(),
    "lrnet50_ks3": default_cfg(),
}


class SelfAttLayer(fnn.Module):
    """Reference lr_net.py:39-100."""

    dim: int
    kernel_size: int = 3
    key_ks: int = 1
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        dim, ks = self.dim, self.kernel_size
        rel = dim  # rel_factor = 1
        head_num = dim // 8
        k2 = ks * ks
        relu = get_act_fn("relu")

        def bn(y, name):
            return batch_norm(y, training, name=name, dtype=self.dtype,
                              axis_name=self.axis_name)

        q = relu(bn(Conv2d(rel, 1, dtype=self.dtype, name="conv_q")(x), "bn_q"))
        k = relu(bn(Conv2d(rel, self.key_ks, 1, self.key_ks // 2,
                           dtype=self.dtype, name="conv_k")(x), "bn_k"))
        v = bn(Conv2d(dim, 1, dtype=self.dtype, name="conv_v")(x), "bn_v")

        # torch-shaped relative position params (converter copies verbatim)
        pos_h = self.param("pos_h", fnn.initializers.normal(1.0),
                           (rel, ks, 1), jnp.float32)
        pos_w = self.param("pos_w", fnn.initializers.normal(1.0),
                           (rel, 1, ks), jnp.float32)

        pos = (pos_h + pos_w).reshape(rel, k2)  # [rel, K^2]
        patches = extract_patches(k, ks)  # [N, H, W, K^2, rel]
        kp = patches + pos.T.astype(patches.dtype)

        n, h, wd, _ = x.shape
        qh = q.reshape(n, h, wd, 1, head_num, rel // head_num)
        kph = kp.reshape(n, h, wd, k2, head_num, rel // head_num)
        attn = jnp.sum(qh.astype(jnp.float32) * kph.astype(jnp.float32),
                       axis=-1)  # [N, H, W, K^2, head_num]
        attn = jax.nn.softmax(attn, axis=3)

        w = attn[:, :, :, None, :, :].astype(v.dtype)  # [N,H,W,1,K^2,hn]
        y = local_aggregate(v, w, kernel_size=ks, padding=(ks - 1) // 2,
                            impl=self.impl)
        return relu(bn(y, "bn"))


class LrBottleneck(fnn.Module):
    """Reference lr_net.py:103-189 — avd pool AFTER the attention layer."""

    expansion = 4

    planes: int
    key_ks: int = 1
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
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * self.expansion
        act = get_act_fn(self.act)
        residual = x

        y = Conv2d(first_planes, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            y = DropBlock2d(rate, bs, gamma)(y, training=training)
        y = act(y)

        y = SelfAttLayer(dim=width, kernel_size=3, key_ks=self.key_ks,
                         impl=self.impl, dtype=self.dtype,
                         axis_name=self.axis_name,
                         name="conv2")(y, training=training)
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


def _create_lrnet(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs.get(model_name, default_cfg()),
        pretrained=pretrained, **kwargs)


@register_model
def lrnet50(pretrained=False, **kwargs):
    return _create_lrnet("lrnet50", pretrained, block=LrBottleneck,
                         layers=(3, 4, 6, 3), **kwargs)


@register_model
def lrnet50_ks3(pretrained=False, **kwargs):
    return _create_lrnet("lrnet50_ks3", pretrained, block=LrBottleneck,
                         layers=(3, 4, 6, 3),
                         block_args=dict(key_ks=3), **kwargs)
