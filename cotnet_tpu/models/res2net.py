"""Res2Net (reference models/res2net.py): hierarchical multi-scale 3x3
convs inside the bottleneck (Bottle2neck)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    Conv2d,
    DropPath,
    avg_pool2d,
    batch_norm,
    create_attn,
    get_act_fn,
)

default_cfgs = {}


class Bottle2neck(fnn.Module):
    """Reference res2net.py:24-107."""

    expansion = 4

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 26
    scale: int = 4
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
        assert self.reduce_first == 1
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        outplanes = self.planes * self.expansion
        fd = self.first_dilation or self.dilation
        act = get_act_fn(self.act)
        is_first = self.stride > 1 or self.downsample is not None
        num_scales = max(1, self.scale - 1)
        residual = x

        y = Conv2d(width * self.scale, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)

        spx = jnp.split(y, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(num_scales):
            sp = spx[i] if (i == 0 or is_first) else sp + spx[i]
            sp = Conv2d(width, 3, self.stride, fd, fd,
                        groups=self.cardinality, dtype=self.dtype,
                        name=f"convs_{i}")(sp)
            sp = batch_norm(sp, training, name=f"bns_{i}", dtype=self.dtype,
                            axis_name=self.axis_name)
            sp = act(sp)
            outs.append(sp)
        if self.scale > 1:
            if is_first:  # reference pools the last split when downsampling
                outs.append(avg_pool2d(spx[-1], 3, self.stride, padding=1)
                            if self.stride > 1 else spx[-1])
            else:
                outs.append(spx[-1])
        y = jnp.concatenate(outs, axis=-1)

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


def _create_res2net(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


# reference models/res2net.py:142-216
RES2NET_VARIANTS = {
    "res2net50_26w_4s": dict(block=Bottle2neck, layers=(3, 4, 6, 3),
                             base_width=26, block_args=dict(scale=4)),
    "res2net101_26w_4s": dict(block=Bottle2neck, layers=(3, 4, 23, 3),
                              base_width=26, block_args=dict(scale=4)),
    "res2net50_26w_6s": dict(block=Bottle2neck, layers=(3, 4, 6, 3),
                             base_width=26, block_args=dict(scale=6)),
    "res2net50_26w_8s": dict(block=Bottle2neck, layers=(3, 4, 6, 3),
                             base_width=26, block_args=dict(scale=8)),
    "res2net50_48w_2s": dict(block=Bottle2neck, layers=(3, 4, 6, 3),
                             base_width=48, block_args=dict(scale=2)),
    "res2net50_14w_8s": dict(block=Bottle2neck, layers=(3, 4, 6, 3),
                             base_width=14, block_args=dict(scale=8)),
    "res2next50": dict(block=Bottle2neck, layers=(3, 4, 6, 3), base_width=4,
                       cardinality=8, block_args=dict(scale=4)),
}

default_cfgs = {name: default_cfg(interpolation="bilinear")
                for name in RES2NET_VARIANTS}

register_variant_table(__name__, _create_res2net, RES2NET_VARIANTS)
