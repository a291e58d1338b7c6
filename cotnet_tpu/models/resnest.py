"""ResNeSt (reference models/resnest.py): split-attention bottleneck with
radix-2 SplitAttnConv2d and avd average-pool stride handling."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.models.resnet import Downsample, ResNet
from cotnet_tpu.nn import (
    Conv2d,
    DropPath,
    SplitAttnConv2d,
    avg_pool2d,
    batch_norm,
    get_act_fn,
)

default_cfgs = {}  # populated next to the variant table below


class ResNestBottleneck(fnn.Module):
    """Reference resnest.py:20-106."""

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
    radix: int = 2
    avd: bool = True
    avd_first: bool = False
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
        fd = self.first_dilation or self.dilation
        act = get_act_fn(self.act)
        residual = x
        use_avd = self.avd and self.stride > 1
        # avd takes over ALL striding (conv2 runs stride-1 either way)
        stride = 1 if use_avd else self.stride

        y = Conv2d(width // self.reduce_first, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype,
                       axis_name=self.axis_name)
        y = act(y)
        if use_avd and self.avd_first:
            y = avg_pool2d(y, 3, self.stride, padding=1)
        if self.radix >= 1:
            y = SplitAttnConv2d(
                out_channels=width, kernel_size=3, stride=stride, padding=fd,
                dilation=fd, groups=self.cardinality, radix=self.radix,
                act=self.act, dtype=self.dtype, axis_name=self.axis_name,
                name="conv2")(y, training=training)
        else:
            y = Conv2d(width, 3, stride, fd, fd, groups=self.cardinality,
                       dtype=self.dtype, name="conv2")(y)
            y = batch_norm(y, training, name="bn2", dtype=self.dtype,
                           axis_name=self.axis_name)
            y = act(y)
        if use_avd and not self.avd_first:
            y = avg_pool2d(y, 3, self.stride, padding=1)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)


def _create_resnest(model_name, pretrained=False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        **kwargs)


def _nest(layers, stem_width=32, base_width=64, cardinality=1,
          radix=2, avd_first=False):
    return dict(block=ResNestBottleneck, layers=layers, stem_type="deep",
                stem_width=stem_width, avg_down=True, base_width=base_width,
                cardinality=cardinality,
                block_args=dict(radix=radix, avd=True, avd_first=avd_first))


# reference models/resnest.py:148-257
RESNEST_VARIANTS = {
    "resnest14d": _nest((1, 1, 1, 1)),
    "resnest26d": _nest((2, 2, 2, 2)),
    "resnest50d": _nest((3, 4, 6, 3)),
    "resnest101e": _nest((3, 4, 23, 3), stem_width=64),
    "resnest200e": _nest((3, 24, 36, 3), stem_width=64),
    "resnest269e": _nest((3, 30, 48, 8), stem_width=64),
    "resnest50d_4s2x40d": _nest((3, 4, 6, 3), base_width=40, cardinality=2,
                                radix=4, avd_first=True),
    "resnest50d_1s4x24d": _nest((3, 4, 6, 3), base_width=24, cardinality=4,
                                radix=1, avd_first=True),
    # avd_first variants of the paper models (resnest.py:239-257)
    "resnest50": _nest((3, 4, 6, 3), avd_first=True),
    "resnest101": _nest((3, 4, 23, 3), stem_width=64, avd_first=True),
}

_SIZES = {"resnest101e": 256, "resnest101": 256, "resnest200e": 320,
          "resnest269e": 416}
for _name in RESNEST_VARIANTS:
    _s = _SIZES.get(_name, 224)
    default_cfgs[_name] = default_cfg(
        first_conv="conv1.0", input_size=(3, _s, _s),
        pool_size=(_s // 32, _s // 32),
        crop_pct={320: 0.909, 416: 0.928}.get(_s, 0.875))

register_variant_table(__name__, _create_resnest, RESNEST_VARIANTS)
