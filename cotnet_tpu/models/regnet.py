"""RegNet X/Y (reference models/regnet.py, 460 LoC).

Stage widths/depths/groups are derived from the published design-space
parameters (w0, wa, wm, depth, group_w) with the same quantize-and-adjust
procedure as the reference (regnet.py:86-110: generate_regnet +
adjust_widths_groups_comp with bottle_ratio=1), so per-variant architectures
and parameter counts match without hand-maintained tables.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import Conv2d, SEModule, batch_norm, get_act_fn

# design-space parameters (reference regnet.py:17-43); se_ratio=0.25 for Y
_PARAMS = {
    "regnetx_002": (24, 36.44, 2.49, 8, 13, 0.0),
    "regnetx_004": (24, 24.48, 2.54, 16, 22, 0.0),
    "regnetx_006": (48, 36.97, 2.24, 24, 16, 0.0),
    "regnetx_008": (56, 35.73, 2.28, 16, 16, 0.0),
    "regnetx_016": (80, 34.01, 2.25, 24, 18, 0.0),
    "regnetx_032": (88, 26.31, 2.25, 48, 25, 0.0),
    "regnetx_040": (96, 38.65, 2.43, 40, 23, 0.0),
    "regnetx_064": (184, 60.83, 2.07, 56, 17, 0.0),
    "regnetx_080": (80, 49.56, 2.88, 120, 23, 0.0),
    "regnetx_120": (168, 73.36, 2.37, 112, 19, 0.0),
    "regnetx_160": (216, 55.59, 2.1, 128, 22, 0.0),
    "regnetx_320": (320, 69.86, 2.0, 168, 23, 0.0),
    "regnety_002": (24, 36.44, 2.49, 8, 13, 0.25),
    "regnety_004": (48, 27.89, 2.09, 8, 16, 0.25),
    "regnety_006": (48, 32.54, 2.32, 16, 15, 0.25),
    "regnety_008": (56, 38.84, 2.4, 16, 14, 0.25),
    "regnety_016": (48, 20.71, 2.65, 24, 27, 0.25),
    "regnety_032": (80, 42.63, 2.66, 24, 21, 0.25),
    "regnety_040": (96, 31.41, 2.24, 64, 22, 0.25),
    "regnety_064": (112, 33.22, 2.27, 72, 25, 0.25),
    "regnety_080": (192, 76.82, 2.19, 56, 17, 0.25),
    "regnety_120": (168, 73.36, 2.37, 112, 19, 0.25),
    "regnety_160": (200, 106.23, 2.48, 112, 18, 0.25),
    "regnety_320": (232, 115.89, 2.53, 232, 20, 0.25),
}

default_cfgs = {
    name: default_cfg(first_conv="stem.conv", classifier="head.fc")
    for name in _PARAMS
}


def _stage_cfg(w0: int, wa: float, wm: float, group_w: int, depth: int):
    """Per-block widths -> (stage widths, depths, per-stage groups)
    (reference generate_regnet regnet.py:100-110 +
    adjust_widths_groups_comp :90-96, bottle_ratio=1, q=8)."""
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = (np.round(w0 * np.power(wm, width_exps) / 8) * 8).astype(int)
    sw, sd = [], []
    for w in widths.tolist():
        if sw and sw[-1] == w:
            sd[-1] += 1
        else:
            sw.append(w)
            sd.append(1)
    groups = [min(group_w, w) for w in sw]
    sw = [int(round(w / g) * g) for w, g in zip(sw, groups)]
    return tuple(sw), tuple(sd), tuple(groups)


class RegBottleneck(fnn.Module):
    """SE sits after conv2 and is sized by the block *input* channels
    (reference regnet.py:112-152)."""

    width: int
    stride: int = 1
    group_width: int = 24
    se_ratio: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        in_ch = x.shape[-1]
        groups = self.width // self.group_width
        y = Conv2d(self.width, 1, dtype=self.dtype, name="conv1")(x)
        y = relu(batch_norm(y, training, name="bn1", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = Conv2d(self.width, 3, self.stride, 1, groups=groups,
                   dtype=self.dtype, name="conv2")(y)
        y = relu(batch_norm(y, training, name="bn2", dtype=self.dtype,
                            axis_name=self.axis_name))
        if self.se_ratio:
            y = SEModule(self.width,
                         reduction_channels=int(round(in_ch * self.se_ratio)),
                         dtype=self.dtype, name="se")(y, training=training)
        y = Conv2d(self.width, 1, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name)
        if self.stride != 1 or in_ch != self.width:
            sc = Conv2d(self.width, 1, self.stride, 0, dtype=self.dtype,
                        name="downsample_conv")(x)
            sc = batch_norm(sc, training, name="downsample_bn",
                            dtype=self.dtype, axis_name=self.axis_name)
        else:
            sc = x
        return relu(y + sc)


class RegNet(fnn.Module):
    widths: Sequence[int] = (72, 168, 408, 912)
    depths: Sequence[int] = (2, 4, 10, 2)
    group_widths: Sequence[int] = (24, 24, 24, 24)
    se_ratio: float = 0.0
    stem_width: int = 32
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn("relu")
        x = Conv2d(self.stem_width, 3, 2, 1, dtype=self.dtype,
                   name="stem_conv")(x)
        x = relu(batch_norm(x, training, name="stem_bn", dtype=self.dtype,
                            axis_name=self.axis_name))
        feats = []
        for si, (w, d, g) in enumerate(
                zip(self.widths, self.depths, self.group_widths)):
            for bi in range(d):
                x = RegBottleneck(w, stride=2 if bi == 0 else 1,
                                  group_width=g, se_ratio=self.se_ratio,
                                  dtype=self.dtype, axis_name=self.axis_name,
                                  name=f"s{si + 1}_b{bi + 1}")(x, training)
            feats.append(x)
        if self.features_only:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def _regnet(model_name, pretrained=False, **kwargs):
    w0, wa, wm, group_w, depth, se_ratio = _PARAMS[model_name]
    widths, depths, groups = _stage_cfg(w0, wa, wm, group_w, depth)
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(
        RegNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        widths=widths, depths=depths, group_widths=groups, se_ratio=se_ratio,
        **kwargs)


register_variant_table(__name__, _regnet, {name: {} for name in _PARAMS})
