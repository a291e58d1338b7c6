"""DenseNet (reference models/densenet.py, 380 LoC)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import (
    build_model_with_cfg, default_cfg, register_variant_table)
from cotnet_tpu.nn import BlurPool2d, Conv2d, avg_pool2d, batch_norm, get_act_fn, max_pool2d

default_cfgs = {}


class DenseLayer(fnn.Module):
    growth_rate: int
    bn_size: int = 4
    act: str = "relu"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        relu = get_act_fn(self.act)
        y = relu(batch_norm(x, training, name="norm1", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = Conv2d(self.bn_size * self.growth_rate, 1, dtype=self.dtype,
                   name="conv1")(y)
        y = relu(batch_norm(y, training, name="norm2", dtype=self.dtype,
                            axis_name=self.axis_name))
        y = Conv2d(self.growth_rate, 3, 1, 1, dtype=self.dtype,
                   name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(fnn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    stem_width: int = 64
    stem_type: str = ""   # "" | "deep" (reference densenet.py stem variants)
    aa_layer: Optional[str] = None  # "blur" for densenetblur121d
    act: str = "relu"  # "leaky_relu" mirrors inplace-ABN's activation (iabn)
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    dtype: Any = None
    axis_name: Optional[str] = None
    features_only: bool = False

    @fnn.compact
    def __call__(self, x, training: bool = False):
        act = get_act_fn(self.act)
        if self.stem_type == "deep":
            w = self.stem_width // 2
            x = Conv2d(w, 3, 2, 1, dtype=self.dtype, name="conv0")(x)
            x = act(batch_norm(x, training, name="norm0", dtype=self.dtype,
                               axis_name=self.axis_name))
            x = Conv2d(w, 3, 1, 1, dtype=self.dtype, name="conv1")(x)
            x = act(batch_norm(x, training, name="norm1", dtype=self.dtype,
                               axis_name=self.axis_name))
            x = Conv2d(self.stem_width, 3, 1, 1, dtype=self.dtype,
                       name="conv2")(x)
            x = act(batch_norm(x, training, name="norm2", dtype=self.dtype,
                               axis_name=self.axis_name))
        else:
            x = Conv2d(self.stem_width, 7, 2, 3, dtype=self.dtype,
                       name="conv0")(x)
            x = act(batch_norm(x, training, name="norm0", dtype=self.dtype,
                               axis_name=self.axis_name))
        if self.aa_layer is not None:
            x = max_pool2d(x, 3, 1, 1)
            x = BlurPool2d(stride=2, name="stem_aa")(x)
        else:
            x = max_pool2d(x, 3, 2, 1)

        feats = []
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth_rate, act=self.act,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=f"denseblock{bi + 1}_layer{li + 1}")(
                                   x, training)
            feats.append(x)
            if bi != len(self.block_config) - 1:
                x = act(batch_norm(x, training,
                                   name=f"transition{bi + 1}_norm",
                                   dtype=self.dtype,
                                   axis_name=self.axis_name))
                x = Conv2d(x.shape[-1] // 2, 1, dtype=self.dtype,
                           name=f"transition{bi + 1}_conv")(x)
                x = avg_pool2d(x, 2, 2)
        if self.features_only:
            return feats
        x = act(batch_norm(x, training, name="norm5", dtype=self.dtype,
                           axis_name=self.axis_name))
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate and training:
            x = fnn.Dropout(self.drop_rate, deterministic=False)(x)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype,
                          name="classifier")(x)
        return x


def _densenet(model_name, pretrained=False, **kwargs):
    kwargs.pop("in_chans", None)
    return build_model_with_cfg(DenseNet, model_name, default_cfgs[model_name],
                                pretrained=pretrained, **kwargs)


# reference models/densenet.py:288-380; densenet264d_iabn's Inplace-ABN
# collapses to BN + leaky_relu under XLA (no in-place memory distinction)
DENSENET_VARIANTS = {
    "densenet121": dict(growth_rate=32, block_config=(6, 12, 24, 16)),
    "densenetblur121d": dict(growth_rate=32, block_config=(6, 12, 24, 16),
                             stem_type="deep", aa_layer="blur"),
    "densenet121d": dict(growth_rate=32, block_config=(6, 12, 24, 16),
                         stem_type="deep"),
    "densenet169": dict(growth_rate=32, block_config=(6, 12, 32, 32)),
    "densenet201": dict(growth_rate=32, block_config=(6, 12, 48, 32)),
    "densenet161": dict(growth_rate=48, block_config=(6, 12, 36, 24),
                        stem_width=96),
    "densenet264": dict(growth_rate=48, block_config=(6, 12, 64, 48),
                        stem_width=96),
    "densenet264d_iabn": dict(growth_rate=48, block_config=(6, 12, 64, 48),
                              stem_width=96, stem_type="deep",
                              act="leaky_relu"),
    "tv_densenet121": dict(growth_rate=32, block_config=(6, 12, 24, 16)),
}

default_cfgs = {
    name: default_cfg(
        interpolation="bicubic",
        first_conv="features.conv0", classifier="classifier")
    for name in DENSENET_VARIANTS}

register_variant_table(__name__, _densenet, DENSENET_VARIANTS)
