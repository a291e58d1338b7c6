"""ResNet-RS (reference models/resnet_rs.py): deep stem without a stem pool
(every stage strides 2), SE(reduction=4) bottlenecks."""

from __future__ import annotations

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Bottleneck, ResNet

default_cfgs = {
    "resnet_rs50": default_cfg(first_conv="conv1.0"),
    "resnet_rs101": default_cfg(first_conv="conv1.0"),
    "resnet_rs101L": default_cfg(first_conv="conv1.0"),
    "resnet_rs270": default_cfg(first_conv="conv1.0"),
}


def _rs(model_name, pretrained, layers, stem_width=64, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs[model_name], pretrained=pretrained,
        block=Bottleneck, layers=layers, stem_type="deep",
        stem_width=stem_width, replace_stem_pool=True,
        block_args=dict(attn_layer="se", attn_kwargs=dict(reduction=4)),
        **kwargs)


@register_model
def resnet_rs50(pretrained=False, **kwargs):
    # stem_width 32 for rs50, 64 for the deeper variants
    # (reference resnet_rs.py:303-307 vs :310-328)
    return _rs("resnet_rs50", pretrained, (3, 4, 6, 3), stem_width=32,
               **kwargs)


@register_model
def resnet_rs101(pretrained=False, **kwargs):
    return _rs("resnet_rs101", pretrained, (3, 4, 23, 3), **kwargs)


@register_model
def resnet_rs101L(pretrained=False, **kwargs):
    return _rs("resnet_rs101L", pretrained, (3, 4, 23, 3), **kwargs)


@register_model
def resnet_rs270(pretrained=False, **kwargs):
    return _rs("resnet_rs270", pretrained, (4, 29, 53, 4), **kwargs)
