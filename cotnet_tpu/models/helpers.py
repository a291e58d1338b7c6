"""Model-builder helpers (reference models/helpers.py:311-357 and the
default_cfg machinery).

In JAX, model *architecture* (a flax Module) and *weights* (a params pytree)
are separate values, so `build_model_with_cfg` returns the Module and records
its data config (input size, crop pct, interpolation, mean/std, classifier
names) in a registry keyed by model name; weight loading lives in
``cotnet_tpu.utils.checkpoint`` / ``cotnet_tpu.utils.convert``.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)

_default_cfg_by_model: Dict[str, dict] = {}


def default_cfg(url: str = "", **kwargs) -> dict:
    """Data-config template shared by all model families
    (reference models/cotnet.py:21-29)."""
    cfg = {
        "url": url,
        "num_classes": 1000,
        "input_size": (3, 224, 224),
        "pool_size": (7, 7),
        "crop_pct": 0.875,
        "interpolation": "bicubic",
        "mean": IMAGENET_DEFAULT_MEAN,
        "std": IMAGENET_DEFAULT_STD,
        "first_conv": "conv1",
        "classifier": "fc",
    }
    cfg.update(kwargs)
    return cfg


def get_model_default_cfg(model_name: str) -> dict:
    if model_name in _default_cfg_by_model:
        return copy.deepcopy(_default_cfg_by_model[model_name])
    from cotnet_tpu.models.registry import _model_default_cfgs
    return copy.deepcopy(_model_default_cfgs.get(model_name, default_cfg()))


def build_model_with_cfg(
    model_cls: Callable,
    model_name: str,
    default_cfg: dict,
    pretrained: bool = False,
    **kwargs,
):
    """Construct a flax model Module and record its data config.

    Unlike the reference (helpers.py:311-357) this does not download weights:
    ``pretrained=True`` is honored by the training/eval CLIs, which load a
    converted checkpoint via utils.convert / utils.checkpoint.
    """
    _default_cfg_by_model[model_name] = copy.deepcopy(default_cfg)
    kwargs.pop("pretrained", None)
    model = model_cls(**kwargs)
    return model


def register_variant_table(module_name: str, builder: Callable,
                           table: Dict[str, dict]) -> None:
    """Register many config-row entrypoints from a table.

    The reference declares hundreds of near-identical per-variant ``def``
    blocks (e.g. resnet.py:614+, efficientnet.py:880+); each is one
    architecture-kwargs row on a shared chassis.  ``builder(name,
    pretrained=..., **kwargs)`` constructs the model; each generated
    entrypoint merges its table row under any caller kwargs (caller wins).
    """
    import sys

    from cotnet_tpu.models.registry import register_model

    mod = sys.modules[module_name]
    for name, row in table.items():
        def fn(pretrained=False, *, _name=name, _row=row, **kwargs):
            merged = dict(_row)
            merged.update(kwargs)
            return builder(_name, pretrained=pretrained, **merged)
        fn.__name__ = name
        fn.__qualname__ = name
        fn.__module__ = module_name
        fn.__doc__ = f"{name} (table-generated variant entrypoint)"
        setattr(mod, name, fn)
        register_model(fn)


def get_feature_info(model, input_size: int = 224):
    """Per-stage feature metadata (reference models/features.py FeatureInfo):
    [{'num_chs', 'reduction'}] derived from a shape-only trace of the model's
    ``features_only`` outputs."""
    import jax
    import jax.numpy as jnp

    feat_model = model.clone(features_only=True)
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r, x: feat_model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(
        lambda v, x: feat_model.apply(v, x, training=False), shapes, x)
    return [{"num_chs": int(o.shape[-1]),
             "reduction": int(round(input_size / o.shape[1]))}
            for o in outs]


def resolve_data_config(args: Optional[dict] = None, model_name: Optional[str] = None,
                        default_cfg_override: Optional[dict] = None,
                        use_test_size: bool = False) -> dict:
    """Merge a model's default_cfg with user overrides
    (reference config/config.py:152-206 / datasets/config.py)."""
    args = dict(args or {})
    cfg = default_cfg_override or (
        get_model_default_cfg(model_name) if model_name else default_cfg())

    data = {}
    in_chans = args.get("chans") or args.get("in_chans") or cfg["input_size"][0]
    if args.get("input_size"):
        data["input_size"] = tuple(args["input_size"])
    elif args.get("img_size"):
        data["input_size"] = (in_chans, args["img_size"], args["img_size"])
    else:
        data["input_size"] = tuple(cfg["input_size"])
    data["interpolation"] = args.get("interpolation") or cfg["interpolation"]
    data["mean"] = tuple(args.get("mean") or cfg["mean"])
    data["std"] = tuple(args.get("std") or cfg["std"])
    data["crop_pct"] = args.get("crop_pct") or cfg["crop_pct"]
    data["num_classes"] = args.get("num_classes") or cfg["num_classes"]
    return data
