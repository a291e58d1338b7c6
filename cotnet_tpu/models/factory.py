"""create_model — string name -> flax Module (reference models/factory.py:6-64).

Keeps the reference's kwarg-hygiene behaviors: family-gated batchnorm
kwargs, drop_connect->drop_path compat shim, and None-valued kwarg pruning so
CLI/config sentinels don't override model defaults.
"""

from __future__ import annotations

import warnings

from cotnet_tpu.models.registry import is_model, is_model_in_modules, model_entrypoint


def create_model(
    model_name: str,
    pretrained: bool = False,
    num_classes: int = 1000,
    in_chans: int = 3,
    checkpoint_path: str = "",
    scriptable=None,
    exportable=None,
    no_jit=None,
    **kwargs,
):
    """Create a model Module by registry name.

    Extra kwargs are passed to the entrypoint; None values are pruned
    (factory.py:50-55).  Returns the (unbound) flax Module; use
    ``model.init`` / utils.checkpoint to obtain parameters, and pass
    ``checkpoint_path`` through the train/eval CLIs to restore weights.
    """
    model_args = dict(pretrained=pretrained, num_classes=num_classes,
                      in_chans=in_chans)

    is_efficientnet = is_model_in_modules(model_name, ["efficientnet", "mobilenetv3"])
    if not is_efficientnet:
        kwargs.pop("bn_tf", None)
        kwargs.pop("bn_momentum", None)
        kwargs.pop("bn_eps", None)

    drop_connect_rate = kwargs.pop("drop_connect_rate", None)
    if drop_connect_rate is not None and kwargs.get("drop_path_rate") is None:
        warnings.warn("'drop_connect' is deprecated; use 'drop_path'")
        kwargs["drop_path_rate"] = drop_connect_rate

    kwargs = {k: v for k, v in kwargs.items() if v is not None}

    if not is_model(model_name):
        raise RuntimeError(f"Unknown model ({model_name})")
    from cotnet_tpu.nn.config import set_layer_config
    with set_layer_config(scriptable=scriptable, exportable=exportable,
                          no_jit=no_jit):
        model = model_entrypoint(model_name)(**model_args, **kwargs)

    if checkpoint_path:
        raise ValueError(
            "checkpoint_path is handled by cotnet_tpu.utils.checkpoint: "
            "load params explicitly (params are not stored on the Module in JAX)")
    return model
