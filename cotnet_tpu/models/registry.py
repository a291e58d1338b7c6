"""Model registry: @register_model / list_models / create-by-name.

Same public surface and registry keys as the reference
(models/registry.py:20-87) so users can switch frameworks without renaming
models: register_model, list_models (fnmatch filtering + exclude filters +
pretrained-only), is_model, model_entrypoint, list_modules,
is_model_in_modules.
"""

from __future__ import annotations

import fnmatch
import re
import sys
from collections import defaultdict
from typing import Callable, Dict, List, Set

_module_to_models: Dict[str, Set[str]] = defaultdict(set)
_model_to_module: Dict[str, str] = {}
_model_entrypoints: Dict[str, Callable] = {}
_model_has_pretrained: Set[str] = set()
_model_default_cfgs: Dict[str, dict] = {}


def register_model(fn: Callable) -> Callable:
    mod = sys.modules[fn.__module__]
    module_name = fn.__module__.split(".")[-1]
    model_name = fn.__name__

    if hasattr(mod, "__all__"):
        if model_name not in mod.__all__:
            mod.__all__.append(model_name)
    else:
        mod.__all__ = [model_name]

    _model_entrypoints[model_name] = fn
    _model_to_module[model_name] = module_name
    _module_to_models[module_name].add(model_name)

    cfgs = getattr(mod, "default_cfgs", None)
    if cfgs and model_name in cfgs:
        _model_default_cfgs[model_name] = cfgs[model_name]
        if "http" in cfgs[model_name].get("url", ""):
            _model_has_pretrained.add(model_name)
    return fn


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def list_models(filter: str = "", module: str = "", pretrained: bool = False,
                exclude_filters="") -> List[str]:
    models = (set(_module_to_models[module]) if module
              else set(_model_entrypoints))
    if filter:
        models = set(fnmatch.filter(models, filter))
    if exclude_filters:
        if not isinstance(exclude_filters, (list, tuple)):
            exclude_filters = [exclude_filters]
        for xf in exclude_filters:
            models -= set(fnmatch.filter(models, xf))
    if pretrained:
        models &= _model_has_pretrained
    return sorted(models, key=_natural_key)


def is_model(model_name: str) -> bool:
    return model_name in _model_entrypoints


def model_entrypoint(model_name: str) -> Callable:
    return _model_entrypoints[model_name]


def list_modules() -> List[str]:
    return sorted(_module_to_models)


def is_model_in_modules(model_name: str, module_names) -> bool:
    assert isinstance(module_names, (tuple, list, set))
    return any(model_name in _module_to_models[m] for m in module_names)
