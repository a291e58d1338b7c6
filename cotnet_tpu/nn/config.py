"""Layer-config context managers (reference models/layers/config.py:115).

The reference toggles scriptable/exportable/no_jit module variants for
TorchScript/ONNX.  Under JAX every model is traceable/exportable by
construction, so these are no-op context managers kept for API parity —
``create_model(..., scriptable=True)`` works and changes nothing.
"""

from __future__ import annotations

import contextlib

_config = {"scriptable": False, "exportable": False, "no_jit": False}


def is_scriptable() -> bool:
    return _config["scriptable"]


def is_exportable() -> bool:
    return _config["exportable"]


def is_no_jit() -> bool:
    return _config["no_jit"]


@contextlib.contextmanager
def set_layer_config(scriptable=None, exportable=None, no_jit=None):
    prev = dict(_config)
    if scriptable is not None:
        _config["scriptable"] = scriptable
    if exportable is not None:
        _config["exportable"] = exportable
    if no_jit is not None:
        _config["no_jit"] = no_jit
    try:
        yield
    finally:
        _config.update(prev)
