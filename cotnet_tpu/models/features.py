"""Feature-extraction wrappers (reference models/features.py:20-284).

The reference wraps a torch model in FeatureListNet/FeatureDictNet (module
surgery + forward re-routing) or FeatureHookNet (forward hooks).  In flax the
same capabilities are functional:

- ``features_only=True`` on every chassis returns the per-stage pyramid
  (index 0 = stride-2 stem feature where the chassis emits one, matching
  reference FeatureInfo indexing);
- ``FeatureListNet`` / ``FeatureDictNet`` here are thin delegating wrappers
  that add ``out_indices`` selection and ``feature_info`` metadata
  (reference features.py:153-234);
- ``FeatureHookNet``'s hook mechanism maps onto flax's
  ``capture_intermediates`` — any named module's output can be extracted
  without the model opting in (reference features.py:84-150, :235-284).

Keys in the dict wrapper are stable stage labels (``stage0``..) rather than
torch attribute names — flax modules are functional, so there is no
attribute-path identity to preserve; the converter owns name mapping.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Optional, Sequence, Tuple

__all__ = ["FeatureInfo", "FeatureListNet", "FeatureDictNet",
           "FeatureHookNet", "build_feature_net"]


class FeatureInfo:
    """Indexed feature metadata (reference features.py:20-80)."""

    def __init__(self, info: Sequence[dict],
                 out_indices: Optional[Sequence[int]] = None):
        self.info = list(info)
        self.out_indices = tuple(
            out_indices if out_indices is not None else range(len(info)))
        for i in self.out_indices:
            assert 0 <= i < len(self.info), f"out_index {i} out of range"

    def from_other(self, out_indices: Sequence[int]) -> "FeatureInfo":
        return FeatureInfo(self.info, out_indices)

    def get(self, key: str, idx=None):
        if idx is None:
            return [self.info[i][key] for i in self.out_indices]
        if isinstance(idx, (tuple, list)):
            return [self.info[i][key] for i in idx]
        return self.info[idx][key]

    def channels(self, idx=None):
        return self.get("num_chs", idx)

    def reduction(self, idx=None):
        return self.get("reduction", idx)

    def module_name(self, idx=None):
        return self.get("module", idx)

    def get_dicts(self, keys=None, idx=None):
        idxs = (self.out_indices if idx is None
                else (idx if isinstance(idx, (tuple, list)) else [idx]))
        if keys is None:
            return [self.info[i] for i in idxs]
        return [{k: self.info[i][k] for k in keys} for i in idxs]

    def __len__(self):
        return len(self.out_indices)


def _full_feature_model(model):
    """Clone with features_only=True and the widest out_indices the chassis
    supports, so wrapper indices line up with reference FeatureInfo."""
    fields = getattr(type(model), "__dataclass_fields__", {})
    kw = {"features_only": True}
    if "out_indices" in fields:
        kw["out_indices"] = (0, 1, 2, 3, 4)
    return model.clone(**kw)


def _trace_info(feat_model, input_size: int) -> list:
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r, x: feat_model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(
        lambda v, x: feat_model.apply(v, x, training=False), shapes, x)
    return [{"num_chs": int(o.shape[-1]),
             "reduction": int(round(input_size / o.shape[1])),
             "module": f"stage{i}"}
            for i, o in enumerate(outs)]


class FeatureListNet:
    """features-as-list wrapper (reference FeatureListNet, features.py:218-232):
    delegates init/apply to the wrapped model and selects ``out_indices``."""

    def __init__(self, model, out_indices: Sequence[int] = (0, 1, 2, 3, 4),
                 input_size: int = 224):
        self.model = _full_feature_model(model)
        info = _trace_info(self.model, input_size)
        # clamp to what the chassis actually emits (some families have <5)
        out_indices = tuple(i for i in out_indices if i < len(info))
        self.feature_info = FeatureInfo(info, out_indices)
        self.out_indices = out_indices

    # -- flax-compatible surface ------------------------------------------
    def init(self, rngs, x, **kwargs):
        return self.model.init(rngs, x, **kwargs)

    def apply(self, variables, x, **kwargs):
        feats = self.model.apply(variables, x, **kwargs)
        return self._select(feats)

    def _select(self, feats):
        return [feats[i] for i in self.out_indices]

    def __getattr__(self, name):
        return getattr(self.model, name)


class FeatureDictNet(FeatureListNet):
    """features-as-OrderedDict wrapper (reference FeatureDictNet,
    features.py:153-215); keys are the feature_info module labels."""

    def _select(self, feats):
        names = self.feature_info.module_name()
        return OrderedDict((n, feats[i])
                           for n, i in zip(names, self.out_indices))


class FeatureHookNet:
    """Hook-style extraction (reference FeatureHookNet, features.py:235-284):
    captures the output of ARBITRARY named submodules via flax's
    ``capture_intermediates`` — the functional analogue of forward hooks.

    ``module_paths``: list of '/'-joined flax module paths (e.g.
    ``["layer1_0/conv2", "head"]``).  ``apply`` returns an OrderedDict
    {path: output} (the last call's output for reused modules).
    """

    def __init__(self, model, module_paths: Sequence[str]):
        self.model = model
        self.module_paths = list(module_paths)

    def init(self, rngs, x, **kwargs):
        return self.model.init(rngs, x, **kwargs)

    def apply(self, variables, x, **kwargs):
        want = set(self.module_paths)

        def _filter(mdl, _method):
            return "/".join(mdl.path) in want

        out, inter = self.model.apply(
            variables, x, capture_intermediates=_filter, **kwargs)
        flat = {}

        def walk(tree, prefix):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, prefix + [k] if k != "__call__" else prefix)
            else:  # tuple of call outputs; keep the last
                flat["/".join(prefix)] = tree[-1]

        walk(inter["intermediates"], [])
        return OrderedDict((p, flat[p]) for p in self.module_paths
                           if p in flat), out

    def __getattr__(self, name):
        return getattr(self.model, name)


def build_feature_net(model, feature_cls: str = "list",
                      out_indices: Sequence[int] = (0, 1, 2, 3, 4),
                      input_size: int = 224):
    """feature_cfg dispatch (reference helpers.py:345-355 feature wrap)."""
    cls = {"list": FeatureListNet, "dict": FeatureDictNet}.get(feature_cls)
    if cls is None:
        raise ValueError(f"unknown feature_cls {feature_cls!r}; "
                         "use FeatureHookNet directly for hook extraction")
    return cls(model, out_indices=out_indices, input_size=input_size)
