"""Train state: params, BN stats, optimizer state, EMA, step counter.

Replaces the reference's mutable module + ModelEmaV2 deepcopy
(utils/model_ema.py:12-56) with a pure pytree: EMA is a lerp inside the
jitted step (the reference's ordered state_dict zip :45-53 collapses to a
tree_map), covering params AND batch_stats exactly like the reference's full
state_dict sweep.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None
    # host-controlled LR multiplier (plateau schedule; 1.0 otherwise)
    lr_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones((), jnp.float32))

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation,
               ema: bool = False):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if ema else None,
        )


def ema_update(ema_tree, new_tree, decay: float):
    """v_ema = decay * v_ema + (1-decay) * v (model_ema.py:45-53)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_tree, new_tree)
