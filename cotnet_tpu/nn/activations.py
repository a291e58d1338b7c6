"""Activation registry (reference: models/layers/activations.py,
create_act.py).

On TPU there is no need for the reference's three parallel implementations
(plain / jit-scripted / memory-efficient autograd): XLA fuses elementwise ops
into surrounding kernels and rematerialization is handled by jax.checkpoint.
One jnp function per activation suffices.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def swish(x):
    """x * sigmoid(x) (a.k.a. SiLU) — the CoT block's post-BN activation."""
    return jax.nn.silu(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def hard_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def hard_mish(x):
    return 0.5 * x * jnp.clip(x + 2.0, 0.0, 2.0)


_ACT_FNS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    # exact erf form: torch nn.GELU default (jax.nn.gelu defaults to the
    # tanh approximation, which diverges from the reference by ~3e-4/act)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "swish": swish,
    "silu": swish,
    "mish": mish,
    "hard_swish": hard_swish,
    "hard_sigmoid": hard_sigmoid,
    "hard_mish": hard_mish,
    "identity": lambda x: x,
}


def get_act_fn(name: Optional[str]) -> Callable:
    """String -> activation function (reference get_act_fn/get_act_layer)."""
    if name is None or name == "":
        return lambda x: x
    if callable(name):
        return name
    try:
        return _ACT_FNS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; have {sorted(_ACT_FNS)}")


def list_act_fns():
    return sorted(_ACT_FNS)
