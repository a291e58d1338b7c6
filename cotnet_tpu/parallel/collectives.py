"""Collective helpers (reference utils/distributed.py:19-67).

Under GSPMD jit these are rarely needed — gradient means and BN stats are
global by construction — but the reference exposes explicit helpers and they
remain useful inside shard_map/pmap code, so the same surface is provided as
thin lax wrappers.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def scaled_all_reduce(tensors: Sequence[jax.Array], axis_name: str = "data"):
    """Sum-all-reduce then scale by 1/world (reference :19-42); call inside a
    shard_map/pmap with ``axis_name`` bound."""
    return [lax.pmean(t, axis_name) for t in tensors]


def sum_tensor(t: jax.Array, axis_name: str = "data"):
    """Sum across replicas (reference sum_tensor :44-49)."""
    return lax.psum(t, axis_name)


def reduce_tensor(t: jax.Array, axis_name: str = "data"):
    """Mean across replicas (reference reduce_tensor :51-55)."""
    return lax.pmean(t, axis_name)


def sync_batch_stats(batch_stats, axis_name: str = "data"):
    """Cross-replica average of BN running stats — the analog of the
    per-epoch ``distribute_bn(..., 'reduce')`` (reference :58-67,
    train.py:346-348).  Under GSPMD training the stats are already identical
    on every replica, so this is only needed for pmap-style loops."""
    return jax.tree.map(lambda x: lax.pmean(x, axis_name), batch_stats)


def barrier():
    """Host-level sync (reference evaler.py:55's dist.barrier analog)."""
    jax.block_until_ready(
        jax.device_put(jnp.zeros(()), jax.devices()[0]) + 0)
