"""Device mesh + sharding helpers — the whole distributed layer.

The reference's distribution stack (torch.distributed NCCL process groups,
DistributedDataParallel, SyncBN conversion, per-epoch BN broadcast/reduce,
OrderedDistributedSampler, scaled_all_reduce — train.py:96-115,222-227,
utils/distributed.py) collapses on TPU into: one Mesh + sharding annotations
under jit.  GSPMD computes batch statistics and gradient means over the
*global* batch and inserts the all-reduces on ICI automatically, so
data-parallel BatchNorm is cross-replica ("SyncBN") by construction and
gradient buckets/overlap are the compiler's job.

Multi-host: call ``initialize_distributed()`` once per host before device
use (jax.distributed.initialize) — the analog of init_process_group
(train.py:224), with env-var rendezvous handled by the TPU runtime.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op on a single host / already-initialized)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host-local batch pytree with batch-dim sharding."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
