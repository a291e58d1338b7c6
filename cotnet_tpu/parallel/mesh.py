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

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_log = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init — the analog of the reference's init_process_group
    (train.py:224): one call per host process before any device use.

    With no arguments this is best-effort (auto-detected environments, e.g.
    TPU pods, initialize; plain single-host runs no-op).  When the caller
    passes explicit multi-process arguments, failure is FATAL: silently
    degrading a mis-configured pod to N independent single-host runs would
    train N divergent models — log loudly and re-raise instead.
    """
    explicit = any(a is not None for a in
                   (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (RuntimeError, ValueError) as e:
        if explicit:
            _log.error(
                "jax.distributed.initialize(coordinator=%s, num_processes=%s,"
                " process_id=%s) FAILED: %s — refusing to degrade to"
                " single-host", coordinator_address, num_processes,
                process_id, e)
            raise
        _log.debug("distributed init skipped: %s", e)


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
