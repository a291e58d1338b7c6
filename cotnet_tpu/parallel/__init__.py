from cotnet_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [k for k in dir() if not k.startswith("_")]
