from cotnet_tpu.ops.local_agg import (
    local_aggregate,
    local_aggregate_dilated,
    local_aggregate_mix,
    local_aggregate_mix_merge,
    local_aggregate_wt,
    out_size,
)

__all__ = [
    "local_aggregate",
    "local_aggregate_dilated",
    "local_aggregate_mix",
    "local_aggregate_mix_merge",
    "local_aggregate_wt",
    "out_size",
]
