from cotnet_tpu.utils.checkpoint import CheckpointSaver, load_weights, save_weights
from cotnet_tpu.utils.convert import (
    convert_torch_checkpoint,
    convert_torch_state_dict,
    load_torch_checkpoint,
)
from cotnet_tpu.utils.logger import is_master_process, logger_info, setup_default_logging
from cotnet_tpu.utils.meters import (
    AverageMeter,
    ScalarMeter,
    TestMeter,
    TrainMeter,
    accuracy_counts,
)

__all__ = [k for k in dir() if not k.startswith("_")]
