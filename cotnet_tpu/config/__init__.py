from cotnet_tpu.config.config import (
    Config,
    default_config,
    load_config,
    load_experiment,
)
from cotnet_tpu.models.helpers import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    resolve_data_config,
)

__all__ = [k for k in dir() if not k.startswith("_")]
