from cotnet_tpu.models.factory import create_model
from cotnet_tpu.models.helpers import (
    build_model_with_cfg,
    get_feature_info,
    get_model_default_cfg,
    resolve_data_config,
)
from cotnet_tpu.models.registry import (
    is_model,
    is_model_in_modules,
    list_models,
    list_modules,
    model_entrypoint,
    register_model,
)

# importing the model modules populates the registry
from cotnet_tpu.models import botnet  # noqa: F401
from cotnet_tpu.models import cait  # noqa: F401
from cotnet_tpu.models import coat  # noqa: F401
from cotnet_tpu.models import convit  # noqa: F401
from cotnet_tpu.models import cotnet  # noqa: F401
from cotnet_tpu.models import efficientnet  # noqa: F401
from cotnet_tpu.models import pit  # noqa: F401
from cotnet_tpu.models import cotnet_hybrid  # noqa: F401
from cotnet_tpu.models import densenet  # noqa: F401
from cotnet_tpu.models import lambda_net  # noqa: F401
from cotnet_tpu.models import levit  # noqa: F401
from cotnet_tpu.models import lr_net  # noqa: F401
from cotnet_tpu.models import regnet  # noqa: F401
from cotnet_tpu.models import psresnet  # noqa: F401
from cotnet_tpu.models import resnet_dw  # noqa: F401
from cotnet_tpu.models import resnet_rs  # noqa: F401
from cotnet_tpu.models import resnetv2  # noqa: F401
from cotnet_tpu.models import res2net  # noqa: F401
from cotnet_tpu.models import resnest  # noqa: F401
from cotnet_tpu.models import rexnet  # noqa: F401
from cotnet_tpu.models import xception  # noqa: F401
from cotnet_tpu.models import resnet  # noqa: F401
from cotnet_tpu.models import san  # noqa: F401
from cotnet_tpu.models import sknet  # noqa: F401
from cotnet_tpu.models import swin_transformer  # noqa: F401
from cotnet_tpu.models import tnt  # noqa: F401
from cotnet_tpu.models import twins  # noqa: F401
from cotnet_tpu.models import visformer  # noqa: F401
from cotnet_tpu.models import vision_transformer  # noqa: F401
from cotnet_tpu.models import vision_transformer_hybrid  # noqa: F401
from cotnet_tpu.models import xcit  # noqa: F401

from cotnet_tpu.models.cotnet import CotBottleneck, CotLayer, CoXtLayer
from cotnet_tpu.models.cotnet_hybrid import CotHybridBottleneck
from cotnet_tpu.models.resnet import BasicBlock, Bottleneck, ResNet

__all__ = [k for k in dir() if not k.startswith("_")]
