from cotnet_tpu.nn.activations import get_act_fn, list_act_fns, swish, mish, hard_swish
from cotnet_tpu.nn.attn import (
    CbamModule,
    EcaModule,
    EffectiveSEModule,
    SEModule,
    create_attn,
)
from cotnet_tpu.nn.blur_pool import BlurPool2d
from cotnet_tpu.nn.classifier import ClassifierHead
from cotnet_tpu.nn.conv import Conv2d, ConvBnAct, StdConv2d, get_padding, pad_same, to_2tuple
from cotnet_tpu.nn.drop import DropBlock2d, DropPath, Dropout, drop_block_2d, drop_path
from cotnet_tpu.nn.norm import LayerNorm, SubChannelGroupNorm, batch_norm
from cotnet_tpu.nn.pool import (
    avg_pool2d,
    avg_pool2d_same,
    global_pool2d,
    max_pool2d,
    max_pool2d_same,
    median_pool2d,
)
from cotnet_tpu.nn.extra import (
    CondConv2d,
    EvoNorm2dB0,
    EvoNorm2dS0,
    Kerv2d,
    MixedConv2d,
    SelectiveKernelConv,
    Shiftlution,
    SpaceToDepth,
    SplitBatchNorm,
    TBConv,
    space_to_depth,
    test_time_pool,
)
from cotnet_tpu.nn.split_attn import SplitAttnConv2d, radix_softmax

__all__ = [k for k in dir() if not k.startswith("_")]
