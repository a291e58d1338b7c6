from cotnet_tpu.data.mixup import Mixup, one_hot_smooth

__all__ = [k for k in dir() if not k.startswith("_")]
