"""cotnet_tpu — a TPU-native (JAX/Flax/Pallas) visual-recognition framework.

Re-implements the full capability surface of the CoTNet reference framework
(Contextual Transformer Networks for Visual Recognition, arXiv 2107.12292)
as an idiomatic TPU stack:

- ``cotnet_tpu.ops``      fused local-aggregation (contextual attention) kernels:
                          a pure-XLA formulation plus Pallas TPU kernels with a
                          custom VJP.
- ``cotnet_tpu.nn``       Flax layer zoo (attention modules, drop-path, blur
                          pool, split attention, classifier heads, ...).
- ``cotnet_tpu.models``   model registry/factory and the model zoo (CoTNet,
                          CoTNeXt, SE-CoTNetD, LR-Net, BoTNet, ResNet family).
- ``cotnet_tpu.data``     input pipeline: readers, augmentation (RandAugment,
                          mixup/cutmix, random erasing) with on-device batch ops.
- ``cotnet_tpu.train``    train state, optimizers, LR schedules, losses, EMA and
                          the jitted/sharded train & eval steps.
- ``cotnet_tpu.parallel`` device-mesh construction and sharding helpers.
- ``cotnet_tpu.utils``    checkpointing, metering/logging, PyTorch converter.
- ``cotnet_tpu.config``   YAML experiment configs compatible with the reference
                          recipe format (cot_experiments/*/config.yaml).
"""

__version__ = "0.1.0"
