"""Classifier head (reference models/layers/classifier.py:10-26)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.drop import Dropout
from cotnet_tpu.nn.pool import global_pool2d


class ClassifierHead(fnn.Module):
    """Global pool + dropout + linear; num_classes<=0 -> features only."""

    num_classes: int = 1000
    pool_type: str = "avg"
    drop_rate: float = 0.0
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        x = global_pool2d(x, self.pool_type)
        if self.drop_rate:
            x = Dropout(self.drop_rate)(x, training=training)
        if self.num_classes > 0:
            x = fnn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x
