"""Anti-aliased downsampling (reference models/layers/blur_pool.py and
anti_aliasing.py): reflection-pad then depthwise binomial-filter strided conv.
Used by se_cotnetd_152+ as the aa_layer."""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from jax import lax
from flax import linen as fnn

from cotnet_tpu.nn.conv import get_padding


def _binomial_filter(filt_size: int) -> np.ndarray:
    coeffs = np.poly1d((0.5, 0.5)) ** (filt_size - 1)
    f1 = np.asarray(coeffs.coeffs, dtype=np.float32)
    return f1[:, None] * f1[None, :]


class BlurPool2d(fnn.Module):
    """Blur + subsample; a fixed (non-learned) depthwise conv on NHWC."""

    channels: int = 0  # unused; kept for factory-signature parity
    filt_size: int = 3
    stride: int = 2
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        assert self.filt_size > 1
        c = x.shape[-1]
        pad = get_padding(self.filt_size, self.stride)
        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                     mode="reflect")
        filt = _binomial_filter(self.filt_size)  # [k, k]
        kernel = jnp.asarray(filt, dtype=x.dtype)[:, :, None, None]
        kernel = jnp.tile(kernel, (1, 1, 1, c))  # HWIO depthwise
        return lax.conv_general_dilated(
            xp, kernel,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
