"""Channel/spatial attention modules + string factory.

Reference: models/layers/{se.py, eca.py, cbam.py, create_attn.py:11-37}.
NHWC throughout; the squeeze path is a [N, C] vector (no fake 1x1 spatial
dims needed on TPU — these are pure matmuls on the MXU).
"""

from __future__ import annotations

from math import log
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.activations import get_act_fn


class SEModule(fnn.Module):
    """Squeeze-and-excitation (reference se.py:5-22)."""

    channels: int
    reduction: int = 16
    min_channels: int = 8
    reduction_channels: Optional[int] = None
    act: str = "relu"
    gate: str = "sigmoid"
    norm: bool = False   # SEWithNorm (reference rexnet.py): BN after fc1
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        rc = self.reduction_channels or max(self.channels // self.reduction,
                                            self.min_channels)
        s = jnp.mean(x, axis=(1, 2))
        s = fnn.Dense(rc, dtype=self.dtype, name="fc1")(s)
        if self.norm:
            s = fnn.BatchNorm(use_running_average=not training, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype, name="bn")(s)
        s = get_act_fn(self.act)(s)
        s = fnn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        s = get_act_fn(self.gate)(s)
        return x * s[:, None, None, :]


class EffectiveSEModule(fnn.Module):
    """eSE from CenterMask (reference se.py:25-37)."""

    channels: int
    gate: str = "hard_sigmoid"
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        s = jnp.mean(x, axis=(1, 2))
        s = fnn.Dense(self.channels, dtype=self.dtype, name="fc")(s)
        s = get_act_fn(self.gate)(s)
        return x * s[:, None, None, :]


def _eca_kernel_size(channels, kernel_size, gamma, beta):
    if channels is not None:
        t = int(abs(log(channels, 2) + beta) / gamma)
        kernel_size = max(t if t % 2 else t + 1, 3)
    return kernel_size


class EcaModule(fnn.Module):
    """Efficient channel attention: 1-D conv over the pooled channel vector
    (reference eca.py:41-65)."""

    channels: Optional[int] = None
    kernel_size: int = 3
    gamma: float = 2
    beta: float = 1
    circular: bool = False  # CecaModule variant (eca.py:68-108)
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        k = _eca_kernel_size(self.channels, self.kernel_size, self.gamma,
                             self.beta)
        s = jnp.mean(x, axis=(1, 2))[:, :, None]  # [N, C, 1]
        pad = (k - 1) // 2
        if self.circular:
            s = jnp.concatenate([s[:, -pad:], s, s[:, :pad]], axis=1)
            padding = "VALID"
        else:
            padding = [(pad, pad)]
        s = fnn.Conv(1, kernel_size=(k,), padding=padding, use_bias=False,
                     dtype=self.dtype, name="conv")(s)
        s = jax.nn.sigmoid(s[..., 0])
        return x * s[:, None, None, :]


class CbamModule(fnn.Module):
    """CBAM: channel (avg+max shared MLP) then spatial attention
    (reference cbam.py:19-99)."""

    channels: int
    reduction: int = 16
    spatial_kernel: int = 7
    light: bool = False
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        rc = self.channels // self.reduction
        fc1 = fnn.Dense(rc, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = fnn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                        name="fc2")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        if self.light:
            attn = fc2(jax.nn.relu(fc1(0.5 * avg + 0.5 * mx)))
        else:
            attn = fc2(jax.nn.relu(fc1(avg))) + fc2(jax.nn.relu(fc1(mx)))
        x = x * jax.nn.sigmoid(attn)[:, None, None, :]

        # spatial attention
        s_avg = jnp.mean(x, axis=-1, keepdims=True)
        s_max = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([s_avg, s_max], axis=-1)
        p = (self.spatial_kernel - 1) // 2
        from cotnet_tpu.nn.conv import ConvBnAct
        s = ConvBnAct(1, self.spatial_kernel, padding=p, act=None,
                      dtype=self.dtype, name="spatial")(s, training=training)
        return x * jax.nn.sigmoid(s)


_ATTN = {
    "se": SEModule,
    "ese": EffectiveSEModule,
    "eca": EcaModule,
    "ceca": lambda channels, **kw: EcaModule(channels=channels, circular=True, **kw),
    "cbam": CbamModule,
    "lcbam": lambda channels, **kw: CbamModule(channels=channels, light=True, **kw),
}


def create_attn(attn_type, channels, **kwargs):
    """String -> attention module (reference create_attn.py:11-37)."""
    if attn_type is None or attn_type is False:
        return None
    if attn_type is True:
        attn_type = "se"
    if isinstance(attn_type, str):
        cls = _ATTN.get(attn_type.lower())
        if cls is None:
            raise ValueError(f"invalid attn module {attn_type!r}")
        return cls(channels=channels, **kwargs)
    return attn_type(channels=channels, **kwargs)
