"""Split-attention conv (ResNeSt) — reference models/layers/split_attn.py.

At radix=1 this degenerates to a conv + sigmoid SE gate, which is exactly the
"SE" in SE-CoTNetD (SURVEY.md §2.2); radix>1 is the full ResNeSt block used
by the resnest model family.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.activations import get_act_fn
from cotnet_tpu.nn.conv import Conv2d
from cotnet_tpu.nn.norm import batch_norm


def radix_softmax(x, radix: int, cardinality: int):
    """[N, R*C'] gate logits -> normalized gates (split_attn.py:14-28).

    The fc2 logits arrive cardinality-major ([card, radix, c], the grouped
    conv's layout); the gates are consumed radix-major, so flatten through
    the reference's transpose (split_attn.py:23-25)."""
    n = x.shape[0]
    if radix > 1:
        x = x.reshape(n, cardinality, radix, -1)
        x = jax.nn.softmax(x, axis=2)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return x.reshape(n, -1)
    return jax.nn.sigmoid(x)


class SplitAttnConv2d(fnn.Module):
    """conv(groups*radix) + BN + act, then radix-softmax channel gating."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    act: str = "relu"
    use_bn: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False, drop_block=None):
        in_channels = x.shape[-1]
        mid = self.out_channels * self.radix
        attn_chs = max(in_channels * self.radix // self.reduction_factor, 32)

        x = Conv2d(mid, self.kernel_size, self.stride, self.padding,
                   self.dilation, self.groups * self.radix, dtype=self.dtype,
                   name="conv")(x)
        if self.use_bn:
            x = batch_norm(x, training, name="bn0", dtype=self.dtype, axis_name=self.axis_name)
        if drop_block is not None:
            x = drop_block(x, training=training)
        x = get_act_fn(self.act)(x)

        n, h, w, rc = x.shape
        if self.radix > 1:
            # channel layout [radix, C'] (radix-major), matching the
            # reference's reshape (B, radix, RC//radix, H, W)
            xr = x.reshape(n, h, w, self.radix, self.out_channels)
            gap = jnp.sum(xr, axis=3)
        else:
            gap = x
        # fc1/fc2 are 1x1 convs grouped by cardinality (split_attn.py:48-51)
        gap = jnp.mean(gap, axis=(1, 2))[:, None, None, :]  # [N, 1, 1, C']
        gap = Conv2d(attn_chs, 1, groups=self.groups, use_bias=True,
                     dtype=self.dtype, name="fc1")(gap)
        if self.use_bn:
            gap = batch_norm(gap, training, name="bn1", dtype=self.dtype,
                             axis_name=self.axis_name)
        gap = get_act_fn(self.act)(gap)
        attn = Conv2d(mid, 1, groups=self.groups, use_bias=True,
                      dtype=self.dtype, name="fc2")(gap)[:, 0, 0, :]
        attn = radix_softmax(attn, self.radix, self.groups)

        if self.radix > 1:
            attn = attn.reshape(n, 1, 1, self.radix, self.out_channels)
            out = jnp.sum(xr * attn, axis=3)
        else:
            out = x * attn[:, None, None, :]
        return out
