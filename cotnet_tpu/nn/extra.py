"""Extended layer zoo (reference models/layers/: shiftlution.py, tbconv.py,
kerv2d.py, space_to_depth.py, selective_kernel.py, evo_norm.py,
split_batchnorm.py, cond_conv2d.py, mixed_conv2d.py, test_time_pool.py).

All NHWC flax modules; geometric index tricks become static pad/slice
(XLA-fusible) instead of the reference's scatter/gather buffers.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.nn.activations import get_act_fn
from cotnet_tpu.nn.conv import Conv2d, ConvBnAct, get_padding, to_2tuple
from cotnet_tpu.nn.norm import batch_norm


def _sorted_shifts(kernel_h: int, kernel_w: int) -> List[Tuple[int, int]]:
    """Shift ordering used by Shiftlution (reference shiftlution.py:13-26):
    near-center shifts first, deterministic tie-breaking."""
    shifts, keys = [], []
    sh = range(-(kernel_h - 1) // 2, (kernel_h - 1) // 2 + 1) if kernel_h > 1 else [0]
    sw = range(-(kernel_w - 1) // 2, (kernel_w - 1) // 2 + 1) if kernel_w > 1 else [0]
    for h in sh:
        for w in sw:
            shifts.append((h, w))
            keys.append(max(abs(h) + abs(h) / 10 + abs(w) / 100 + h / 1000 + w / 10000,
                            abs(w) + abs(h) / 20 + abs(w) / 200 + h / 2000 + w / 20000))
    order = np.argsort(keys)
    return [shifts[i] for i in order]


class Shiftlution(fnn.Module):
    """Channel-wise spatial shift (reference shiftlution.py): channel span i
    (C // (kh*kw) channels) shifts by the i-th sorted offset; leftover
    channels pass through.  The reference scatters into a padded buffer;
    here each span is a static pad+slice, which XLA fuses."""

    channels: int
    kernel_h: int = 3
    kernel_w: int = 3

    @fnn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        ph, pw = (self.kernel_h - 1) // 2, (self.kernel_w - 1) // 2
        shifts = _sorted_shifts(self.kernel_h, self.kernel_w)
        span = c // (self.kernel_h * self.kernel_w)
        xp = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
        outs = []
        for i, (ho, wo) in enumerate(shifts):
            xs = xp[:, ph - ho:ph - ho + h, pw - wo:pw - wo + w,
                    i * span:(i + 1) * span]
            outs.append(xs)
        outs.append(x[..., len(shifts) * span:])
        return jnp.concatenate(outs, axis=-1)


class TBConv(fnn.Module):
    """Tied-block conv (reference tbconv.py): one conv shared across
    ``blocks`` channel blocks — fold blocks into batch."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1
    blocks: int = 1
    use_bias: bool = True
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        b = self.blocks
        assert c % b == 0 and self.out_channels % b == 0
        xb = x.reshape(n, h, w, b, c // b).transpose(0, 3, 1, 2, 4)
        xb = xb.reshape(n * b, h, w, c // b)
        y = Conv2d(self.out_channels // b, self.kernel_size, self.stride,
                   self.padding, self.dilation, self.groups,
                   use_bias=self.use_bias, dtype=self.dtype, name="conv")(xb)
        _, ho, wo, co = y.shape
        y = y.reshape(n, b, ho, wo, co).transpose(0, 2, 3, 1, 4)
        return y.reshape(n, ho, wo, b * co)


class Kerv2d(fnn.Module):
    """Polynomial kervolution, 1x1 only (reference kerv2d.py):
    out = (conv(x) + balance)^power (+ bias), faithfully including the
    reference's double bias add."""

    out_channels: int
    balance: float = 1.0
    power: int = 3
    use_bias: bool = True
    learnable_kernel: bool = False
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        y = Conv2d(self.out_channels, 1, use_bias=False,
                   dtype=self.dtype, name="conv")(x)
        bias = (self.param("bias", fnn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
                if self.use_bias else None)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if self.learnable_kernel:
            balance = self.param("balance",
                                 fnn.initializers.constant(self.balance),
                                 (self.out_channels,), jnp.float32)
        else:
            balance = jnp.full((self.out_channels,), self.balance)
        y = jnp.power(y + balance.astype(y.dtype), self.power)
        if bias is not None:
            # reference adds the bias again after the power (kerv2d.py:49-50)
            y = y + bias.astype(y.dtype)
        return y


def space_to_depth(x, block_size: int = 4):
    """NHWC space-to-depth with (sh, sw, c)-major channel order matching the
    reference permute (space_to_depth.py)."""
    n, h, w, c = x.shape
    bs = block_size
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


class SpaceToDepth(fnn.Module):
    block_size: int = 4

    def __call__(self, x):
        return space_to_depth(x, self.block_size)


class SelectiveKernelConv(fnn.Module):
    """SK conv (reference selective_kernel.py): parallel 3x3 branches at
    different dilations, softmax path attention over pooled features."""

    out_channels: int
    kernel_size: Optional[Sequence[int]] = None
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    attn_reduction: int = 16
    min_attn_channels: int = 32
    keep_3x3: bool = True
    split_input: bool = False
    act: str = "relu"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        ks = list(self.kernel_size or [3, 5])
        if self.keep_3x3:
            dil = [self.dilation * (k - 1) // 2 for k in ks]
            ks = [3] * len(ks)
        else:
            dil = [self.dilation] * len(ks)
        num_paths = len(ks)
        in_c = x.shape[-1]
        groups = min(self.out_channels, self.groups)

        if self.split_input:
            assert in_c % num_paths == 0
            xs = jnp.split(x, num_paths, axis=-1)
        else:
            xs = [x] * num_paths
        paths = []
        for i, (k, d) in enumerate(zip(ks, dil)):
            paths.append(ConvBnAct(
                self.out_channels, k, self.stride,
                get_padding(k, self.stride, d), d, groups, act=self.act,
                dtype=self.dtype, axis_name=self.axis_name,
                name=f"path_{i}")(xs[i], training=training))
        stacked = jnp.stack(paths, axis=1)  # [N, paths, H, W, C]

        attn_chs = max(int(self.out_channels / self.attn_reduction),
                       self.min_attn_channels)
        s = jnp.mean(jnp.sum(stacked, axis=1), axis=(1, 2))  # [N, C]
        s = fnn.Dense(attn_chs, use_bias=False, dtype=self.dtype,
                      name="fc_reduce")(s)
        s = batch_norm(s, training, name="bn", dtype=self.dtype,
                       axis_name=self.axis_name)
        s = get_act_fn(self.act)(s)
        s = fnn.Dense(self.out_channels * num_paths, use_bias=False,
                      dtype=self.dtype, name="fc_select")(s)
        s = s.reshape(-1, num_paths, self.out_channels)
        s = jax.nn.softmax(s, axis=1)
        return jnp.sum(stacked * s[:, :, None, None, :], axis=1)


class EvoNorm2dB0(fnn.Module):
    """EvoNorm-B0 (reference evo_norm.py)."""

    apply_act: bool = True
    momentum: float = 0.9
    eps: float = 1e-3

    @fnn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        if self.apply_act:
            v = self.param("v", fnn.initializers.ones, (c,), jnp.float32)
            running_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
            if training:
                var = jnp.var(xf, axis=(0, 1, 2))
                running_var.value = (self.momentum * running_var.value
                                     + (1 - self.momentum) * var)
            else:
                var = running_var.value
            den = jnp.maximum(jnp.sqrt(var + self.eps), v * xf
                              + instance_std(xf, self.eps))
            xf = xf / den
        return (xf * scale + bias).astype(x.dtype)


def instance_std(x, eps=1e-5):
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return jnp.sqrt(var + eps)


def group_std(x, groups=32, eps=1e-5):
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    return jnp.broadcast_to(jnp.sqrt(var + eps), xg.shape).reshape(n, h, w, c)


class EvoNorm2dS0(fnn.Module):
    """EvoNorm-S0 (reference evo_norm.py:44-83)."""

    groups: int = 32
    apply_act: bool = True

    @fnn.compact
    def __call__(self, x, training: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        if self.apply_act:
            v = self.param("v", fnn.initializers.ones, (c,), jnp.float32)
            xf = xf * jax.nn.sigmoid(xf * v) / group_std(xf, self.groups)
        return (xf * scale + bias).astype(x.dtype)


class SplitBatchNorm(fnn.Module):
    """Aug-split BN (reference split_batchnorm.py:75): the batch is the
    concatenation of ``num_splits`` augmentation splits; each split gets its
    own statistics (split 0 = the 'clean' main BN)."""

    num_splits: int = 2
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.num_splits <= 1:
            return batch_norm(x, training, name="bn_0", dtype=self.dtype,
                              axis_name=self.axis_name)
        splits = jnp.split(x, self.num_splits, axis=0)
        outs = [batch_norm(s, training, name=f"bn_{i}", dtype=self.dtype,
                           axis_name=self.axis_name)
                for i, s in enumerate(splits)]
        return jnp.concatenate(outs, axis=0)


class CondConv2d(fnn.Module):
    """Conditionally-parameterized conv (reference cond_conv2d.py): per-sample
    sigmoid-routed mixture of ``num_experts`` kernels.

    ``routing`` may be passed in so several convs share one routing vector,
    as CondConvResidual does (reference efficientnet_blocks.py:303-326: one
    ``routing_fn`` on the block input feeds conv_pw/conv_dw/conv_pwl)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = None        # int, None (torch symmetric), or "same" (TF)
    dilation: int = 1
    groups: int = 1
    num_experts: int = 4
    use_bias: bool = False
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, routing=None):
        n, h, w, c = x.shape
        k = to_2tuple(self.kernel_size)
        if isinstance(self.padding, str):
            pad = self.padding.upper()
        else:
            p = (self.padding if self.padding is not None
                 else get_padding(self.kernel_size, self.stride, self.dilation))
            pad = ((p, p), (p, p))
        kernels = self.param(
            "experts", fnn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.num_experts, k[0], k[1], c // self.groups, self.out_channels),
            jnp.float32)
        if routing is None:
            routing = jax.nn.sigmoid(
                fnn.Dense(self.num_experts, name="routing")(
                    jnp.mean(x, axis=(1, 2))))
        route = routing  # [N, E]
        per_sample_kernel = jnp.einsum("ne,ehwio->nhwio", route,
                                       kernels.astype(x.dtype))

        def conv_one(xi, ki):
            return jax.lax.conv_general_dilated(
                xi[None], ki, (self.stride, self.stride),
                pad, rhs_dilation=(self.dilation,) * 2,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        y = jax.vmap(conv_one)(x, per_sample_kernel)
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros,
                           (self.num_experts, self.out_channels), jnp.float32)
            y = y + jnp.einsum("ne,eo->no", route, b)[:, None, None, :].astype(y.dtype)
        return y


def _split_channels(num_chan: int, num_groups: int):
    """Reference mixed_conv2d.py:14-17 — equal splits, FIRST group takes the
    remainder (this choice is load-bearing for checkpoint parity)."""
    split = [num_chan // num_groups] * num_groups
    split[0] += num_chan - sum(split)
    return split


class MixedConv2d(fnn.Module):
    """Mixed depthwise/grouped conv (reference mixed_conv2d.py): channel
    groups with different kernel sizes, concatenated."""

    out_channels: int
    kernel_sizes: Sequence[int] = (3, 5)
    stride: int = 1
    dilation: int = 1
    depthwise: bool = False
    pad_type: str = ""          # "" = torch symmetric, "same" = TF-SAME
    dtype: Any = None

    @fnn.compact
    def __call__(self, x):
        c = x.shape[-1]
        num = len(self.kernel_sizes)
        in_splits = _split_channels(c, num)
        out_splits = _split_channels(self.out_channels, num)
        xs = jnp.split(x, np.cumsum(in_splits)[:-1].tolist(), axis=-1)
        outs = []
        for i, (k, xi, oc) in enumerate(zip(self.kernel_sizes, xs, out_splits)):
            groups = oc if self.depthwise else 1
            pad = ("same" if self.pad_type == "same"
                   else get_padding(k, self.stride, self.dilation))
            outs.append(Conv2d(oc, k, self.stride, pad,
                               self.dilation, groups, dtype=self.dtype,
                               name=f"conv_{i}")(xi))
        return jnp.concatenate(outs, axis=-1)


def test_time_pool(logits_fn, x, crop_size: int):
    """Test-time pooling (reference test_time_pool.py): run the feature
    extractor on the full image, average predictions over spatial positions.
    ``logits_fn`` maps NHWC features to per-position logits."""
    logits = logits_fn(x)
    return jnp.mean(logits, axis=(1, 2))
