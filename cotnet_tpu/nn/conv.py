"""Convolution building blocks (NHWC, torch-compatible geometry).

Covers the reference layer-zoo conv helpers: ConvBnAct
(models/layers/conv_bn_act.py), symmetric int padding (padding.py),
TF-'SAME' asymmetric padding (conv2d_same.py — flax/XLA 'SAME' has identical
semantics), and weight-standardized conv (std_conv.py).  Weights are HWIO;
the PyTorch converter transposes OIHW.

``Conv2d`` is a *factory* returning a plain ``fnn.Conv`` so parameter paths
stay flat (``<name>/kernel``) for the checkpoint converter.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax.numpy as jnp
from jax import lax
from flax import linen as fnn

from cotnet_tpu.nn.activations import get_act_fn

Dtype = Any


def to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def get_padding(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Symmetric 'same-ish' int padding (reference layers/padding.py:9-11)."""
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


def pad_same(x, kernel_size, stride, dilation=(1, 1), value=0.0):
    """TF-SAME asymmetric padding on NHWC (reference conv2d_same.py:14-25);
    used by the SAME-pool wrappers."""
    ih, iw = x.shape[1], x.shape[2]
    pads = []
    for i, (k, s, d) in enumerate(zip(kernel_size, stride, dilation)):
        size = (ih, iw)[i]
        pad = max((-(size // -s) - 1) * s + (k - 1) * d + 1 - size, 0)
        pads.append((pad // 2, pad - pad // 2))
    return jnp.pad(x, [(0, 0), pads[0], pads[1], (0, 0)],
                   constant_values=value)


# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') — the reference
# init for every conv (resnet.py:596-599)
kaiming_normal_out = fnn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normalize_padding(padding, kernel_size, stride, dilation):
    ks, st, di = to_2tuple(kernel_size), to_2tuple(stride), to_2tuple(dilation)
    if padding is None:
        padding = tuple(get_padding(k, s, d) for k, s, d in zip(ks, st, di))
    if isinstance(padding, str):
        return padding.upper()
    p = to_2tuple(padding)
    return ((p[0], p[0]), (p[1], p[1]))


def Conv2d(features: int,
           kernel_size: Union[int, Tuple[int, int]] = 1,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, str, Tuple[int, int], None] = None,
           dilation: Union[int, Tuple[int, int]] = 1,
           groups: int = 1,
           use_bias: bool = False,
           dtype: Optional[Dtype] = None,
           kernel_init: Callable = kaiming_normal_out,
           name: Optional[str] = None) -> fnn.Conv:
    """NHWC conv factory with torch-style default padding."""
    return fnn.Conv(
        features=features,
        kernel_size=to_2tuple(kernel_size),
        strides=to_2tuple(stride),
        padding=normalize_padding(padding, kernel_size, stride, dilation),
        kernel_dilation=to_2tuple(dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init,
        name=name,
    )


class DenseGroupedConv(fnn.Module):
    """Grouped conv computed as a dense conv with a block-diagonal kernel.

    XLA lowers a grouped conv's wgrad to per-group contractions whose
    contracting dim is ``cin/groups`` lanes — at cotnet's key_embed shapes
    (e.g. 64ch/4 groups = 16-lane contractions) that underfills the 128-wide
    MXU.  Scattering the grouped kernel into a dense [kh,kw,cin,cout]
    block-diagonal kernel costs ``groups``x the FLOPs but runs full-width;
    whether that wins is shape-dependent, so this is opt-in per call site
    (models gate it on COTNET_DENSE_GROUPED, measured on chip).

    The parameter keeps the grouped shape/path (``<name>/kernel``,
    [kh,kw,cin/groups,cout]) so checkpoints and the torch converter are
    unaffected; gradients flow through the scatter (a gather in reverse).
    Semantics identical to ``fnn.Conv(feature_group_count=groups)``.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    kernel_init: Callable = kaiming_normal_out

    @fnn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        g = self.groups
        cig, cog = cin // g, self.features // g
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cig, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        k = kernel.astype(dt)
        dense = jnp.zeros((kh, kw, cin, self.features), dt)
        for gi in range(g):
            dense = dense.at[:, :, gi * cig:(gi + 1) * cig,
                             gi * cog:(gi + 1) * cog].set(
                k[:, :, :, gi * cog:(gi + 1) * cog])
        pad = self.padding
        if isinstance(pad, tuple):
            pad = list(pad)
        y = lax.conv_general_dilated(
            x.astype(dt), dense, self.strides, pad,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", fnn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class ConvBnAct(fnn.Module):
    """conv + BN + act (reference models/layers/conv_bn_act.py)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    stride: int = 1
    padding: Union[int, str, None] = None
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = "relu"
    use_bn: bool = True
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        from cotnet_tpu.nn.norm import batch_norm
        x = Conv2d(self.features, self.kernel_size, self.stride, self.padding,
                   self.dilation, self.groups, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = batch_norm(x, training, name="bn", dtype=self.dtype,
                           axis_name=self.axis_name)
        if self.act:
            x = get_act_fn(self.act)(x)
        return x


class StdConv2d(fnn.Module):
    """Weight-standardized conv (reference std_conv.py — used by NFNet-style
    models and available through the layer zoo)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[int, str, None] = None
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x):
        ks = to_2tuple(self.kernel_size)
        st = to_2tuple(self.stride)
        di = to_2tuple(self.dilation)
        pad = self.padding
        if pad is None:
            pad = tuple(get_padding(k, s, d) for k, s, d in zip(ks, st, di))
        ph, pw = to_2tuple(pad)
        in_feats = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", kaiming_normal_out,
            (*ks, in_feats, self.features), jnp.float32)
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        # reference std_conv.py:31: (w - mean) / (std + eps), biased std —
        # NOT /sqrt(var + eps); the two differ by ~0.1% at init-scale var
        kernel = (kernel - mean) * jnp.reciprocal(jnp.sqrt(var) + self.eps)
        bias = (self.param("bias", fnn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=st,
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=di,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
