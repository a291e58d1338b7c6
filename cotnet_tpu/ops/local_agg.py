"""Local aggregation (contextual attention) — the CoTNet hot op, TPU-native.

Semantics (matching the reference CUDA kernels,
/root/reference/cupy_layers/aggregation_zeropad.py:20-46): given an input
feature map ``x`` and a *per-position* weight tensor ``w`` whose channels are
shared across groups of ``share_planes`` input channels, compute

    out[n, ho, wo, head*C + g*Cw + cw] =
        sum_{kh,kw} w[n, ho, wo, head, kh*Kw+kw, cw]
                    * x[n, ho*s - pad + kh*dil, wo*s - pad + kw*dil, g*Cw + cw]

i.e. a K x K neighborhood attention where the attention map is data-dependent
per spatial position, with ``Cw = C // share_planes`` weight channels
broadcast over ``G = C // Cw`` channel groups.

Layout notes (TPU-first, deliberately NOT the reference layout):
- activations are NHWC (channel-last, lane-aligned);
- the weight is ``[N, Ho, Wo, heads, K*K, Cw]`` — *k-major* so each kernel tap
  is a contiguous lane slice.  The reference uses ``[N, heads, Cw, K*K, H, W]``
  (cw-major); the PyTorch checkpoint converter permutes the producing conv's
  output channels accordingly.

Two implementations:
- ``_agg_core_xla``: pad + K*K shifted slices + broadcast-multiply-reduce.
  Pure XLA, differentiable, fuses well; this is also the numerical oracle
  (mirrors the unfold/einsum test at aggregation_zeropad.py:249-251).
- Pallas TPU kernels in ``local_agg_pallas`` (fwd + custom VJP), selected by
  ``impl='pallas'`` or automatically on TPU for the stride-1 case.

Padding (zero or reflect) is applied *outside* the core op with ``jnp.pad``;
the core computes a VALID aggregation on the padded input.  The pad VJP
(slice for zeros, slice+fold for reflect — the reference hand-writes the fold
in aggregation_refpad.py:196-200) then composes automatically under autodiff.
"""

from __future__ import annotations

import functools
from typing import Sequence

import os as _os

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return tuple(v)
    return (v, v)


def out_size(in_size: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (in_size + 2 * pad - (dil * (k - 1) + 1)) // stride + 1


def _check_shapes(x, w, kernel_size):
    n, hi, wi, c = x.shape
    nw, ho, wo, heads, k2, cw = w.shape
    kh, kw = kernel_size
    if nw != n:
        raise ValueError(f"batch mismatch: x {n} vs w {nw}")
    if k2 != kh * kw:
        raise ValueError(f"w K^2 dim {k2} != {kh}*{kw}")
    if c % cw != 0:
        raise ValueError(f"x channels {c} not divisible by weight channels {cw}")


def _pad_input(x, pad, dilation, pad_mode):
    ph, pw = pad
    if ph == 0 and pw == 0:
        return x
    cfg = [(0, 0), (ph, ph), (pw, pw), (0, 0)]
    if pad_mode == "zeros":
        return jnp.pad(x, cfg)
    elif pad_mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    else:
        raise ValueError(f"unknown pad_mode {pad_mode!r}")


def _agg_core_xla(xp, w, kernel_size, stride, dilation, w_scale=None,
                  w_bias=None):
    """VALID local aggregation on a pre-padded input.

    xp: [N, Hp, Wp, C], w: [N, Ho, Wo, heads, Kh*Kw, Cw] -> [N, Ho, Wo, heads*C]
    w_scale/w_bias: optional [N, heads, K2, Cw] affine applied to w inline
    (the GroupNorm fold — XLA fuses it into the multiply-reduce, so the
    normalized weight is never materialized).
    """
    n, hp, wp, c = xp.shape
    _, ho, wo, heads, k2, cw = w.shape
    kh, kw = kernel_size
    sh, sw = stride
    dh, dw_ = dilation
    g = c // cw

    taps = []
    for ikh in range(kh):
        for ikw in range(kw):
            h0, w0 = ikh * dh, ikw * dw_
            tap = lax.slice(
                xp,
                (0, h0, w0, 0),
                (n, h0 + (ho - 1) * sh + 1, w0 + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            taps.append(tap)
    patches = jnp.stack(taps, axis=3)  # [N, Ho, Wo, K2, C]
    patches = patches.reshape(n, ho, wo, 1, k2, g, cw)
    wb = w.reshape(n, ho, wo, heads, k2, 1, cw)
    if w_scale is not None:
        # the affine (GroupNorm fold) is applied in f32 — scale/bias come
        # from f32 statistics and w*s+b cancels near w~mu — then rounded
        # back to the model dtype, exactly the precision the unfused
        # GroupNorm's output would have (keeping it f32 materializes an
        # f32 copy of the layer's largest tensor)
        acc_dtype = jnp.promote_types(xp.dtype, jnp.float32)
        sb = w_scale.reshape(n, 1, 1, heads, k2, 1, cw).astype(acc_dtype)
        bb = w_bias.reshape(n, 1, 1, heads, k2, 1, cw).astype(acc_dtype)
        wb = (wb.astype(acc_dtype) * sb + bb).astype(xp.dtype)
    # products in the model dtype, f32 accumulation only (jnp.sum dtype):
    # upcasting patches/w first materializes f32 copies of the two largest
    # tensors (see the VJP note below; same measured effect)
    out = jnp.sum(patches * wb, axis=4, dtype=jnp.float32)
    return out.reshape(n, ho, wo, heads * c).astype(xp.dtype)


# Custom VJP for the stride-1 XLA core.  Autodiff's transpose of the
# gather formulation materializes the f32 d_patches tensor ([N,Ho,Wo,K2,C]
# — 924 MB at 56x56 bs128) and scatter-adds it through a pad/add_any chain;
# the trace attribution (tools/train_attr.py) measured this at 16.8 ms/iter
# for cotnet50's stage 1 alone.  This VJP computes both grads gather-style
# with no K2-sized intermediate:
#   dw[...,k,:] = sum_g xp[tap_k] * dy          (one fused loop per tap)
#   dxp        += pad_k(sum_heads w[...,k,:]*dy) (static-offset pad chain)
# Everything stays in the model dtype until the final f32 accumulation XLA
# fuses into the consumer loop.
_XLA_AGG_VJP = _os.environ.get("COTNET_XLA_AGG_VJP", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _agg_xla_stride1(xp, w, kernel_size, dilation):
    return _agg_core_xla(xp, w, kernel_size, (1, 1), dilation)


def _agg_xla_s1_fwd(xp, w, kernel_size, dilation):
    return _agg_xla_stride1(xp, w, kernel_size, dilation), (xp, w)


def _agg_xla_s1_bwd(kernel_size, dilation, res, dy):
    xp, w = res
    n, hp, wpd, c = xp.shape
    _, ho, wo, heads, k2, cw = w.shape
    kh, kw = kernel_size
    dh, dw_ = dilation
    g = c // cw
    # Products stay in the model dtype; only the reductions accumulate f32
    # (jnp.sum dtype) — upcasting dyh/xs to f32 first materializes converted
    # copies that double the loop's HBM traffic (measured: 6.63 -> 4.80 ms
    # per stage-1 block fwd+bwd at bs128 bf16, tools/s1_bwd_bench.py; for
    # f32 inputs the two forms are bit-identical).
    dyh = dy.reshape(n, ho, wo, heads, g, cw)

    dws = []
    dxp = None
    for ikh in range(kh):
        for ikw in range(kw):
            h0, w0 = ikh * dh, ikw * dw_
            xs = lax.slice(xp, (0, h0, w0, 0), (n, h0 + ho, w0 + wo, c))
            xs6 = xs.reshape(n, ho, wo, 1, g, cw)
            dws.append(jnp.sum(xs6 * dyh, axis=4,
                               dtype=jnp.float32))  # [n,ho,wo,heads,cw]
            wk = w[:, :, :, :, ikh * kw + ikw, :]
            q = jnp.sum(wk[:, :, :, :, None, :] * dyh, axis=3,
                        dtype=jnp.float32)
            q = q.reshape(n, ho, wo, c)
            qp = jnp.pad(q, ((0, 0), (h0, hp - ho - h0),
                             (w0, wpd - wo - w0), (0, 0)))
            dxp = qp if dxp is None else dxp + qp
    dwt = jnp.stack(dws, axis=4)  # [n,ho,wo,heads,k2,cw]
    return dxp.astype(xp.dtype), dwt.astype(w.dtype)


_agg_xla_stride1.defvjp(_agg_xla_s1_fwd, _agg_xla_s1_bwd)


def extract_patches(x, kernel_size=3, stride=1, padding=None, dilation=1,
                    pad_mode: str = "zeros"):
    """K x K neighborhood patches: [N,H,W,C] -> [N,Ho,Wo,K*K,C].

    The jnp analog of nn.Unfold as used by the reference's oracles and
    LR-Net's key unfold (lr_net.py:75,85-86); taps ordered (kh, kw)."""
    kernel_size = _pair(kernel_size)
    stride = _pair(stride)
    dilation = _pair(dilation)
    if padding is None:
        padding = tuple((d * (k - 1) + 1) // 2 for k, d in zip(kernel_size, dilation))
    else:
        padding = _pair(padding)
    n, hi, wi, c = x.shape
    ho = out_size(hi, kernel_size[0], stride[0], padding[0], dilation[0])
    wo = out_size(wi, kernel_size[1], stride[1], padding[1], dilation[1])
    xp = _pad_input(x, padding, dilation, pad_mode)
    taps = []
    for ikh in range(kernel_size[0]):
        for ikw in range(kernel_size[1]):
            h0, w0 = ikh * dilation[0], ikw * dilation[1]
            taps.append(lax.slice(
                xp, (0, h0, w0, 0),
                (n, h0 + (ho - 1) * stride[0] + 1,
                 w0 + (wo - 1) * stride[1] + 1, c),
                (1, stride[0], stride[1], 1)))
    return jnp.stack(taps, axis=3)


def local_aggregate(
    x: jax.Array,
    w: jax.Array,
    *,
    kernel_size=3,
    stride=1,
    padding=None,
    dilation=1,
    pad_mode: str = "zeros",
    impl: str = "auto",
    w_scale: jax.Array | None = None,
    w_bias: jax.Array | None = None,
) -> jax.Array:
    """Position-specific K x K weighted aggregation (the CoT "local conv").

    Args:
      x: ``[N, H, W, C]`` input features (NHWC).
      w: ``[N, Ho, Wo, heads, K*K, Cw]`` per-position weights, ``C % Cw == 0``.
      kernel_size / stride / padding / dilation: conv-style geometry.  Default
        padding is SAME-for-odd-K: ``(dilation * (K - 1) + 1) // 2``.
      pad_mode: ``'zeros'`` (aggregation_zeropad) or ``'reflect'``
        (aggregation_refpad).
      impl: ``'xla'``, ``'pallas'`` or ``'auto'`` (pallas on TPU when
        supported, else XLA).
      w_scale / w_bias: optional ``[N, heads, K*K, Cw]`` per-image affine
        applied to ``w`` inside the op (``w*scale + bias``) — the GroupNorm
        fold: the normalized weight tensor is never materialized in HBM
        (fused into the Pallas kernels; inlined into the XLA reduce).

    Returns:
      ``[N, Ho, Wo, heads*C]``; output channel ``head*C + c`` aggregates input
      channel ``c`` with weight channel ``c % Cw`` — identical channel order to
      the reference op so converted checkpoints line up.
    """
    kernel_size = _pair(kernel_size)
    stride = _pair(stride)
    dilation = _pair(dilation)
    if padding is None:
        padding = tuple((d * (k - 1) + 1) // 2 for k, d in zip(kernel_size, dilation))
    else:
        padding = _pair(padding)
    _check_shapes(x, w, kernel_size)

    n, hi, wi, c = x.shape
    ho = out_size(hi, kernel_size[0], stride[0], padding[0], dilation[0])
    wo = out_size(wi, kernel_size[1], stride[1], padding[1], dilation[1])
    if (ho, wo) != tuple(w.shape[1:3]):
        raise ValueError(f"weight spatial {w.shape[1:3]} != derived output ({ho},{wo})")

    if (w_scale is None) != (w_bias is None):
        raise ValueError("w_scale and w_bias must be given together")
    if w_scale is not None:
        expect = (w.shape[0], w.shape[3], w.shape[4], w.shape[5])
        if tuple(w_scale.shape) != expect or tuple(w_bias.shape) != expect:
            raise ValueError(
                f"affine shape {w_scale.shape}/{w_bias.shape} != {expect}")

    if impl == "identity":
        # profiling ablation: skip the aggregation entirely (tools/infer_ablate)
        heads = w.shape[3]
        return jnp.tile(x[:, ::stride[0], ::stride[1], :], (1, 1, 1, heads))

    def _apply_affine(w):
        if w_scale is None:
            return w
        n, ho_, wo_, heads, k2, cw = w.shape
        acc = jnp.promote_types(w.dtype, jnp.float32)
        wn = (w.astype(acc) * w_scale.reshape(n, 1, 1, heads, k2, cw)
              + w_bias.reshape(n, 1, 1, heads, k2, cw))
        return wn.astype(w.dtype)

    use_pallas = impl == "pallas" or (
        impl == "auto" and stride == (1, 1) and jax.default_backend() == "tpu"
    )
    if use_pallas and stride == (1, 1):
        from cotnet_tpu.ops.local_agg_pallas import (
            agg_core_pallas, agg_core_pallas_affine, chwn_strip_plan,
            pallas_plan)

        if pad_mode == "zeros":
            # zero padding fuses into the kernel (VMEM memset+copy)
            if w_scale is not None:
                plan = pallas_plan(x.shape, w.shape, x.dtype.itemsize,
                                   padding, affine=True)
                if ((plan is not None and plan[0] == "whole")
                        or chwn_strip_plan(x.shape, w.shape,
                                           x.dtype.itemsize, padding)):
                    return agg_core_pallas_affine(
                        x, w, w_scale, w_bias, kernel_size, dilation, padding)
                # strip/wloop flavors have no affine fold: pre-apply (same
                # traffic as the unfused path, no regression)
                if pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding):
                    return agg_core_pallas(x, _apply_affine(w), kernel_size,
                                           dilation, padding)
            elif (pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding)
                  or chwn_strip_plan(x.shape, w.shape, x.dtype.itemsize,
                                     padding)):
                return agg_core_pallas(x, w, kernel_size, dilation, padding)
        else:
            xp = _pad_input(x, padding, dilation, pad_mode)
            if w_scale is not None:
                plan = pallas_plan(xp.shape, w.shape, xp.dtype.itemsize,
                                   affine=True)
                if plan is not None and plan[0] == "whole":
                    return agg_core_pallas_affine(
                        xp, w, w_scale, w_bias, kernel_size, dilation, (0, 0))
            if pallas_plan(xp.shape, w.shape, xp.dtype.itemsize):
                return agg_core_pallas(xp, _apply_affine(w), kernel_size,
                                       dilation, (0, 0))
            return _agg_xla(xp, w, kernel_size, stride, dilation,
                            w_scale, w_bias)
    xp = _pad_input(x, padding, dilation, pad_mode)
    return _agg_xla(xp, w, kernel_size, stride, dilation, w_scale, w_bias)


def _agg_xla(xp, w, kernel_size, stride, dilation, w_scale, w_bias):
    """XLA core dispatch: the gather-VJP variant for the differentiable
    stride-1 plain path (the training stage-1 hot spot), the general core
    otherwise (strided, or the eval-only affine fold, where autodiff never
    runs)."""
    if _XLA_AGG_VJP and stride == (1, 1) and w_scale is None:
        return _agg_xla_stride1(xp, w, kernel_size, dilation)
    return _agg_core_xla(xp, w, kernel_size, stride, dilation, w_scale,
                         w_bias)


def local_aggregate_wt(
    x: jax.Array,
    wt: jax.Array,
    *,
    kernel_size=3,
    padding=None,
    dilation=1,
) -> jax.Array:
    """Aggregation with CHWN-RESIDENT weights (COTNET_CHWN_W path).

    ``wt``: ``[Cw, K*K, Ho, Wo, N]`` — the layout the CHWN Pallas kernels
    consume natively; its gradient returns in the same layout, so the
    weight tensor (9/8 x the activation bytes) never pays the
    NHWC<->CHWN boundary transpose in either direction.  Stride 1, zero
    pad, heads == 1 only (the CotLayer geometry); caller gates on
    ``ops.local_agg_pallas.chwn_wt_plan``."""
    from cotnet_tpu.ops import local_agg_pallas as lap

    kernel_size = _pair(kernel_size)
    dilation = _pair(dilation)
    if padding is None:
        padding = tuple((d * (k - 1) + 1) // 2
                        for k, d in zip(kernel_size, dilation))
    else:
        padding = _pair(padding)
    return lap.agg_core_pallas_wt(x, wt, kernel_size, dilation, padding)


def local_aggregate_embed_gn(
    x: jax.Array,
    w_pre: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    kernel_size=3,
    padding=None,
    dilation=1,
    eps: float = 1e-5,
    impl: str = "auto",
) -> jax.Array:
    """Embed-conv + sub-channel GroupNorm + aggregation, fused (eval path).

    Computes ``w = GN(w_pre @ w2 + b2)`` (GroupNorm per (image, cw) over
    (H, W, K^2), affine gamma/beta per (K^2, Cw) channel — the CoT embed
    normalize, reference cotnet.py:51-57) and aggregates ``x`` with it.  On
    TPU whole-image shapes this is ONE Pallas kernel and the weight tensor
    never exists in HBM; elsewhere it falls back to the XLA composition
    with the deferred-normalize affine (still fusion-friendly).

    w2: [Cp, K^2*Cw] (flattened 1x1 conv kernel); b2/gamma/beta: [K^2*Cw].
    """
    kernel_size = _pair(kernel_size)
    dilation = _pair(dilation)
    if padding is None:
        padding = tuple((d * (k - 1) + 1) // 2
                        for k, d in zip(kernel_size, dilation))
    else:
        padding = _pair(padding)
    f = w2.shape[-1]
    k2 = kernel_size[0] * kernel_size[1]
    cw = f // k2
    n, hi, wi, c = x.shape

    use_pallas = (jax.default_backend() == "tpu" or impl == "pallas") \
        and impl != "xla"
    if use_pallas:
        from cotnet_tpu.ops.local_agg_pallas import (
            agg_embed_gn_pallas, fused_embed_plan)
        if fused_embed_plan(x.shape, w_pre.shape, f, x.dtype.itemsize,
                            padding):
            return agg_embed_gn_pallas(x, w_pre, w2, b2, gamma, beta,
                                       kernel_size, dilation, padding,
                                       eps=eps)

    # XLA fallback: materialize the conv output once, defer the normalize
    # into the aggregation (fuses into the multiply-reduce)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    wr = (jnp.einsum("nhwc,cf->nhwf", w_pre.astype(x.dtype),
                     w2.astype(x.dtype),
                     preferred_element_type=acc)
          + b2.astype(acc)).astype(acc)
    wrk = wr.reshape(n, hi, wi, k2, cw)
    mean = jnp.mean(wrk, axis=(1, 2, 3), keepdims=True)
    mean2 = jnp.mean(jnp.square(wrk), axis=(1, 2, 3), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)          # [n,1,1,1,cw]
    gk = gamma.astype(acc).reshape(1, k2, cw)
    bk = beta.astype(acc).reshape(1, k2, cw)
    s = (inv[:, 0, 0] * gk)                 # [n,k2,cw]
    b = bk - mean[:, 0, 0] * s
    return local_aggregate(
        x, wr.astype(x.dtype).reshape(n, hi, wi, 1, k2, cw),
        kernel_size=kernel_size, padding=padding, dilation=dilation,
        impl=impl, w_scale=s[:, None], w_bias=b[:, None])


def local_aggregate_mix(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    *,
    kernel_size1=3,
    kernel_size2=5,
    stride=1,
    padding1=None,
    padding2=None,
    dilation=1,
    pad_mode: str = "zeros",
    impl: str = "auto",
) -> jax.Array:
    """Dual-kernel aggregation (reference aggregation_zeropad_mix.py:20-74).

    Aggregates ``x`` with a K1 x K1 weight ``w1`` and a K2 x K2 weight ``w2``
    and concatenates on channels: output ``[N, Ho, Wo, 2*heads*C]`` ordered
    ``[kernel_idx, head, c]`` — kernel-major, matching the reference output
    ``[N, 2*heads*C, Ho, Wo]`` (test at aggregation_zeropad_mix.py:344-386).

    On the reference's exact geometry (K1=3/K2=5 SAME, stride 1, dilation 1,
    zero pad — LocalConvolutionMix asserts this, aggregation_zeropad_mix.py
    :328-329) the TPU path is a SINGLE fused Pallas launch per pass
    (fwd/dx/dw), mirroring the reference's one-launch CUDA kernels: x is
    read once for both aggregations and the halves write into one output.
    """
    fused_geom = (
        pad_mode == "zeros" and _pair(stride) == (1, 1)
        and _pair(dilation) == (1, 1)
        and _pair(kernel_size1) == (3, 3) and _pair(kernel_size2) == (5, 5)
        and padding1 in (None, 1, (1, 1)) and padding2 in (None, 2, (2, 2))
        and w1.shape[1:3] == x.shape[1:3] and w2.shape[1:3] == x.shape[1:3]
        and w1.shape[3:] == (w2.shape[3], 9, w2.shape[5])
        and w2.shape[4] == 25)
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu")
    if fused_geom and use_pallas:
        from cotnet_tpu.ops.local_agg_pallas import (
            agg_core_pallas_mix, mix_plan)
        if mix_plan(x.shape, w1.shape, w2.shape, x.dtype.itemsize):
            return agg_core_pallas_mix(x, w1, w2)
    y1 = local_aggregate(
        x, w1, kernel_size=kernel_size1, stride=stride, padding=padding1,
        dilation=dilation, pad_mode=pad_mode, impl=impl)
    y2 = local_aggregate(
        x, w2, kernel_size=kernel_size2, stride=stride, padding=padding2,
        dilation=dilation, pad_mode=pad_mode, impl=impl)
    return jnp.concatenate([y1, y2], axis=-1)


def local_aggregate_mix_merge(
    x: jax.Array,
    w: jax.Array,
    *,
    kernel_size1=3,
    kernel_size2=5,
    stride=1,
    padding1=None,
    padding2=None,
    dilation=1,
    pad_mode: str = "zeros",
    impl: str = "auto",
) -> jax.Array:
    """Packed dual-kernel aggregation (aggregation_zeropad_mix_merge.py:269-271).

    ``w``: ``[N, Ho, Wo, heads, K1*K1 + K2*K2, Cw]`` with the K1 taps first.
    Equivalent to :func:`local_aggregate_mix` on the unpacked halves.
    """
    k1sq = _pair(kernel_size1)[0] * _pair(kernel_size1)[1]
    w1 = w[:, :, :, :, :k1sq, :]
    w2 = w[:, :, :, :, k1sq:, :]
    return local_aggregate_mix(
        x, w1, w2, kernel_size1=kernel_size1, kernel_size2=kernel_size2,
        stride=stride, padding1=padding1, padding2=padding2,
        dilation=dilation, pad_mode=pad_mode, impl=impl)


def local_aggregate_dilated(
    x: jax.Array,
    w: jax.Array,
    dilations: Sequence[int],
    *,
    kernel_size=3,
    stride=1,
    padding=None,
    pad_mode: str = "zeros",
    impl: str = "auto",
) -> jax.Array:
    """Per-weight-channel dilation (aggregation_zeropad_dilate.py:30-35).

    ``dilations`` is a static per-``cw`` sequence of ints (the reference reads
    it from a device buffer at kernel runtime; it is a model hyperparameter,
    so here it is trace-time static).  Weight channel ``cw`` aggregates its
    neighborhood at dilation ``dilations[cw]`` with SAME padding at that
    dilation (the reference hard-codes ``pad = dilation`` for K=3,
    aggregation_zeropad_dilate.py:33-34), so output spatial == input spatial
    for every channel.  ``padding`` is ignored (kept for API symmetry).
    """
    del padding  # per-channel SAME padding is implied by the op's semantics
    dilations = tuple(int(d) for d in dilations)
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    if len(dilations) != cw:
        raise ValueError(f"need one dilation per weight channel ({cw}), got {len(dilations)}")

    uniq = sorted(set(dilations))
    mask_dtype = jnp.promote_types(x.dtype, jnp.float32)
    out = None
    for d in uniq:
        yd = local_aggregate(
            x, w, kernel_size=kernel_size, stride=stride, padding=None,
            dilation=d, pad_mode=pad_mode, impl=impl)
        # channel c of each head uses dilation dilations[c % Cw]
        cw_mask = jnp.asarray([dd == d for dd in dilations], dtype=mask_dtype)
        full_mask = jnp.tile(cw_mask, (heads * c) // cw)
        out = yd * full_mask if out is None else out + yd * full_mask
    return out.astype(x.dtype)
