"""Pallas TPU kernels for the local-aggregation core op.

TPU-native replacements for the reference's CUDA kernels
(/root/reference/cupy_layers/aggregation_zeropad.py:20-110).  Design notes:

- **Grid over batch, one image per step.**  Each step holds its blocks in
  VMEM (CoT feature maps are <= ~2 MB); >1 images per block makes Mosaic
  unroll the batch dim and blow up compile time, and one image per step
  already double-buffers the DMA.
- **Zero-padding fused into the kernel.**  A pallas custom-call is a fusion
  boundary, so an XLA-side jnp.pad would materialize the padded input in HBM
  (an extra ~2x image of traffic).  Instead the kernel memsets a VMEM scratch
  and copies the unpadded block into its interior.  Reflect padding still
  pads outside (rare path; its VJP fold comes free from jnp.pad's autodiff).
- **Full-lane FMAs.**  The op shares Cw weight channels across G = C/Cw
  groups; slicing per group would run the VPU at Cw/128 lanes (6% at
  stage 1), so each weight tap is lane-tiled to the full C width once.
- **Mosaic-legal loop structure.**  W (sublane) and channel (lane) offsets
  must be static; row (H) offsets may be dynamic.  The kernel fori-loops
  over kernel rows — keeping ONE set of fp32 temporaries live, where a fully
  unrolled K^2 loop exceeds the 16 MB scoped-VMEM limit — and unrolls the kw
  column taps.  The caller pre-transposes the weight to
  ``[N, heads*kh, Ho, Wo, kw*Cw]`` so a row of taps is addressable by a
  dynamic index on an untiled dim.
- fp32 accumulation regardless of I/O dtype.
- All three kernels (forward, input-grad, weight-grad) are Pallas; the
  weight-grad writes rows of taps into a [heads*kh, Ho, Wo, kw*Cw] layout so
  its tap index stays on an untiled dim, and the caller transposes back.

Only stride=1 has kernels (every model in the family aggregates at stride 1;
``local_agg.local_aggregate`` routes strided cases to the XLA formulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # leave headroom under ~16 MB/core


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tiled_bytes(shape, itemsize) -> int:
    """VMEM footprint of a [1, ..., W, C] block after (sublane, lane) tiling."""
    *lead, w, c = shape
    sublane = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    w_pad = -(-w // sublane) * sublane
    c_pad = -(-c // 128) * 128
    n = 1
    for d in lead:
        n *= d
    return n * w_pad * c_pad * itemsize


def fits_vmem(x_shape, w_shape, itemsize, padding=(0, 0)) -> bool:
    """Single-image working set (I/O blocks x double buffering + the padded
    scratch and fp32 accumulators) against the VMEM budget; callers fall
    back to XLA beyond it."""
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    kh = int(round(k2 ** 0.5))
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    bufs = (_tiled_bytes((1, hi, wi, c), itemsize)
            + _tiled_bytes((1, heads * kh, ho, wo, (k2 // kh) * cw), itemsize)
            + _tiled_bytes((1, ho, wo, heads * c), itemsize))
    scratch = (_tiled_bytes((1, hp, wp, c), itemsize)      # padded copy
               + 4 * _tiled_bytes((1, hp, wp, c), 4))      # fp32 temps
    return 2 * bufs + scratch <= _VMEM_BUDGET_BYTES


def _tile_lanes(wk, g):
    """Broadcast a [..., Cw] weight tap to the full [..., G*Cw] channel width
    (channel c uses weight channel c % Cw)."""
    return jnp.concatenate([wk] * g, axis=-1) if g > 1 else wk


def _fill_padded(x_ref, xp_ref, ph, pw, hi, wi):
    """memset + center copy: xp[ph:ph+hi, pw:pw+wi] = x (zero borders)."""
    if ph == 0 and pw == 0:
        xp_ref[...] = x_ref[...]
    else:
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, ph:ph + hi, pw:pw + wi, :] = x_ref[...]


def _fwd_kernel(x_ref, wt_ref, out_ref, xp_ref, *, kh, kw, dh, dw, heads, g,
                cw, ho, wo, c, ph, pw, hi, wi):
    """out[ho,wo,head*C+c] = sum_k w[head,k][ho,wo,c%Cw]
                                   * xpad[ho+kh*dh, wo+kw*dw, c]."""
    out_dtype = out_ref.dtype
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    for head in range(heads):
        def row(ikh, acc, head=head):
            wrow = wt_ref[:, pl.ds(head * kh + ikh, 1)].reshape(
                1, ho, wo, kw * cw)
            for ikw in range(kw):
                xs = xp_ref[:, pl.ds(ikh * dh, ho),
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = wrow[:, :, :, ikw * cw:(ikw + 1) * cw].astype(jnp.float32)
                acc = acc + xs * _tile_lanes(wk, g)
            return acc

        acc = jax.lax.fori_loop(
            0, kh, row, jnp.zeros((1, ho, wo, c), jnp.float32))
        out_ref[:, :, :, head * c:(head + 1) * c] = acc.astype(out_dtype)


def _dx_kernel(wt_ref, dy_ref, dx_ref, acc_ref, *, kh, kw, dh, dw, heads, g,
               cw, ho, wo, c, ph, pw, hi, wi):
    """Cotangent w.r.t. the (unpadded) input — the transpose of the forward
    shifted-slice pattern (cf. aggregation_zeropad.py:48-78; the stride/
    bounds branching vanishes on the padded accumulator, and the zero-pad
    VJP is the final center slice)."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)

        def row(ikh, carry, head=head, dys=dys):
            wrow = wt_ref[:, pl.ds(head * kh + ikh, 1)].reshape(
                1, ho, wo, kw * cw)
            for ikw in range(kw):
                wk = wrow[:, :, :, ikw * cw:(ikw + 1) * cw].astype(jnp.float32)
                contrib = _tile_lanes(wk, g) * dys
                cur = acc_ref[:, pl.ds(ikh * dh, ho),
                              ikw * dw:ikw * dw + wo, :]
                acc_ref[:, pl.ds(ikh * dh, ho), ikw * dw:ikw * dw + wo, :] = (
                    cur + contrib)
            return carry

        jax.lax.fori_loop(0, kh, row, 0)
    dx_ref[...] = acc_ref[:, ph:ph + hi, pw:pw + wi, :].astype(dx_ref.dtype)


def _dw_kernel(x_ref, dy_ref, dwt_ref, xp_ref, *, kh, kw, dh, dw, heads, g,
               cw, ho, wo, c, ph, pw, hi, wi):
    """Weight cotangent: dwt[head*kh+ikh, ho, (ikw, cw-flat over wo)] =
    sum_g xpad_tap * dy (the ``cc += weight_channels`` reduction,
    aggregation_zeropad.py:99-103).

    Output layout [1, heads*kh, Ho, Wo, kw*Cw]: the row-tap index lands on an
    untiled dim (dynamic-legal); the tiled dims (Wo, kw*Cw) are written whole
    per row (no in-kernel relayout — Mosaic rejects flattening shape casts).
    The caller reshapes/transposes back to [N, Ho, Wo, heads, K^2, Cw]."""
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    out_dtype = dwt_ref.dtype
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)

        def row(ikh, carry, head=head, dys=dys):
            for ikw in range(kw):
                xs = xp_ref[:, pl.ds(ikh * dh, ho),
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = xs * dys
                acc = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
                dwt_ref[:, pl.ds(head * kh + ikh, 1), :, :,
                        ikw * cw:(ikw + 1) * cw] = (
                    acc.reshape(1, 1, ho, wo, cw).astype(out_dtype))
            return carry

        jax.lax.fori_loop(0, kh, row, 0)


def _geometry(x_shape, w_shape, kernel_size, dilation, padding):
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    kh, kw = kernel_size
    dh, dw = dilation
    ph, pw = padding
    assert k2 == kh * kw and c % cw == 0
    assert ho == hi + 2 * ph - (kh - 1) * dh and \
        wo == wi + 2 * pw - (kw - 1) * dw, (
            f"input {(hi, wi)} pad {padding} inconsistent with output "
            f"{(ho, wo)} for K={kernel_size} dil={dilation}")
    return dict(kh=kh, kw=kw, dh=dh, dw=dw, heads=heads,
                g=c // cw, cw=cw, ho=ho, wo=wo, c=c, ph=ph, pw=pw,
                hi=hi, wi=wi)


def _row_major_weight(w, kh, kw):
    """[N, Ho, Wo, heads, kh*kw, Cw] -> [N, heads*kh, Ho, Wo, kw*Cw]."""
    n, ho, wo, heads, k2, cw = w.shape
    wt = w.reshape(n, ho, wo, heads, kh, kw * cw)
    wt = wt.transpose(0, 3, 4, 1, 2, 5)
    return wt.reshape(n, heads * kh, ho, wo, kw * cw)


def _block(shape):
    ndim = len(shape)
    return pl.BlockSpec((1, *shape[1:]), lambda i: (i,) + (0,) * (ndim - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def agg_core_pallas(x, w, kernel_size, dilation, padding=(0, 0)):
    """Stride-1 local aggregation with fused zero padding.

    x: [N, H, W, C]; w: [N, Ho, Wo, heads, K^2, Cw] -> [N, Ho, Wo, heads*C].
    For reflect padding, pre-pad with jnp.pad and pass padding=(0, 0).
    """
    return _agg_fwd_impl(x, w, kernel_size, dilation, padding)


def _agg_fwd_impl(x, w, kernel_size, dilation, padding):
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    kh, kw = geo["kh"], geo["kw"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    wt = _row_major_weight(w, kh, kw)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, **geo),
        grid=(n,),
        in_specs=[_block(x.shape), _block(wt.shape)],
        out_specs=_block((n, ho, wo, heads * c)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * heads * kh * kw * c,
            bytes_accessed=(x.size + wt.size + n * ho * wo * heads * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(x, wt)
    return out


def _agg_fwd_rule(x, w, kernel_size, dilation, padding):
    return _agg_fwd_impl(x, w, kernel_size, dilation, padding), (x, w)


def _agg_bwd_rule(kernel_size, dilation, padding, res, dy):
    x, w = res
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    kh, kw = geo["kh"], geo["kw"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    wt = _row_major_weight(w, kh, kw)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, **geo),
        grid=(n,),
        in_specs=[_block(wt.shape), _block((n, ho, wo, heads * c))],
        out_specs=_block(x.shape),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32)],
        interpret=_use_interpret(),
    )(wt, dy)

    _, _, _, heads_, k2_, cw_ = w.shape
    dwt = pl.pallas_call(
        functools.partial(_dw_kernel, **geo),
        grid=(n,),
        in_specs=[_block(x.shape), _block((n, ho, wo, heads * c))],
        out_specs=_block((n, heads * kh, ho, wo, kw * cw_)),
        out_shape=jax.ShapeDtypeStruct((n, heads * kh, ho, wo, kw * cw_),
                                       w.dtype),
        scratch_shapes=[pltpu.VMEM((1, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
    )(x, dy)
    dw = dwt.reshape(n, heads_, kh, ho, wo, kw, cw_).transpose(
        0, 3, 4, 1, 2, 5, 6).reshape(n, ho, wo, heads_, k2_, cw_)
    return dx, dw


agg_core_pallas.defvjp(_agg_fwd_rule, _agg_bwd_rule)
