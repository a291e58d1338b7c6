"""Pallas TPU kernels for the local-aggregation core op.

TPU-native replacements for the reference's CUDA kernels
(/root/reference/cupy_layers/aggregation_zeropad.py:20-110).  Design notes:

- **Grid over batch, one image per step.**  Each step holds the padded input
  block, the weight block and the output block in VMEM (CoT feature maps are
  <= ~2 MB); >1 images per block makes Mosaic unroll the batch dim and blow
  up compile time, and one image per step already double-buffers the DMA.
- **Full-lane FMAs.**  The op shares Cw weight channels across G = C/Cw
  channel groups.  Slicing per group would run the VPU at Cw/128 lanes
  (6% at stage 1); instead each weight tap is lane-tiled to the full C width
  once and the multiply-accumulate runs at C lanes.
- **Mosaic-legal loop structure.**  Offsets on the W (sublane) and channel
  (lane) dims must be static; row (H) offsets may be dynamic.  So the kernel
  fori-loops over kernel rows (keeping ONE set of fp32 temporaries live —
  a fully unrolled K^2 loop holds ~9 full-width fp32 temps and exceeds the
  16 MB scoped-VMEM limit) and unrolls the kw column taps.  To make the
  weight tap addressable by row, the caller pre-transposes the weight to
  ``[N, heads*kh, Ho, Wo, kw*Cw]`` (one cheap XLA transpose of the small
  weight tensor).
- fp32 accumulation regardless of I/O dtype.
- The weight gradient uses the XLA formulation (patch einsum): its scatter
  layout doesn't fit Mosaic's static-lane constraint; the XLA version fuses
  well and the weight tensor is the smallest of the three.

Inputs arrive pre-padded (zero or reflect — padding applied by the caller
with jnp.pad); the input-grad kernel produces the cotangent of the *padded*
input and JAX's pad-VJP folds borders back automatically, subsuming the
reference's hand-written reflection fold (aggregation_refpad.py:196-200).

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


def fits_vmem(xp_shape, w_shape, itemsize) -> bool:
    """Single-image working set (I/O blocks x double buffering + the fp32
    accumulators) against the VMEM budget; fall back to XLA beyond it."""
    n, hp, wp, c = xp_shape
    _, ho, wo, heads, k2, cw = w_shape
    kh = int(round(k2 ** 0.5))
    bufs = (_tiled_bytes((1, hp, wp, c), itemsize)
            + _tiled_bytes((1, heads * kh, ho, wo, (k2 // kh) * cw), itemsize)
            + _tiled_bytes((1, ho, wo, heads * c), itemsize))
    # fp32 temps: acc + ~3 live tap operands at full width
    scratch = 4 * _tiled_bytes((1, hp, wp, c), 4)
    return 2 * bufs + scratch <= _VMEM_BUDGET_BYTES


def _tile_lanes(wk, g):
    """Broadcast a [..., Cw] weight tap to the full [..., G*Cw] channel width
    (channel c uses weight channel c % Cw)."""
    return jnp.concatenate([wk] * g, axis=-1) if g > 1 else wk


def _fwd_kernel(xp_ref, wt_ref, out_ref, *, kh, kw, dh, dw, heads, g, cw,
                ho, wo, c):
    """out[ho,wo,head*C+c] = sum_k w[head,k][ho,wo,c%Cw] * xp[ho+kh*dh, wo+kw*dw, c].

    wt_ref: [1, heads*kh, Ho, Wo, kw*Cw] (row-major taps, see module doc)."""
    out_dtype = out_ref.dtype
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


def _dx_kernel(wt_ref, dy_ref, dxp_ref, acc_ref, *, kh, kw, dh, dw, heads, g,
               cw, ho, wo, c):
    """Cotangent w.r.t. the padded input — the exact transpose of the forward
    shifted-slice pattern (cf. aggregation_zeropad.py:48-78; the stride/bounds
    branching vanishes for stride=1 on the padded buffer)."""
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
    dxp_ref[...] = acc_ref[...].astype(dxp_ref.dtype)


def _geometry(xp_shape, w_shape, kernel_size, dilation):
    n, hp, wp, c = xp_shape
    _, ho, wo, heads, k2, cw = w_shape
    kh, kw = kernel_size
    dh, dw = dilation
    assert k2 == kh * kw and c % cw == 0
    assert ho == hp - (kh - 1) * dh and wo == wp - (kw - 1) * dw, (
        f"padded input {(hp, wp)} inconsistent with output {(ho, wo)} for "
        f"K={kernel_size} dil={dilation}")
    return dict(kh=kh, kw=kw, dh=dh, dw=dw, heads=heads,
                g=c // cw, cw=cw, ho=ho, wo=wo, c=c)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def agg_core_pallas(xp, w, kernel_size, dilation):
    """VALID stride-1 local aggregation on a pre-padded NHWC input.

    xp: [N, Hp, Wp, C]; w: [N, Ho, Wo, heads, K^2, Cw] -> [N, Ho, Wo, heads*C].
    """
    return _agg_fwd_impl(xp, w, kernel_size, dilation)


def _agg_fwd_impl(xp, w, kernel_size, dilation):
    geo = _geometry(xp.shape, w.shape, kernel_size, dilation)
    n, hp, wp, c = xp.shape
    ho, wo, heads, cw = geo["ho"], geo["wo"], geo["heads"], geo["cw"]
    kh, kw = geo["kh"], geo["kw"]
    wt = _row_major_weight(w, kh, kw)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, **geo),
        grid=(n,),
        in_specs=[_block(xp.shape), _block(wt.shape)],
        out_specs=_block((n, ho, wo, heads * c)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), xp.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * heads * kh * kw * c,
            bytes_accessed=(xp.size + wt.size + n * ho * wo * heads * c)
            * xp.dtype.itemsize,
            transcendentals=0),
    )(xp, wt)
    return out


def _dw_xla(xp, dy, w_shape, kernel_size, dilation):
    """Weight cotangent via the patch formulation (pure XLA; see module doc).

    dw[n,ho,wo,head,k,cw] = sum_g xp[n,ho+kh*dh,wo+kw*dw,g*Cw+cw]
                                  * dy[n,ho,wo,head*C+g*Cw+cw]
    """
    from jax import lax

    n, ho, wo, heads, k2, cw = w_shape
    kh, kw = kernel_size
    dh, dw_ = dilation
    c = xp.shape[-1]
    g = c // cw
    taps = []
    for ikh in range(kh):
        for ikw in range(kw):
            taps.append(lax.slice(
                xp, (0, ikh * dh, ikw * dw_, 0),
                (n, ikh * dh + ho, ikw * dw_ + wo, c)))
    patches = jnp.stack(taps, axis=3)  # [N, Ho, Wo, K2, C]
    patches = patches.reshape(n, ho, wo, 1, k2, g, cw).astype(jnp.float32)
    dyr = dy.reshape(n, ho, wo, heads, 1, g, cw).astype(jnp.float32)
    return jnp.sum(patches * dyr, axis=5).astype(xp.dtype)  # [N,Ho,Wo,heads,K2,Cw]


def _agg_fwd_rule(xp, w, kernel_size, dilation):
    return _agg_fwd_impl(xp, w, kernel_size, dilation), (xp, w)


def _agg_bwd_rule(kernel_size, dilation, res, dy):
    xp, w = res
    geo = _geometry(xp.shape, w.shape, kernel_size, dilation)
    n, hp, wp, c = xp.shape
    ho, wo, heads, cw = geo["ho"], geo["wo"], geo["heads"], geo["cw"]
    kh, kw = geo["kh"], geo["kw"]
    wt = _row_major_weight(w, kh, kw)

    dxp = pl.pallas_call(
        functools.partial(_dx_kernel, **geo),
        grid=(n,),
        in_specs=[_block(wt.shape), _block((n, ho, wo, heads * c))],
        out_specs=_block(xp.shape),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32)],
        interpret=_use_interpret(),
    )(wt, dy)

    dw = _dw_xla(xp, dy, w.shape, kernel_size, dilation)
    return dxp, dw


agg_core_pallas.defvjp(_agg_fwd_rule, _agg_bwd_rule)
