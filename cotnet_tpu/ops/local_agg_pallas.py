"""Pallas TPU kernels for the local-aggregation core op.

TPU-native replacements for the reference's three CUDA kernels
(/root/reference/cupy_layers/aggregation_zeropad.py:20-110 — forward,
input-backward, weight-backward).  Design:

- Grid over the batch dimension; each grid step owns a ``[Bn, H, W, C]``
  block resident in VMEM (the per-stage CoT feature maps are <= ~2 MB each, so
  a whole image plus its weight tensor fits comfortably; ``Bn`` is raised for
  the small late-stage maps to amortize the pipeline).
- The op is HBM-bandwidth-bound (9 FMAs/output element), so the kernels'
  job is to read ``x`` once, ``w`` once (``K^2/share_planes`` ~= 1.1x ``x``),
  and write the output once — never materializing the ``K^2``-unfolded patch
  tensor the oracle formulation uses.
- The K x K taps are *static* shifted slices of the pre-padded input block;
  the channel-group broadcast (``Cw`` weight channels shared across
  ``G = C/Cw`` groups) becomes per-group lane slices, avoiding any lane
  shuffles.
- Accumulation is fp32 regardless of the I/O dtype (bf16-safe).

Inputs arrive pre-padded (zero or reflect — padding is applied by the caller
with ``jnp.pad``); the input-grad kernel therefore produces the cotangent of
the *padded* input and JAX's pad-VJP folds borders back automatically, which
subsumes the reference's hand-written reflection fold
(aggregation_refpad.py:196-200).

Only stride=1 is implemented (every model in the family aggregates at
stride 1 — stride is handled by avg-pool before the op, cotnet.py:199-202);
``local_agg.local_aggregate`` routes strided cases to the XLA formulation.
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
    """VMEM footprint of a [1, H, W, C] block after (sublane, lane) tiling:
    W rounds to the dtype's sublane count, C to 128 lanes."""
    _, h, w, c = shape
    sublane = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    w_pad = -(-w // sublane) * sublane
    c_pad = -(-c // 128) * 128
    return h * w_pad * c_pad * itemsize


def fits_vmem(xp_shape, w_shape, itemsize) -> bool:
    """Whether one image (+ weight + output + f32 scratch) fits the budget,
    counting tile padding and the pipeline's double buffering.

    The kernels hold one image per grid step: blocks with a >1 leading batch
    dim make Mosaic unroll over it and blow up compile time, and one image per
    step already pipelines DMA fully.  Callers fall back to the XLA
    formulation when this returns False.
    """
    n, hp, wp, c = xp_shape
    _, ho, wo, heads, k2, cw = w_shape
    bufs = (_tiled_bytes((1, hp, wp, c), itemsize)
            + _tiled_bytes((1, ho, wo, heads * k2 * cw), itemsize)
            + _tiled_bytes((1, ho, wo, heads * c), itemsize))
    scratch = _tiled_bytes((1, hp, wp, c), 4)  # dx f32 accumulator
    return 2 * bufs + scratch <= _VMEM_BUDGET_BYTES


def _tile_lanes(wk, g):
    """Broadcast a [., ., Cw] weight tap to the full [., ., G*Cw] channel
    width (channel c uses weight channel c % Cw)."""
    return jnp.concatenate([wk] * g, axis=-1) if g > 1 else wk


def _fwd_kernel(xp_ref, w_ref, out_ref, *, kh, kw, dh, dw, heads, k2, g, cw, ho, wo, c):
    """Weight taps are tiled to full channel width so every FMA runs at C
    lanes instead of Cw (Cw is C/8 in the CoT family — per-group slicing
    wastes 15/16 of the VPU at stage 1).  Taps iterate via fori_loop so
    Mosaic reuses one set of fp32 temporaries instead of keeping all K^2
    unrolled tap buffers live (which blows the 16MB VMEM scoped limit)."""
    out_dtype = out_ref.dtype
    for head in range(heads):
        def tap(k, acc, head=head):
            ikh, ikw = k // kw, k % kw
            xs = xp_ref[:, pl.ds(ikh * dh, ho), pl.ds(ikw * dw, wo),
                        :].astype(jnp.float32)
            wk = w_ref[:, :, :, pl.ds((head * k2 + k) * cw, cw)
                       ].astype(jnp.float32)
            return acc + xs * _tile_lanes(wk, g)

        acc = jax.lax.fori_loop(
            0, k2, tap, jnp.zeros((1, ho, wo, c), jnp.float32))
        out_ref[:, :, :, head * c:(head + 1) * c] = acc.astype(out_dtype)


def _dx_kernel(w_ref, dy_ref, dxp_ref, acc_ref, *, kh, kw, dh, dw, heads, k2, g,
               cw, ho, wo, c):
    """Cotangent w.r.t. the padded input.

    dxp[hi, wi, c] = sum over (head, k) of w[ho, k, c%Cw] * dy[ho, head*C+c]
    at ho = hi - k*dil (the transpose of the forward shifted-slice pattern:
    mirrors aggregation_zeropad.py:48-78 without the stride/bounds branching,
    which vanishes for stride=1 on the padded buffer).
    """
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for head in range(heads):
        def tap(k, _, head=head):
            ikh, ikw = k // kw, k % kw
            dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
            wk = w_ref[:, :, :, pl.ds((head * k2 + k) * cw, cw)
                       ].astype(jnp.float32)
            cur = acc_ref[:, pl.ds(ikh * dh, ho), pl.ds(ikw * dw, wo), :]
            acc_ref[:, pl.ds(ikh * dh, ho), pl.ds(ikw * dw, wo), :] = (
                cur + _tile_lanes(wk, g) * dys)
            return 0

        jax.lax.fori_loop(0, k2, tap, 0)
    dxp_ref[...] = acc_ref[...].astype(dxp_ref.dtype)


def _dw_kernel(xp_ref, dy_ref, dw_ref, *, kh, kw, dh, dw, heads, k2, g, cw, ho,
               wo, c):
    """Cotangent w.r.t. the weight: group-summed patch x cotangent products
    (mirrors the ``cc += weight_channels`` reduction,
    aggregation_zeropad.py:99-103)."""
    out_dtype = dw_ref.dtype
    for head in range(heads):
        def tap(k, _, head=head):
            ikh, ikw = k // kw, k % kw
            dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
            xs = xp_ref[:, pl.ds(ikh * dh, ho), pl.ds(ikw * dw, wo),
                        :].astype(jnp.float32)
            t = xs * dys  # full-width product, then group-sum on lanes
            acc = t[:, :, :, 0:cw]
            for gi in range(1, g):
                acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
            dw_ref[:, :, :, pl.ds((head * k2 + k) * cw, cw)] = (
                acc.astype(out_dtype))
            return 0

        jax.lax.fori_loop(0, k2, tap, 0)


def _geometry(xp_shape, w_shape, kernel_size, dilation):
    n, hp, wp, c = xp_shape
    _, ho, wo, heads, k2, cw = w_shape
    kh, kw = kernel_size
    dh, dw = dilation
    assert k2 == kh * kw and c % cw == 0
    assert ho == hp - (kh - 1) * dh and wo == wp - (kw - 1) * dw, (
        f"padded input {(hp, wp)} inconsistent with output {(ho, wo)} for "
        f"K={kernel_size} dil={dilation}")
    return dict(kh=kh, kw=kw, dh=dh, dw=dw, heads=heads, k2=k2,
                g=c // cw, cw=cw, ho=ho, wo=wo, c=c)


def _block_spec(bn, *dims):
    return pl.BlockSpec((bn, *dims), lambda i: (i, 0, 0, 0),
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
    ho, wo, heads, k2, cw = geo["ho"], geo["wo"], geo["heads"], geo["k2"], geo["cw"]
    wf = w.reshape(n, ho, wo, heads * k2 * cw)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, **geo),
        grid=(n,),
        in_specs=[_block_spec(1, hp, wp, c),
                  _block_spec(1, ho, wo, heads * k2 * cw)],
        out_specs=_block_spec(1, ho, wo, heads * c),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), xp.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * heads * k2 * c,
            bytes_accessed=(n * hp * wp * c + n * ho * wo * heads * k2 * cw
                            + n * ho * wo * heads * c) * xp.dtype.itemsize,
            transcendentals=0),
    )(xp, wf)
    return out


def _agg_fwd_rule(xp, w, kernel_size, dilation):
    return _agg_fwd_impl(xp, w, kernel_size, dilation), (xp, w)


def _agg_bwd_rule(kernel_size, dilation, res, dy):
    xp, w = res
    geo = _geometry(xp.shape, w.shape, kernel_size, dilation)
    n, hp, wp, c = xp.shape
    ho, wo, heads, k2, cw = geo["ho"], geo["wo"], geo["heads"], geo["k2"], geo["cw"]
    wf = w.reshape(n, ho, wo, heads * k2 * cw)
    interpret = _use_interpret()

    dxp = pl.pallas_call(
        functools.partial(_dx_kernel, **geo),
        grid=(n,),
        in_specs=[_block_spec(1, ho, wo, heads * k2 * cw),
                  _block_spec(1, ho, wo, heads * c)],
        out_specs=_block_spec(1, hp, wp, c),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), xp.dtype),
        scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32)],
        interpret=interpret,
    )(wf, dy)

    dwf = pl.pallas_call(
        functools.partial(_dw_kernel, **geo),
        grid=(n,),
        in_specs=[_block_spec(1, hp, wp, c),
                  _block_spec(1, ho, wo, heads * c)],
        out_specs=_block_spec(1, ho, wo, heads * k2 * cw),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * k2 * cw), w.dtype),
        interpret=interpret,
    )(xp, dy)
    return dxp, dwf.reshape(w.shape)


agg_core_pallas.defvjp(_agg_fwd_rule, _agg_bwd_rule)
