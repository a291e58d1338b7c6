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
- **Native weight layout, zero relayout traffic.**  The weight tensor is
  consumed exactly as the model's embed conv produces it — k-major flat
  channels ``[N, Ho, Wo, heads*K^2*Cw]`` (a trailing-dims reshape of the
  public ``[N, Ho, Wo, heads, K^2, Cw]``, which XLA treats as a bitcast).
  Every tap is a *static* lane slice at ``(head*K^2 + k) * Cw``; the K^2 tap
  loop is fully unrolled so no dynamic index ever lands on a tiled dim.  An
  earlier revision fori-looped over kernel rows and pre-transposed the weight
  to ``[N, heads*kh, Ho, Wo, kw*Cw]`` to keep the dynamic row index on an
  untiled dim — that transpose cost 2x HBM traffic on the largest tensor
  (the weight is K^2/G the size of the image) and was ~35%% of the op's
  runtime at batch 128.
- fp32 accumulation regardless of I/O dtype (single accumulator chain keeps
  one pair of fp32 temporaries live; VMEM stays well under the scoped limit).
- All three kernels (forward, input-grad, weight-grad) are Pallas; the
  weight-grad writes straight into the same flat k-major layout, so the
  backward pass needs no relayout either.

- **Spatial strip tiling with halo for large maps (off by default).**
  Whole-image blocks cap the kernel at stage-2 sizes (56x56x64 needs ~30 MB
  of scoped VMEM).  For those shapes fwd/dw strip kernels exist: outputs and
  weights blocked into ``S``-row strips while the input image stays
  VMEM-resident as a zero-padded f32 scratch filled once per image, each tap
  a dynamic H-offset slice (the K//2 halo is slice overlap, no extra HBM
  traffic — SURVEY §7's halo prescription); dx uses the XLA transpose.
  MEASURED on v5e they lose to XLA at every shape they would cover (see the
  STRIP_DISPATCH note below), so dispatch prefers XLA there; the kernels
  stay tested for future tuning.

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
# the strip kernels' estimate has fewer unknowns (temps are strip-sized), so
# they may book closer to the 16 MB scoped limit
_STRIP_BUDGET_BYTES = 12 * 1024 * 1024


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


def _working_set(x_shape, w_shape, itemsize, padding, m,
                 affine=False, affine_dw=False) -> int:
    """VMEM bytes for an m-image block: I/O blocks x double buffering + the
    padded scratch and fp32 accumulators.

    The live fp32 temp count scales with the tap count: Mosaic keeps several
    of the SSA chain's tap temporaries in flight, and the K=7 SAN shape
    (32x32x64, k2=49) measured 17.03 MB scoped VMEM where a flat 4-temp
    model predicted ~10 MB.  ``3 + k2 // 4`` reproduces both the measured
    K=3 fits (cotnet stage 2-4 stay on Pallas) and the K=7 overflow.

    ``affine`` adds the fused-GroupNorm forward's extras — just the
    [m,1,1,F] f32 scale/bias blocks.  ``affine_dw`` models the affine dw
    kernel instead, which additionally reads the raw weight alongside dy
    and keeps an f32 tap product live; fwd and bwd pick their m
    independently (the dw extras must not shrink the forward's packing —
    that cost ~0.25 ms at stage 4 when both shared one plan)."""
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    f = heads * k2 * cw
    bufs = (_tiled_bytes((m, hi, wi, c), itemsize)
            + _tiled_bytes((m, ho, wo, f), itemsize)
            + _tiled_bytes((m, ho, wo, heads * c), itemsize))
    if affine or affine_dw:
        bufs += 2 * _tiled_bytes((m, 1, 1, f), 4)
    if affine_dw:
        bufs += _tiled_bytes((m, ho, wo, f), itemsize)
    live_temps = 3 + k2 // 4
    scratch = (_tiled_bytes((m, hp, wp, c), itemsize)      # padded copy
               + live_temps * _tiled_bytes((m, hp, wp, c), 4))
    if affine_dw:
        scratch += _tiled_bytes((m, ho, wo, f), 4)
    return 2 * bufs + scratch


def _dx_gather_working_set(x_shape, w_shape, itemsize, padding, m) -> int:
    """VMEM bytes for the gather-form dx kernel: w/dy input blocks + dx out
    (double-buffered), the two zero-padded scratch copies, and the SSA
    chain's live f32 tap temporaries (unpadded, output-sized)."""
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    kspan_h = hi + 2 * padding[0] - ho  # (kh-1)*dh
    kspan_w = wi + 2 * padding[1] - wo
    lh = kspan_h - padding[0]
    lw = kspan_w - padding[1]
    f = heads * k2 * cw
    bufs = (_tiled_bytes((m, ho, wo, f), itemsize)
            + _tiled_bytes((m, ho, wo, heads * c), itemsize)
            + _tiled_bytes((m, hi, wi, c), itemsize))
    live_temps = 3 + k2 // 4
    scratch = (_tiled_bytes((m, ho + 2 * lh, wo + 2 * lw, f), itemsize)
               + _tiled_bytes((m, ho + 2 * lh, wo + 2 * lw, heads * c),
                              itemsize)
               + live_temps * _tiled_bytes((m, hi, wi, c), 4))
    return 2 * bufs + scratch


def fits_vmem(x_shape, w_shape, itemsize, padding=(0, 0),
              affine=False) -> bool:
    """Single-image working set against the VMEM budget; callers fall back
    to XLA beyond it.  For the affine path this also requires the dw
    kernel's larger working set to fit at m=1 (the plan flavor must serve
    fwd AND bwd)."""
    if _working_set(x_shape, w_shape, itemsize, padding, 1,
                    affine) > _VMEM_BUDGET_BYTES:
        return False
    if affine and _working_set(x_shape, w_shape, itemsize, padding, 1,
                               affine_dw=True) > _VMEM_BUDGET_BYTES:
        return False
    return True


def _pick_batch_block(x_shape, w_shape, itemsize, padding,
                      affine=False, affine_dw=False) -> int:
    """Images per grid step.  Tiny late-stage maps (7x7) are latency-bound
    at one image per step — DMA and per-step overhead dwarf the compute —
    so pack several images per block there (divisor of N, VMEM-bounded; ops
    in the kernel are written whole-block, so a bigger leading dim is pure
    vectorization, not unrolling).  Measured on v5e @ bs128 bf16: 7x7x512
    fwd 1.79ms -> 0.98ms at m=4, while 14x14 and up regress past m=1
    (larger blocks coarsen the double-buffer overlap), hence the ho*wo
    <= 64 gate."""
    n, hi, wi, _ = x_shape
    if hi * wi > M_PACK_MAX_MAP:
        return 1
    if (affine or affine_dw) and hi * wi > 64:
        # the affine (GN-fold) kernels book ~2x the modeled working set on
        # big maps (measured: 19.8 MB scoped at 28x28x128 m=2 vs the 16 MB
        # limit, r4) — keep the eval fold at m=1 there; plain fwd and the
        # fused bwd pair pack independently
        return 1
    m = 1
    for cand in (2, 4, 8, 16):
        if n % cand != 0:
            break
        if _working_set(x_shape, w_shape, itemsize, padding,
                        cand, affine, affine_dw) > _VMEM_BUDGET_BYTES:
            break
        m = cand
    return m


def _strip_working_set(x_shape, w_shape, itemsize, padding, s) -> dict:
    """VMEM bytes per strip-kernel flavor for strip size ``s``."""
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    f = heads * k2 * cw
    live = min(3 + k2 // 4, 6)  # grouped accumulation caps live taps
    # sub-f32 inputs are up-converted ONCE per strip (padded scratch is
    # f32; the weight strip converts in one temp), so per-tap temps are
    # dtype-independent; the one-shot conversions are accounted below
    conv_extra = (0 if itemsize == 4 else
                  _tiled_bytes((1, s, wo, f), 4))
    # halo'd tensors ride as whole-image VMEM blocks (a sub-lane-width DMA
    # from HBM is not Mosaic-expressible: lane slices must align to 128) and
    # are copied once per image into zero-padded resident scratches
    x_full = _tiled_bytes((1, hi, wi, c), itemsize)
    w_strip = _tiled_bytes((1, s, wo, f), itemsize)
    out_strip = _tiled_bytes((1, s, wo, heads * c), itemsize)
    t_strip = _tiled_bytes((1, s, wo, c), 4)
    fwd = (2 * (x_full + w_strip + out_strip)
           + _tiled_bytes((1, hp, wp, c), 4) + conv_extra + live * t_strip)
    # dx is NOT a strip kernel: its gather form needs full-res dy/w resident
    # (measured 22.6 MB scoped at 56x56x64) — the bwd rule computes dx with
    # the XLA transpose instead (fuses well; stage-1 dx was on XLA before
    # strips existed too)
    dw = (2 * (x_full + out_strip + w_strip)
          + _tiled_bytes((1, hp, wp, c), 4) + conv_extra + live * t_strip)
    return dict(fwd=fwd, dw=dw)


# Strip dispatch is OFF by default: measured on v5e bf16 bs128 at the one
# stage the whole-image kernels can't hold (56x56x64 K3), XLA wins — fwd
# 2.81 ms vs strips 3.04 (S=28, grouped accumulation; S=14 was 3.11), bwd
# 6.36 vs 7.75 — and the K=7 SAN shape's 49-tap unroll blows Mosaic compile
# time past 9 minutes.  The kernels stay (tested in interpret mode) for
# future tuning; flip on via COTNET_AGG_STRIPS=1 or this module flag.
import os as _os

STRIP_DISPATCH = _os.environ.get("COTNET_AGG_STRIPS", "0") == "1"

# Whole-image grouped-accumulation kernels for the stage-1 shape: the strip
# kernels' inner structure (taps accumulated in GROUP-sized SSA chains with a
# scratch RMW between groups, capping live fp32 temporaries) but one grid
# step per image — no strip-boundary DMA granularity, no per-strip weight
# conversion, no halo overlap reads.  MEASURED on v5e bf16 bs128 at
# 56x56x64 K3: fwd 4.33 ms / bwd 9.02 ms vs XLA's 2.81 / 6.37 — worse than
# the strips (3.04 / 7.75): with only 4 chains over the full image the
# scratch read-modify-write between chains dominates, consistent with the
# SSA-chain note in _fwd_kernel (a full RMW accumulator measured ~2x
# slower).  Third data point confirming XLA's fusion wins at stage 1;
# stays available for future tuning via COTNET_AGG_WLOOP=1.
WLOOP_DISPATCH = _os.environ.get("COTNET_AGG_WLOOP", "0") == "1"

# Gather-form dx kernel (SSA chain over shifted dy/w slices) instead of the
# scatter-form in-place accumulator — see _dx_gather_kernel.  Default by
# measurement (tools/dx_bench.py, v5e bf16 bs128).
DX_GATHER = _os.environ.get("COTNET_DX_GATHER", "1") == "1"
# Output-map size (ho*wo) above which the gather dx / dot-form dw win over
# the scatter/slice-loop incumbents (measured crossover between 14x14 and
# 28x28; tests lower it to force the big-map kernels on small shapes).
DX_BIG_MAP_MIN = int(_os.environ.get("COTNET_DX_BIG_MAP_MIN", "400"))
# Largest ho*wo eligible for multi-image block packing (m > 1).  The r2
# heuristic pinned this at 64 (7-10px maps only) from microbenches that —
# r4 finding — carried a ~30 ms fixed relay cost per dispatch, biasing
# per-iter times by ~1.5 ms and hiding m-packing's relative wins on bigger
# maps.  The r4 m-pack probe (tools/m_pack_bench.py, 28x28x128 bs128 bf16,
# bias cancels within an A/B): m=2 fwd 2.065->1.886 ms, dw_dot
# 2.454->2.283, dx_gather 2.062->2.033; m=4 exceeds scoped VMEM.
# End-to-end r4 verdict: DEFAULT STAYS 64 — at 14x14 (=196, m=4) the full
# train step is a wash (105.99 vs 106.36 ms same-day baseline) and infer
# regresses (28.35 vs 27.62); at 28x28 (=784, m=2) the in-model fwd kernel
# books 17.41 MB scoped VMEM > 16 MB (Mosaic keeps ~2x the modeled set
# live when operands are fusion outputs, unlike the standalone probe) and
# compilation fails.  The isolated win does not survive the step.
M_PACK_MAX_MAP = int(_os.environ.get("COTNET_M_MAX_MAP", "64"))

# A/B gate: cw->c lane replication as an MXU matmul instead of a lane-space
# concatenate (see _tile_lanes).  Off by default pending on-chip measurement.
TILE_DOT = _os.environ.get("COTNET_TILE_DOT", "0") == "1"
# Single-launch fused dx+dw backward (VERDICT r3 #1's named untried lever):
# one kernel computes BOTH cotangents, so dy is DMA'd from HBM once and the
# pair shares one grid step per image (see _dxdw_gather_kernel).  ON by
# isolated chained measurement (tools/bwd_pair_bench.py, bs128 bf16):
# gather form beats the two-launch dispatch at every cotnet stage —
# 28x28x128 3.280->3.053 ms, 14x14x256 1.814->1.800, 7x7x512 1.378->1.309
# (floors 1.06/0.53/0.27; the end-to-end train A/B is a wash at the
# platform's ~10% process-to-process drift, so the low-noise isolated
# numbers decide).  TPU grad parity vs XLA autodiff: relerr <= 8e-7 f32.
FUSED_BWD = _os.environ.get("COTNET_FUSED_BWD", "1") == "1"
# CHWN (batch-on-lanes) kernels: transpose the op to [G, Cw, H, W, N] so the
# BATCH fills the 128-lane dim and the group structure lands on MAJOR dims —
# the cw->c replication becomes block indexing and the c->cw reduction an SSA
# chain over g, deleting every lane-space shuffle that bound the NHWC kernels
# at 10-16% of byte bound (r4 roofline table).  Boundary transposes are XLA's
# (tiled, ~2x bytes on each tensor) and are included in all measurements.
# See chwn_plan for eligibility; tools/chwn_bench.py for the shootout.
CHWN_DISPATCH = _os.environ.get("COTNET_CHWN", "1") == "1"
# CHWN-resident WEIGHTS in the CoT block (agg_core_pallas_wt): embed_conv2
# emits [Cw, K2, H, W, N] directly (channel-major matmul + CHWN GroupNorm)
# and dw returns in the same layout, deleting the w/dw boundary transposes
# — the largest tensors crossing the layout boundary.  r5 on-chip A/B
# (tools/train_ab_bench.py, cotnet50 bs128 bf16): MEASURED OFF — train
# 92.66 -> 93.17 ms/step.  The r5 trace explains why: XLA fuses the
# in-graph boundary transposes into adjacent fusions (~3.1 ms/step of
# data-formatting TOTAL), so deleting the w transpose only trades it for
# the half-width activation transpose + a separately-scheduled matmul.
# Kept gated + parity-tested (tests/test_local_agg.py) as the documented
# alternative formulation.
CHWN_W = _os.environ.get("COTNET_CHWN_W", "0") == "1"
# tests lift the N-fills-lanes gate to exercise the kernels at toy sizes
CHWN_ANY_N = _os.environ.get("COTNET_CHWN_ANY_N", "0") == "1"
# smallest output map (ho*wo) where CHWN wins (isolated chained A/B,
# tools/chwn_bench.py, v5e bf16 bs128 — artifact cancels at equal iters):
# 28x28x128 fwd 2.017->1.695 bwd 3.821->2.077, 14x14x256 fwd 1.860->1.487
# bwd 1.861->1.693, but 7x7x512 LOSES (0.93x/0.92x: W=7 pads to 16
# sublanes and the boundary transposes outweigh the lane win), so the
# late-stage maps stay on the NHWC kernels.  r5 measured the previously
# untested flagship cells (N=128): 20x20x256 fwd 1.26x bwd 1.02x,
# 16x16x256 fwd 1.02x bwd 1.16x, and the @320 stage-4 10x10x512 map
# fwd 1.12x bwd 1.00x — so the floor drops to 100 (10x10 in, 7x7 out;
# 7x7 = map 49 stays excluded by measurement).
# N=64 forms (flagship @320 trains bs64): measured OFF and NOT shipped —
# plain CHWN with half-filled lanes loses everywhere (fwd 0.85-0.92x,
# bwd 0.93-0.95x); the packed two-groups-per-lane form (tools/
# chwn_bench.py fwd_chwn_packed) wins only 10x10 fwd (1.22x) and loses
# its bwd (0.83x) — a wash per block-pass, so bs64 stays NHWC.
CHWN_MIN_MAP = int(_os.environ.get("COTNET_CHWN_MIN_MAP", "100"))
# the stage-1 CHWN H-strip BACKWARD (in-kernel g reduction, 1.74x over
# the XLA gather-VJP isolated — see chwn_strip_bwd_plan); separate gate
# from the forward strips so the two can be A/B'd independently at HEAD
CHWN_STRIP_BWD = _os.environ.get("COTNET_CHWN_STRIP_BWD", "1") == "1"
_WLOOP_GROUP = 2
_WLOOP_BUDGET_BYTES = 16 * 1024 * 1024


def _wloop_working_set(x_shape, w_shape, itemsize, padding) -> int:
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    f = heads * k2 * cw
    bufs = (_tiled_bytes((1, hi, wi, c), itemsize)
            + _tiled_bytes((1, ho, wo, f), itemsize)
            + _tiled_bytes((1, ho, wo, heads * c), itemsize))
    live = _WLOOP_GROUP + 2   # group taps + partial + broadcast temp
    scratch = (_tiled_bytes((1, hp, wp, c), 4)            # f32 padded copy
               + _tiled_bytes((1, ho, wo, c), 4)          # accumulator
               + live * _tiled_bytes((1, ho, wo, c), 4))
    return 2 * bufs + scratch


def strip_plan(x_shape, w_shape, itemsize, padding=(0, 0)):
    """Pick a strip size S for the halo-tiled kernels, or None.

    Valid when the gather-form dx stays in range (2*pad >= dilated span,
    true for all SAME-style geometries) and all three kernels' working sets
    fit; prefers the largest strip (fewest grid steps)."""
    if not STRIP_DISPATCH:
        return None
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    # geometry gates: dx gather form + strips must tile both ho and hi
    if ho != hi or wo != wi:
        return None
    for s in (28, 16, 14, 8, 7, 4):
        if ho % s or s >= ho:
            continue
        ws = _strip_working_set(x_shape, w_shape, itemsize, padding, s)
        if max(ws.values()) <= _STRIP_BUDGET_BYTES:
            return s
    return None


def pallas_plan(x_shape, w_shape, itemsize, padding=(0, 0), affine=False):
    """('whole', m) | ('wloop', group) | ('strip', S) | None — which kernel
    flavor handles the shape within the VMEM budget."""
    if fits_vmem(x_shape, w_shape, itemsize, padding, affine):
        return ("whole", _pick_batch_block(x_shape, w_shape, itemsize,
                                           padding, affine))
    n, hi, wi, c = x_shape
    _, ho, wo, _, _, _ = w_shape
    if (WLOOP_DISPATCH and ho == hi and wo == wi
            and _wloop_working_set(x_shape, w_shape, itemsize, padding)
            <= _WLOOP_BUDGET_BYTES):
        return ("wloop", _WLOOP_GROUP)
    # strip kernels need ho==hi (then 2*pad == dilated span, which also
    # makes the dx gather form's padded indices provably in range)
    s = strip_plan(x_shape, w_shape, itemsize, padding)
    return ("strip", s) if s else None


def _tile_lanes(wk, g):
    """Broadcast a [..., Cw] weight tap to the full [..., G*Cw] channel width
    (channel c uses weight channel c % Cw).

    Two forms, dispatched by COTNET_TILE_DOT (A/B gate, default off):
    concatenate replicates 16-lane registers in lane space on the VPU; the
    dot form rides the same observation that fixed _dw_kernel_dot (the
    mirror-image group reduction, 3.50->2.43ms at 28x28): sub-lane-width
    shuffles serialize, so move the replication to the MXU as
    ``wk @ E`` with E[j, i] = (i % Cw == j) — an exact 0/1 expansion."""
    if g == 1:
        return wk
    if TILE_DOT:
        cw = wk.shape[-1]
        c = cw * g
        ii = jax.lax.broadcasted_iota(jnp.int32, (cw, c), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (cw, c), 1)
        e = (jj % cw == ii).astype(wk.dtype)
        flat = wk.reshape(-1, cw)
        out = jnp.dot(flat, e, preferred_element_type=wk.dtype)
        return out.reshape(*wk.shape[:-1], c)
    return jnp.concatenate([wk] * g, axis=-1)


def _tap_weight(w_ref, s_ref, b_ref, k, cw):
    """Tap k of the flat k-major weight as f32, with the GroupNorm affine
    ``w*s + b`` folded in when s/b refs are present (the fused-normalize
    path: the normalized weight tensor never exists in HBM)."""
    wk = w_ref[:, :, :, k * cw:(k + 1) * cw].astype(jnp.float32)
    if s_ref is not None:
        sk = s_ref[:, :, :, k * cw:(k + 1) * cw]
        bk = b_ref[:, :, :, k * cw:(k + 1) * cw]
        wk = wk * sk + bk
    return wk


def _fill_padded(x_ref, xp_ref, ph, pw, hi, wi):
    """memset + center copy: xp[ph:ph+hi, pw:pw+wi] = x (zero borders)."""
    if ph == 0 and pw == 0:
        xp_ref[...] = x_ref[...]
    else:
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, ph:ph + hi, pw:pw + wi, :] = x_ref[...]


def _fwd_body(x_ref, w_ref, s_ref, b_ref, out_ref, xp_ref, *, kh, kw, dh, dw,
              heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """out[ho,wo,head*C+c] = sum_k wn[ho,wo,(head*K^2+k)*Cw + c%Cw]
                                   * xpad[ho+kh*dh, wo+kw*dw, c]
    with ``wn = w*s + b`` when the affine refs are present.

    SSA accumulator chain on purpose: an in-place fp32 scratch accumulator
    halves VMEM pressure but measured 2x slower (the per-tap scratch
    read-modify-write serializes; 56x56x64 fwd 5.6ms vs 2.9ms).  The chain
    keeps several fp32 tap temporaries live, which caps the kernel at
    stage-2 sizes — stage 1 (56x56) deliberately falls back to XLA (which
    matches the kernel's throughput there anyway; scoped-VMEM need was
    measured at 30.6 MB vs the 16 MB limit)."""
    out_dtype = out_ref.dtype
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    for head in range(heads):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = _tap_weight(w_ref, s_ref, b_ref, k, cw)
                tap = xs * _tile_lanes(wk, g)
                acc = tap if acc is None else acc + tap
        out_ref[:, :, :, head * c:(head + 1) * c] = acc.astype(out_dtype)


def _fwd_kernel(x_ref, w_ref, out_ref, xp_ref, **geo):
    _fwd_body(x_ref, w_ref, None, None, out_ref, xp_ref, **geo)


def _fwd_kernel_affine(x_ref, w_ref, s_ref, b_ref, out_ref, xp_ref, **geo):
    _fwd_body(x_ref, w_ref, s_ref, b_ref, out_ref, xp_ref, **geo)


def _dx_body(w_ref, s_ref, b_ref, dy_ref, dx_ref, acc_ref, *, kh, kw, dh, dw,
             heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Cotangent w.r.t. the (unpadded) input — the transpose of the forward
    shifted-slice pattern (cf. aggregation_zeropad.py:48-78; the stride/
    bounds branching vanishes on the padded accumulator, and the zero-pad
    VJP is the final center slice).  The GroupNorm affine folds in the same
    way as forward: dx aggregates with the *normalized* weight."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                wk = _tap_weight(w_ref, s_ref, b_ref, k, cw)
                contrib = _tile_lanes(wk, g) * dys
                cur = acc_ref[:, ikh * dh:ikh * dh + ho,
                              ikw * dw:ikw * dw + wo, :]
                acc_ref[:, ikh * dh:ikh * dh + ho,
                        ikw * dw:ikw * dw + wo, :] = cur + contrib
    dx_ref[...] = acc_ref[:, ph:ph + hi, pw:pw + wi, :].astype(dx_ref.dtype)


def _dx_kernel(w_ref, dy_ref, dx_ref, acc_ref, **geo):
    _dx_body(w_ref, None, None, dy_ref, dx_ref, acc_ref, **geo)


def _dx_gather_kernel(w_ref, dy_ref, dx_ref, wp_ref, dyp_ref, *, kh, kw, dh,
                      dw, heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Gather-form input cotangent: every tap is a static shifted slice of
    the zero-padded dy/w VMEM scratches multiplied at the producing output
    position, accumulated on an SSA chain —
      dx[i,j,:] = sum_{head,k} dyp[i+(K-1)d-kh*d, ...] * wp[same, tap k]
    (the transpose of the forward's shifted-slice reads).  This mirrors the
    forward body's structure; the scatter-style ``_dx_body`` accumulates
    in-place into an f32 scratch, and that read-modify-write serialization
    was measured ~2x slower than an SSA chain in the forward (see the
    _fwd_body note) — the same penalty shows in the backward trace (stage-2
    dx+dw ~2.3x their HBM floor)."""
    lh, lw = (kh - 1) * dh - ph, (kw - 1) * dw - pw
    _fill_padded(dy_ref, dyp_ref, lh, lw, ho, wo)
    _fill_padded(w_ref, wp_ref, lh, lw, ho, wo)
    acc = None
    for head in range(heads):
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                sh = (kh - 1) * dh - ikh * dh
                sw = (kw - 1) * dw - ikw * dw
                dys = dyp_ref[:, sh:sh + hi, sw:sw + wi,
                              head * c:(head + 1) * c].astype(jnp.float32)
                wk = wp_ref[:, sh:sh + hi, sw:sw + wi,
                            k * cw:(k + 1) * cw].astype(jnp.float32)
                tap = dys * _tile_lanes(wk, g)
                acc = tap if acc is None else acc + tap
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _dx_kernel_affine(w_ref, s_ref, b_ref, dy_ref, dx_ref, acc_ref, **geo):
    _dx_body(w_ref, s_ref, b_ref, dy_ref, dx_ref, acc_ref, **geo)


def _dw_kernel(x_ref, dy_ref, dw_ref, xp_ref, *, kh, kw, dh, dw, heads, g,
               cw, ho, wo, c, ph, pw, hi, wi):
    """Weight cotangent, written straight into the flat k-major layout:
    dw[ho, wo, (head*K^2+k)*Cw + cw] = sum_g xpad_tap * dy (the
    ``cc += weight_channels`` reduction, aggregation_zeropad.py:99-103).
    Every write is a static lane slice — no relayout on either side."""
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    out_dtype = dw_ref.dtype
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = xs * dys
                acc = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
                dw_ref[:, :, :, k * cw:(k + 1) * cw] = acc.astype(out_dtype)


def _group_sum_matrix(c, cw):
    """[C, Cw] 0/1 matrix with M[i, j] = (i % Cw == j): ``t @ M`` sums the
    G = C/Cw channel groups.  The slice-loop form (``t[..., gi*cw:]`` sums)
    reduces across 16-lane chunks in lane space — sub-lane-width shuffles the
    VPU serializes; as a matmul the reduction rides the MXU instead."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (c, cw), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (c, cw), 1)
    return (ii % cw == jj).astype(jnp.float32)


def _dw_kernel_dot(x_ref, dy_ref, dw_ref, xp_ref, *, kh, kw, dh, dw, heads,
                   g, cw, ho, wo, c, ph, pw, hi, wi):
    """dw with the per-tap group reduction as an MXU matmul (see
    _group_sum_matrix) instead of the G-slice SSA loop — the slice loop made
    dw the slowest backward kernel (isolated 3.50ms at 28x28x128 vs the dx
    kernels' ~2.4ms and a ~0.6ms HBM floor, tools/dx_bench.py)."""
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    out_dtype = dw_ref.dtype
    m = x_ref.shape[0]
    gm = _group_sum_matrix(c, cw)
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = (xs * dys).reshape(m * ho * wo, c)
                acc = jnp.dot(t, gm, preferred_element_type=jnp.float32)
                dw_ref[:, :, :, k * cw:(k + 1) * cw] = acc.reshape(
                    m, ho, wo, cw).astype(out_dtype)


def _dxdw_gather_kernel(x_ref, w_ref, dy_ref, dx_ref, dwf_ref, xp_ref,
                        wp_ref, dyp_ref, *, dw_dot, kh, kw, dh, dw, heads, g,
                        cw, ho, wo, c, ph, pw, hi, wi):
    """Single-launch backward: BOTH cotangents in one kernel (the transpose
    of the fused forward; reference backward pair aggregation_zeropad.py:
    147-186 is likewise one module with two kernels but shares the launch).

    vs the two-kernel dispatch this (a) DMAs dy from HBM once — the pair's
    largest shared input — and (b) runs dx and dw in the same grid step, so
    each image's DMA/compute overlap amortizes over twice the work (the
    per-step latency floor dominates at the small late-stage maps, cf. the
    m-packing note in _pick_batch_block).  dx is the gather form (the
    big-map winner), dw the dot or slice-loop form by ``dw_dot``."""
    lh, lw = (kh - 1) * dh - ph, (kw - 1) * dw - pw
    out_dtype = dx_ref.dtype
    m = x_ref.shape[0]
    _fill_padded(dy_ref, dyp_ref, lh, lw, ho, wo)
    _fill_padded(w_ref, wp_ref, lh, lw, ho, wo)
    # dx: SSA chain over shifted dyp/wp slices
    acc = None
    for head in range(heads):
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                sh = (kh - 1) * dh - ikh * dh
                sw = (kw - 1) * dw - ikw * dw
                dys = dyp_ref[:, sh:sh + hi, sw:sw + wi,
                              head * c:(head + 1) * c].astype(jnp.float32)
                wk = wp_ref[:, sh:sh + hi, sw:sw + wi,
                            k * cw:(k + 1) * cw].astype(jnp.float32)
                tap = dys * _tile_lanes(wk, g)
                acc = tap if acc is None else acc + tap
    dx_ref[...] = acc.astype(out_dtype)
    # dw: per-tap group reduction straight into the flat k-major layout
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    dw_dtype = dwf_ref.dtype
    gm = _group_sum_matrix(c, cw) if dw_dot else None
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = xs * dys
                if dw_dot:
                    flat = t.reshape(m * ho * wo, c)
                    red = jnp.dot(flat, gm,
                                  preferred_element_type=jnp.float32)
                    red = red.reshape(m, ho, wo, cw)
                else:
                    red = t[:, :, :, 0:cw]
                    for gi in range(1, g):
                        red = red + t[:, :, :, gi * cw:(gi + 1) * cw]
                dwf_ref[:, :, :, k * cw:(k + 1) * cw] = red.astype(dw_dtype)


def _dxdw_scatter_kernel(x_ref, w_ref, dy_ref, dx_ref, dwf_ref, xp_ref,
                         acc_ref, *, dw_dot, kh, kw, dh, dw, heads, g, cw,
                         ho, wo, c, ph, pw, hi, wi):
    """Fused backward, scatter-dx form: one loop over (head, tap) computes
    BOTH grads from a single per-head dys load — dx accumulates in-place
    into the f32 padded scratch (the shapes where gather's padded dy/w
    copies don't fit or aren't allowed), dw writes per tap."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    dw_dtype = dwf_ref.dtype
    m = x_ref.shape[0]
    gm = _group_sum_matrix(c, cw) if dw_dot else None
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                wk = _tap_weight(w_ref, None, None, k, cw)
                cur = acc_ref[:, ikh * dh:ikh * dh + ho,
                              ikw * dw:ikw * dw + wo, :]
                acc_ref[:, ikh * dh:ikh * dh + ho,
                        ikw * dw:ikw * dw + wo, :] = (
                    cur + _tile_lanes(wk, g) * dys)
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = xs * dys
                if dw_dot:
                    flat = t.reshape(m * ho * wo, c)
                    red = jnp.dot(flat, gm,
                                  preferred_element_type=jnp.float32)
                    red = red.reshape(m, ho, wo, cw)
                else:
                    red = t[:, :, :, 0:cw]
                    for gi in range(1, g):
                        red = red + t[:, :, :, gi * cw:(gi + 1) * cw]
                dwf_ref[:, :, :, k * cw:(k + 1) * cw] = red.astype(dw_dtype)
    dx_ref[...] = acc_ref[:, ph:ph + hi, pw:pw + wi, :].astype(dx_ref.dtype)


def _dxdw_working_set(x_shape, w_shape, itemsize, padding, m,
                      gather: bool) -> int:
    """VMEM bytes for the fused dx+dw kernel: the union of the pair's I/O
    blocks (x, w, dy in; dx, dw out — dy counted ONCE) plus both kernels'
    scratches and the dx chain's live f32 temporaries."""
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    f = heads * k2 * cw
    bufs = (_tiled_bytes((m, hi, wi, c), itemsize)          # x in
            + _tiled_bytes((m, ho, wo, f), itemsize)        # w in
            + _tiled_bytes((m, ho, wo, heads * c), itemsize)  # dy in (once)
            + _tiled_bytes((m, hi, wi, c), itemsize)        # dx out
            + _tiled_bytes((m, ho, wo, f), itemsize))       # dw out
    live_temps = 3 + k2 // 4
    scratch = (_tiled_bytes((m, hp, wp, c), itemsize)       # xp (dw side)
               + live_temps * _tiled_bytes((m, hi, wi, c), 4))
    if gather:
        kspan_h = hi + 2 * padding[0] - ho
        kspan_w = wi + 2 * padding[1] - wo
        lh = kspan_h - padding[0]
        lw = kspan_w - padding[1]
        scratch += (_tiled_bytes((m, ho + 2 * lh, wo + 2 * lw, f), itemsize)
                    + _tiled_bytes((m, ho + 2 * lh, wo + 2 * lw, heads * c),
                                   itemsize))
    else:
        scratch += _tiled_bytes((m, hp, wp, c), 4)          # f32 dx acc
    return 2 * bufs + scratch


def _dw_kernel_affine(x_ref, dy_ref, w_ref, s_ref, dwf_ref, dsf_ref, dbf_ref,
                      xp_ref, *, kh, kw, dh, dw, heads, g, cw, ho, wo, c,
                      ph, pw, hi, wi):
    """Weight-side cotangents of the affine-folded op in one pass.

    With ``wn = w*s + b`` the cotangent w.r.t. the normalized weight is
    ``gn[k] = sum_g xpad_tap * dy`` (the plain dw kernel's output); the
    three partials this kernel writes are then
      dw = gn * s            (straight into the flat k-major layout)
      ds = sum_{h,w} gn * w  -> [N, 1, 1, F]
      db = sum_{h,w} gn      -> [N, 1, 1, F]
    so the full-size ``gn`` tensor never reaches HBM — the unfused path
    would write it, then re-read it (and w) in the GroupNorm backward."""
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    out_dtype = dwf_ref.dtype
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                t = xs * dys
                gn = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    gn = gn + t[:, :, :, gi * cw:(gi + 1) * cw]
                sk = s_ref[:, :, :, k * cw:(k + 1) * cw]
                wk = w_ref[:, :, :, k * cw:(k + 1) * cw].astype(jnp.float32)
                dwf_ref[:, :, :, k * cw:(k + 1) * cw] = (
                    (gn * sk).astype(out_dtype))
                dsf_ref[:, :, :, k * cw:(k + 1) * cw] = jnp.sum(
                    gn * wk, axis=(1, 2), keepdims=True)
                dbf_ref[:, :, :, k * cw:(k + 1) * cw] = jnp.sum(
                    gn, axis=(1, 2), keepdims=True)


def _fwd_wloop_kernel(x_ref, w_ref, out_ref, xp_ref, acc_ref, *, group, kh,
                      kw, dh, dw, heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Whole-image grouped-accumulation forward for the one map too big for
    the SSA-chain kernel (stage 1, 56x56): taps run in ``group``-sized SSA
    chains with a scratch read-modify-write between chains, so peak live
    fp32 temporaries ~= group instead of K^2 (cf. _fwd_kernel's note: the
    full chain needs 30.6 MB scoped VMEM at this shape)."""
    out_dtype = out_ref.dtype
    if ph == 0 and pw == 0:
        xp_ref[...] = x_ref[...].astype(jnp.float32)
    else:
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, ph:ph + hi, pw:pw + wi, :] = x_ref[...].astype(jnp.float32)
    for head in range(heads):
        taps = [(ikh, ikw) for ikh in range(kh) for ikw in range(kw)]
        for t0 in range(0, len(taps), group):
            part = None
            for ikh, ikw in taps[t0:t0 + group]:
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :]
                wk = w_ref[:, :, :, k * cw:(k + 1) * cw].astype(jnp.float32)
                tap = xs * _tile_lanes(wk, g)
                part = tap if part is None else part + tap
            if t0 == 0:
                acc_ref[...] = part
            else:
                acc_ref[...] = acc_ref[...] + part
        out_ref[:, :, :, head * c:(head + 1) * c] = (
            acc_ref[...].astype(out_dtype))


def _dw_wloop_kernel(x_ref, dy_ref, dwf_ref, xp_ref, *, group, kh, kw, dh,
                     dw, heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Whole-image weight-grad for the stage-1 shape: per-tap group
    reduction written straight into the flat k-major layout (no cross-tap
    accumulation, so VMEM pressure is per-tap only)."""
    if ph == 0 and pw == 0:
        xp_ref[...] = x_ref[...].astype(jnp.float32)
    else:
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, ph:ph + hi, pw:pw + wi, :] = x_ref[...].astype(jnp.float32)
    out_dtype = dwf_ref.dtype
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :]
                t = xs * dys
                acc = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
                dwf_ref[:, :, :, k * cw:(k + 1) * cw] = acc.astype(out_dtype)


def _fwd_strip_kernel(x_ref, w_ref, out_ref, xp_ref, acc_ref, *, s, kh, kw,
                      dh, dw, heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Strip-tiled forward: grid (N, Ho//S); the full padded input lives in a
    VMEM scratch filled once per image (strip 0); every tap is a dynamic
    H-offset slice of it (the halo is just the slice overlap)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _fill():
        # the scratch is fp32: sub-f32 inputs convert ONCE here instead of
        # per tap (per-tap converts double Mosaic's live temps; bf16 S=28
        # at 56x56x64 measured 16.48 MB scoped that way)
        if ph == 0 and pw == 0:
            xp_ref[...] = x_ref[...].astype(jnp.float32)
        else:
            xp_ref[...] = jnp.zeros_like(xp_ref)
            xp_ref[:, ph:ph + hi, pw:pw + wi, :] = (
                x_ref[...].astype(jnp.float32))

    out_dtype = out_ref.dtype
    w_f32 = w_ref[...].astype(jnp.float32)   # one-shot strip conversion
    base = i * s
    for head in range(heads):
        # grouped accumulation: SSA chains of GROUP taps with a scratch
        # read-modify-write between groups — caps Mosaic's peak live
        # temporaries at ~GROUP tap buffers instead of K^2 (the bf16 S=28
        # full chain measured 16.25 MB scoped, 260 KB over the limit)
        taps = [(ikh, ikw) for ikh in range(kh) for ikw in range(kw)]
        GROUP = 3
        for t0 in range(0, len(taps), GROUP):
            part = None
            for ikh, ikw in taps[t0:t0 + GROUP]:
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, pl.ds(base + ikh * dh, s),
                            ikw * dw:ikw * dw + wo, :]
                wk = w_f32[:, :, :, k * cw:(k + 1) * cw]
                tap = xs * _tile_lanes(wk, g)
                part = tap if part is None else part + tap
            if t0 == 0:
                acc_ref[...] = part
            else:
                acc_ref[...] = acc_ref[...] + part
        out_ref[:, :, :, head * c:(head + 1) * c] = (
            acc_ref[...].astype(out_dtype))


def _dw_strip_kernel(x_ref, dy_ref, dwf_ref, xp_ref, *, s, kh, kw, dh,
                     dw, heads, g, cw, ho, wo, c, ph, pw, hi, wi):
    """Strip-tiled weight-grad: resident padded input + strip dy blocks;
    writes the flat k-major dw strip directly."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _fill():
        if ph == 0 and pw == 0:
            xp_ref[...] = x_ref[...].astype(jnp.float32)
        else:
            xp_ref[...] = jnp.zeros_like(xp_ref)
            xp_ref[:, ph:ph + hi, pw:pw + wi, :] = (
                x_ref[...].astype(jnp.float32))

    out_dtype = dwf_ref.dtype
    base = i * s
    for head in range(heads):
        dys = dy_ref[:, :, :, head * c:(head + 1) * c].astype(jnp.float32)
        for ikh in range(kh):
            for ikw in range(kw):
                k = head * kh * kw + ikh * kw + ikw
                xs = xp_ref[:, pl.ds(base + ikh * dh, s),
                            ikw * dw:ikw * dw + wo, :]
                t = xs * dys
                acc = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
                dwf_ref[:, :, :, k * cw:(k + 1) * cw] = acc.astype(out_dtype)


# ---------------------------------------------------------------------------
# CHWN (batch-on-lanes) kernels.
#
# Layout [G, Cw, H, W, N]: N on lanes (full 128-wide FMAs at the production
# batch), W on sublanes (tap shifts are static sublane slices), and the
# channel-group structure (g, cw) plus H on MAJOR dims, where indexing is
# free.  This is the transpose of the reference CUDA kernels' per-thread
# scalar indexing (aggregation_zeropad.py:20-110) into the TPU's vector
# units: the NHWC kernels above pay lane-space shuffles for the cw->c
# replication (fwd/dx) and the c->cw group reduction (dw); here both are
# plain block reads/SSA adds over major dims.  Boundary transposes
# NHWC<->CHWN ride XLA's tiled transpose and are charged to the op in every
# measurement (tools/chwn_bench.py).
# ---------------------------------------------------------------------------

# block-working-set budgets calibrated on-chip (v5e, 16 MB scoped VMEM):
# fwd at 28x28x128 full-G books ~14 MB modeled and compiles; bwd full-G
# booked 16.29 MB (OOM) and splits G until the model fits.
_CHWN_BUDGET_BYTES = 15 * 1024 * 1024


def _chwn_fwd_ws(gs, k2, hp, wp, ho, wo, n, itemsize) -> int:
    """Blocks + live f32 SSA temporaries for the CHWN forward at G-split
    ``gs`` (temps follow _working_set's calibrated ``3 + k2//4`` rule)."""
    blocks = (_tiled_bytes((gs, 1, hp, wp, n), itemsize)
              + _tiled_bytes((1, k2, ho, wo, n), itemsize)
              + _tiled_bytes((gs, 1, ho, wo, n), itemsize))
    temps = (3 + k2 // 4) * _tiled_bytes((1, 1, ho, wo, n), 4)
    return blocks + temps


def _chwn_bwd_ws(gs, k2, hp, wp, he, we, hi, wi, ho, wo, n,
                 itemsize) -> int:
    """Fused dx+dw blocks + temps: the dx chain holds ~k2 taps and the dw
    chain ~gs group partials (measured: full-G at 28x28x128 books 16.29 MB
    where blocks alone model 10 MB — the +k2+gs temp terms close that)."""
    blocks = (_tiled_bytes((gs, 1, hp, wp, n), itemsize)
              + _tiled_bytes((1, k2, he, we, n), itemsize)
              + _tiled_bytes((gs, 1, he, we, n), itemsize)
              + _tiled_bytes((gs, 1, hi, wi, n), itemsize)
              + _tiled_bytes((1, 1, k2, ho, wo, n), itemsize))
    temps = (k2 + gs + 2) * _tiled_bytes((1, 1, hi, wi, n), 4)
    return blocks + temps


def chwn_plan(x_shape, w_shape, itemsize, padding):
    """(gs_fwd, gs_bwd) G-split sizes for the CHWN kernels, or None.

    Eligible when heads == 1 (the CoT geometry), N fills whole lane tiles
    (N % 128 == 0; lifted in tests via COTNET_CHWN_ANY_N), the gather-form
    backward offsets are in range, and both working sets fit at some
    power-of-two G split.  Stage 1 (56x56) self-excludes: its K2 weight
    block alone approaches the scoped-VMEM limit."""
    if not CHWN_DISPATCH:
        return None
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    if heads != 1 or c % cw:
        return None
    if ho * wo < CHWN_MIN_MAP and not (CHWN_ANY_N and _use_interpret()):
        return None
    if n % 128 != 0 and not (CHWN_ANY_N and _use_interpret()):
        return None
    g = c // cw
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    lh = (hp - ho) - padding[0]
    lw = (wp - wo) - padding[1]
    if lh < 0 or lw < 0:
        return None
    he, we = ho + 2 * lh, wo + 2 * lw

    def shrink(ws_fn):
        gs = g
        while gs > 1 and ws_fn(gs) > _CHWN_BUDGET_BYTES:
            gs //= 2
        return gs if ws_fn(gs) <= _CHWN_BUDGET_BYTES else None

    gf = shrink(lambda s: _chwn_fwd_ws(s, k2, hp, wp, ho, wo, n, itemsize))
    gb = shrink(lambda s: _chwn_bwd_ws(s, k2, hp, wp, he, we, hi, wi, ho,
                                       wo, n, itemsize))
    if gf is None or gb is None:
        return None
    return gf, gb


def _fwd_chwn_kernel(xp_ref, w_ref, s_ref, b_ref, out_ref, *, kh, kw, dh,
                     dw, gs, ho, wo):
    """out[g, 0, ho, wo, n] = sum_k wn[0, k, ho, wo, n]
                                    * xp[g, 0, ho+kh*dh, wo+kw*dw, n]
    with ``wn = w*s + b`` when the affine refs are present (GroupNorm fold).

    Blocks: xp [Gs, 1(cw), Hp, Wp, N], w [1(cw), K2, Ho, Wo, N],
    s/b [1, K2, 1, 1, N] f32, out [Gs, 1, Ho, Wo, N]; grid (cw, G/Gs).
    All slices are major-dim (g, k, h) or static sublane (w) offsets."""
    out_dtype = out_ref.dtype
    for gi in range(gs):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                xs = xp_ref[gi, 0, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = w_ref[0, k].astype(jnp.float32)
                if s_ref is not None:
                    wk = wk * s_ref[0, k] + b_ref[0, k]
                tap = xs * wk
                acc = tap if acc is None else acc + tap
        out_ref[gi, 0] = acc.astype(out_dtype)


def _dxdw_chwn_kernel(xp_ref, wp_ref, dyp_ref, dx_ref, dw_ref, *, kh, kw,
                      dh, dw, gs, ho, wo, hi, wi, lh, lw):
    """Fused dx+dw, CHWN layout: gather-form dx (static shifted slices of
    the pre-padded dy/w), dw group reduction as an SSA chain over the g
    MAJOR dim (the NHWC kernels' lane-space weak spot).

    Blocks: xp [Gs, 1, Hp, Wp, N], wp [1, K2, Ho+2lh, Wo+2lw, N],
    dyp [Gs, 1, Ho+2lh, Wo+2lw, N]; dx [Gs, 1, Hi, Wi, N],
    dw [1, 1, K2, Ho, Wo, N] (per-G-split partial, summed outside when the
    grid splits G); grid (cw, G/Gs)."""
    out_dtype = dx_ref.dtype
    for gi in range(gs):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                sh = (kh - 1) * dh - ikh * dh
                sw = (kw - 1) * dw - ikw * dw
                dys = dyp_ref[gi, 0, sh:sh + hi,
                              sw:sw + wi, :].astype(jnp.float32)
                wk = wp_ref[0, k, sh:sh + hi,
                            sw:sw + wi, :].astype(jnp.float32)
                tap = dys * wk
                acc = tap if acc is None else acc + tap
        dx_ref[gi, 0] = acc.astype(out_dtype)
    dw_dtype = dw_ref.dtype
    for ikh in range(kh):
        for ikw in range(kw):
            k = ikh * kw + ikw
            red = None
            for gi in range(gs):
                xs = xp_ref[gi, 0, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                dys = dyp_ref[gi, 0, lh:lh + ho,
                              lw:lw + wo, :].astype(jnp.float32)
                t = xs * dys
                red = t if red is None else red + t
            dw_ref[0, 0, k] = red.astype(dw_dtype)


def chwn_strip_plan(x_shape, w_shape, itemsize, padding):
    """(hs, gs) for the CHWN H-strip FORWARD, or None.

    The fallback for shapes the whole-image CHWN plan excludes on VMEM —
    stage 1 (56x56), where the K2 weight block alone is ~8 MB.  Keeps the
    per-(cw, g) x block fully resident (0.9 MB at 56x56x128n) and strips
    w/out on H with dynamic offsets.  Measured (r5, tools/chwn_bench.py s1,
    chained A/B bf16 bs128 56x56x64): fwd 2.78-2.90 -> 2.09-2.26 ms =
    1.25-1.33x over the shipped XLA formulation across hs in {4, 8, 14}.
    The BACKWARD has its own plan (chwn_strip_bwd_plan): the in-kernel-g
    strip form measured 1.74x over the XLA VJP (the per-g-grid first cut
    had measured 0.72x).  K2 > 9 excluded: the K=7 taps (SAN/LR-Net
    variants) blow Mosaic compile time (r2 finding) and are unmeasured.
    ``gs`` groups per block: the w strip refetches once per (g-block,
    strip), so gs=2 cuts that traffic in half — measured another 1.10x
    (2.054 -> 1.866 ms; gs=4 ties gs=2, so the plan takes the smallest
    winning gs that fits VMEM)."""
    if not CHWN_DISPATCH:
        return None
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    if heads != 1 or c % cw or k2 > 9:
        return None
    if ho * wo < CHWN_MIN_MAP and not (CHWN_ANY_N and _use_interpret()):
        return None
    if n % 128 != 0 and not (CHWN_ANY_N and _use_interpret()):
        return None
    if chwn_plan(x_shape, w_shape, itemsize, padding) is not None:
        return None  # whole-image CHWN dispatches first where it fits
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    g = c // cw

    def fits(hs, gs):
        xb = gs * _tiled_bytes((1, 1, hp, wp, n), itemsize)
        wb = _tiled_bytes((1, k2, hs, wo, n), itemsize)
        ob = gs * _tiled_bytes((1, 1, hs, wo, n), itemsize)
        temps = (k2 + 2) * _tiled_bytes((1, 1, hs, wo, n), 4)
        # x2: Pallas double-buffers every in/out block
        return 2 * (xb + wb + ob) + temps <= _CHWN_BUDGET_BYTES

    for hs in (8, 7, 4, 2):
        if ho % hs != 0:
            continue
        for gs in (2, 1):
            if g % gs == 0 and fits(hs, gs):
                return hs, gs
    return None


def _fwd_chwn_strip_kernel(xp_ref, w_ref, s_ref, b_ref, out_ref, *, kh, kw,
                           dh, dw, hs, gs, wo):
    """CHWN H-strip forward: per-(cw, g-block, strip) grid; the xp block is
    the full padded image for ``gs`` (g, cw) slices, w/out are H-strips.
    H offsets dynamic (program_id), W offsets static.  Optional affine
    (GN fold)."""
    j = pl.program_id(2)
    out_dtype = out_ref.dtype
    for gi in range(gs):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                xs = xp_ref[gi, 0, pl.dslice(j * hs + ikh * dh, hs),
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = w_ref[0, k].astype(jnp.float32)
                if s_ref is not None:
                    wk = wk * s_ref[0, k] + b_ref[0, k]
                tap = xs * wk
                acc = tap if acc is None else acc + tap
        out_ref[gi, 0] = acc.astype(out_dtype)


def _agg_fwd_chwn_strip(x, w, s, b, geo, padding, plan):
    """Dispatch the CHWN H-strip forward (stage-1 shapes)."""
    hs, gs = plan
    n, hi, wi, c = x.shape
    _, ho, wo, _, k2, cw = w.shape
    g = c // cw
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    xt = _to_chwn(x, g, cw, geo["ph"], geo["pw"])
    wt = _w_to_chwn(w)
    affine = s is not None
    ins = [xt, wt]
    in_specs = [
        pl.BlockSpec((gs, 1, hp, wp, n), lambda i, sp, j: (sp, i, 0, 0, 0)),
        pl.BlockSpec((1, k2, hs, wo, n), lambda i, sp, j: (i, 0, j, 0, 0)),
    ]
    if affine:
        def aff_t(a):
            return jnp.transpose(a[:, 0].astype(jnp.float32),
                                 (2, 1, 0))[:, :, None, None, :]
        ins += [aff_t(s), aff_t(b)]
        in_specs += [pl.BlockSpec((1, k2, 1, 1, n),
                                  lambda i, sp, j: (i, 0, 0, 0, 0))] * 2
    kern = functools.partial(
        _fwd_chwn_strip_kernel if affine else
        (lambda xr, wr, outr, **kw_: _fwd_chwn_strip_kernel(
            xr, wr, None, None, outr, **kw_)),
        kh=geo["kh"], kw=geo["kw"], dh=geo["dh"], dw=geo["dw"], hs=hs,
        gs=gs, wo=wo)
    out_t = pl.pallas_call(
        kern,
        grid=(cw, g // gs, ho // hs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gs, 1, hs, wo, n),
                               lambda i, sp, j: (sp, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, ho, wo, n), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(x.size + wt.size + n * ho * wo * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(*ins)
    return _from_chwn(out_t)


def chwn_strip_bwd_plan(x_shape, w_shape, itemsize, padding):
    """``hs`` for the CHWN H-strip fused dx+dw BACKWARD, or None.

    Same eligibility as chwn_strip_plan plus the strip-gather geometry
    (ho == hi, wo == wi, so the dy/w halo equals the x pad and every
    shifted slice is in-bounds).  The r5 first-cut strip backward ran a
    per-(cw, g, strip) grid and measured 0.72x: the w strip was refetched
    once PER GROUP (8x at stage 1) and dw left the kernel as per-g f32
    partials (~16x the final dw bytes).  This plan's kernel loops g
    INSIDE the block instead — the w strip is read once per strip and dw
    leaves complete (f32 SSA chain over g), so the partial tensor never
    exists.  Measured (tools/chwn_bench.py s1bwdg, chained A/B bf16
    bs128 56x56x64 v5e): 4.08 -> 2.34 ms = **1.74x** over the shipped
    XLA gather-VJP at hs=4 (hs=7 1.66x, hs=2 1.29x; hs=8 blows the
    2x-double-buffered VMEM model).  The same economics apply wherever
    the WHOLE-IMAGE CHWN backward must split G to fit VMEM (gs_bwd < g:
    w refetched G/gs times, dw summed from per-split partials outside) —
    at 28x28x128 (the only in-model G-split shape, gs_bwd=4) the strip
    form measured 1.941 -> 1.579 ms = **1.23x** (hs=4; hs=7 1.20x,
    hs=14 1.03x), so this plan also claims those shapes; whole-image
    keeps full-g shapes (gs_bwd == g: w read once, dw complete — strips
    could only add halo bytes there).  Mirrors the role of the
    reference's input+weight-grad CUDA pair
    (aggregation_zeropad.py:113-235)."""
    if not (CHWN_DISPATCH and CHWN_STRIP_BWD):
        return None
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w_shape
    if heads != 1 or c % cw or k2 > 9:
        return None
    if ho != hi or wo != wi:
        return None
    if ho * wo < CHWN_MIN_MAP and not (CHWN_ANY_N and _use_interpret()):
        return None
    if n % 128 != 0 and not (CHWN_ANY_N and _use_interpret()):
        return None
    g = c // cw
    cp = chwn_plan(x_shape, w_shape, itemsize, padding)
    if cp is not None and cp[1] >= g:
        # whole-image CHWN backward keeps full g in-kernel (w read once,
        # dw complete) — strips could only add halo bytes there
        return None
    wp = wi + 2 * padding[1]
    we = wo + 2 * padding[1]

    def fits(hs):
        hw = hs + 2 * padding[0]
        xb = _tiled_bytes((1, g, 1, hw, wp, n), itemsize)
        wb = _tiled_bytes((1, 1, k2, hw, we, n), itemsize)
        db = _tiled_bytes((1, g, 1, hw, we, n), itemsize)
        dxb = _tiled_bytes((g, 1, hs, wi, n), itemsize)
        dwb = _tiled_bytes((1, k2, hs, wo, n), itemsize)
        temps = 6 * _tiled_bytes((1, 1, hw, we, n), 4)
        # x2: Pallas double-buffers every in/out block
        return 2 * (xb + wb + db + dxb + dwb) + temps <= _CHWN_BUDGET_BYTES

    for hs in (4, 7, 2):        # measured preference order (see above)
        if hi % hs == 0 and fits(hs):
            return hs
    return None


def _h_strips(t, axis, hs, halo, nh):
    """Stack ``nh`` overlapping H-strips ``[j*hs : j*hs + hs + 2*halo]``
    of ``t``'s ``axis`` along a new leading dim.  Overlapping (halo)
    reads are not expressible in BlockSpec index maps, so the strips are
    pre-materialized by XLA (bytes x (hs+2*halo)/hs, charged to the op
    in every measurement) and every in-kernel offset stays static."""
    sl = [slice(None)] * t.ndim
    parts = []
    for j in range(nh):
        sl[axis] = slice(j * hs, j * hs + hs + 2 * halo)
        parts.append(t[tuple(sl)])
    return jnp.stack(parts, axis=0)


def _bwd_chwn_strip_g_kernel(xs_ref, ws_ref, dys_ref, dx_ref, dw_ref, *,
                             kh, kw, dh, dw, hs, g, wo, wi, lh, lw):
    """Fused dx+dw, CHWN H-strips, g-reduction IN-KERNEL: grid (cw, nh).

    dx is the gather form (static shifted slices of the pre-padded dy/w
    strips); dw multiplies shifted x strips with the dy strip and reduces
    over g inside the block, so dw leaves complete and the w strip is
    read once per strip (not once per group).  Block batch dims stay 1
    per CLAUDE.md's Mosaic rule; all offsets static (H handled by the
    pre-materialized strip stack)."""
    out_dtype = dx_ref.dtype
    for gi in range(g):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                sh = (kh - 1) * dh - ikh * dh
                sw = (kw - 1) * dw - ikw * dw
                dys = dys_ref[0, gi, 0, sh:sh + hs,
                              sw:sw + wi, :].astype(jnp.float32)
                wk = ws_ref[0, 0, k, sh:sh + hs,
                            sw:sw + wi, :].astype(jnp.float32)
                tap = dys * wk
                acc = tap if acc is None else acc + tap
        dx_ref[gi, 0] = acc.astype(out_dtype)
    dw_dtype = dw_ref.dtype
    for ikh in range(kh):
        for ikw in range(kw):
            k = ikh * kw + ikw
            red = None
            for gi in range(g):
                xs = xs_ref[0, gi, 0, ikh * dh:ikh * dh + hs,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                dys = dys_ref[0, gi, 0, lh:lh + hs,
                              lw:lw + wo, :].astype(jnp.float32)
                t = xs * dys
                red = t if red is None else red + t
            dw_ref[0, k] = red.astype(dw_dtype)


def _agg_bwd_chwn_strip(x, w, dy, geo, padding, hs):
    """Dispatch the CHWN H-strip fused dx+dw backward (stage-1 shapes).

    Inputs arrive as pre-materialized overlapping strip stacks (see
    _h_strips) so the kernel's H offsets are static; boundary transposes
    ride XLA's tiled transpose as in the other CHWN dispatches."""
    n, hi, wi, c = x.shape
    _, ho, wo, _, k2, cw = w.shape
    g = c // cw
    lh = (geo["kh"] - 1) * geo["dh"] - geo["ph"]
    lw = (geo["kw"] - 1) * geo["dw"] - geo["pw"]
    nh = hi // hs
    hw_ = hs + 2 * lh
    wp_ = wi + 2 * geo["pw"]
    we = wo + 2 * lw
    xt = _to_chwn(x, g, cw, geo["ph"], geo["pw"])
    dyt = _to_chwn(dy, g, cw, lh, lw)
    wt = _w_to_chwn(w, lh, lw)
    xs_t = _h_strips(xt, 2, hs, lh, nh)
    dys_t = _h_strips(dyt, 2, hs, lh, nh)
    ws_t = _h_strips(wt, 2, hs, lh, nh)
    kern = functools.partial(_bwd_chwn_strip_g_kernel, kh=geo["kh"],
                             kw=geo["kw"], dh=geo["dh"], dw=geo["dw"],
                             hs=hs, g=g, wo=wo, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = pl.pallas_call(
        kern,
        grid=(cw, nh),
        in_specs=[
            pl.BlockSpec((1, g, 1, hw_, wp_, n),
                         lambda i, j: (j, 0, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, hw_, we, n),
                         lambda i, j: (j, i, 0, 0, 0, 0)),
            pl.BlockSpec((1, g, 1, hw_, we, n),
                         lambda i, j: (j, 0, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, 1, hs, wi, n), lambda i, j: (0, i, j, 0, 0)),
            pl.BlockSpec((1, k2, hs, wo, n), lambda i, j: (i, 0, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cw, hi, wi, n), x.dtype),
            jax.ShapeDtypeStruct((cw, k2, ho, wo, n), w.dtype),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * ho * wo * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(xs_t.size + ws_t.size + dys_t.size
                            + g * cw * hi * wi * n
                            + cw * k2 * ho * wo * n) * x.dtype.itemsize,
            transcendentals=0),
    )(xs_t, ws_t, dys_t)
    dx = _from_chwn(dx_t)
    dwk = jnp.transpose(dw_t, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dwk


def _to_chwn(x, g, cw, pad_h=0, pad_w=0):
    """[N, H, W, C] -> [G, Cw, H(+2ph), W(+2pw), N] (pad, then XLA tiled
    transpose; the C->(G, Cw) split is a free reshape because cw is the
    minor part of the channel index: c = g*Cw + cw)."""
    if pad_h or pad_w:
        x = jnp.pad(x, [(0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)])
    n, h, w_, c = x.shape
    return jnp.transpose(x, (3, 1, 2, 0)).reshape(g, cw, h, w_, n)


def _from_chwn(xt):
    """[G, Cw, H, W, N] -> [N, H, W, C]."""
    g, cw, h, w_, n = xt.shape
    return jnp.transpose(xt.reshape(g * cw, h, w_, n), (3, 1, 2, 0))


def _w_to_chwn(w, pad_h=0, pad_w=0):
    """[N, Ho, Wo, 1, K2, Cw] -> [Cw, K2, Ho(+2ph), Wo(+2pw), N]."""
    wsq = w[:, :, :, 0]
    if pad_h or pad_w:
        wsq = jnp.pad(wsq, [(0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0),
                            (0, 0)])
    return jnp.transpose(wsq, (4, 3, 1, 2, 0))


def _agg_fwd_chwn(x, w, s, b, geo, padding, gs, wt=None):
    """CHWN forward dispatch: transpose in, one pallas_call over
    (cw, G/gs), transpose out.  s/b: optional [N, 1, K2, Cw] f32 affine.
    ``wt``: weights ALREADY in the CHWN [Cw, K2, Ho, Wo, N] layout (the
    residency path, agg_core_pallas_wt) — skips the w boundary transpose."""
    n, hi, wi, c = x.shape
    if wt is None:
        _, ho, wo, _, k2, cw = w.shape
        wt = _w_to_chwn(w)
    else:
        cw, k2, ho, wo, _ = wt.shape
    g = c // cw
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    xt = _to_chwn(x, g, cw, geo["ph"], geo["pw"])
    affine = s is not None
    ins = [xt, wt]
    in_specs = [
        pl.BlockSpec((gs, 1, hp, wp, n), lambda i, sp: (sp, i, 0, 0, 0)),
        pl.BlockSpec((1, k2, ho, wo, n), lambda i, sp: (i, 0, 0, 0, 0)),
    ]
    if affine:
        # [N, 1, K2, Cw] -> [Cw, K2, 1, 1, N] f32
        def aff_t(a):
            return jnp.transpose(a[:, 0].astype(jnp.float32),
                                 (2, 1, 0))[:, :, None, None, :]
        ins += [aff_t(s), aff_t(b)]
        in_specs += [pl.BlockSpec((1, k2, 1, 1, n),
                                  lambda i, sp: (i, 0, 0, 0, 0))] * 2
    kern = functools.partial(
        _fwd_chwn_kernel if affine else
        (lambda xr, wr, outr, **kw_: _fwd_chwn_kernel(xr, wr, None, None,
                                                      outr, **kw_)),
        kh=geo["kh"], kw=geo["kw"], dh=geo["dh"], dw=geo["dw"], gs=gs,
        ho=ho, wo=wo)
    out_t = pl.pallas_call(
        kern,
        grid=(cw, g // gs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gs, 1, ho, wo, n),
                               lambda i, sp: (sp, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, ho, wo, n), x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(x.size + wt.size + n * ho * wo * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(*ins)
    return _from_chwn(out_t)


def _agg_bwd_chwn(x, w, dy, geo, padding, gs, wt_in=None):
    """CHWN fused dx+dw dispatch (gather-form; requires lh, lw >= 0).
    ``wt_in``: weights already CHWN [Cw, K2, Ho, Wo, N] — dw then returns
    in the SAME layout (no boundary transposes on the weight side)."""
    n, hi, wi, c = x.shape
    if wt_in is None:
        _, ho, wo, _, k2, cw = w.shape
    else:
        cw, k2, ho, wo, _ = wt_in.shape
    g = c // cw
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    lh = (geo["kh"] - 1) * geo["dh"] - geo["ph"]
    lw = (geo["kw"] - 1) * geo["dw"] - geo["pw"]
    he, we = ho + 2 * lh, wo + 2 * lw
    nsplit = g // gs
    xt = _to_chwn(x, g, cw, geo["ph"], geo["pw"])
    dyt = _to_chwn(dy, g, cw, lh, lw)
    if wt_in is None:
        wt = _w_to_chwn(w, lh, lw)
    else:
        wt = jnp.pad(wt_in, [(0, 0), (0, 0), (lh, lh), (lw, lw), (0, 0)])
    dw_dtype = (w if wt_in is None else wt_in).dtype
    kern = functools.partial(_dxdw_chwn_kernel, kh=geo["kh"], kw=geo["kw"],
                             dh=geo["dh"], dw=geo["dw"], gs=gs, ho=ho,
                             wo=wo, hi=hi, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = pl.pallas_call(
        kern,
        grid=(cw, nsplit),
        in_specs=[
            pl.BlockSpec((gs, 1, hp, wp, n), lambda i, sp: (sp, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, he, we, n), lambda i, sp: (i, 0, 0, 0, 0)),
            pl.BlockSpec((gs, 1, he, we, n), lambda i, sp: (sp, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gs, 1, hi, wi, n), lambda i, sp: (sp, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, ho, wo, n),
                         lambda i, sp: (sp, i, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cw, hi, wi, n), x.dtype),
            jax.ShapeDtypeStruct((nsplit, cw, k2, ho, wo, n), dw_dtype),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * ho * wo * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(2 * x.size + 2 * wt.size + n * ho * wo * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(xt, wt, dyt)
    dx = _from_chwn(dx_t)
    # per-split dw partials: each is an f32 SSA chain rounded once; the
    # cross-split sum re-accumulates in f32 (bit-identical when nsplit == 1)
    dw_s = dw_t[0] if nsplit == 1 else jnp.sum(
        dw_t.astype(jnp.float32), axis=0).astype(dw_dtype)
    if wt_in is not None:
        return dx, dw_s            # stays [Cw, K2, Ho, Wo, N]
    # [Cw, K2, Ho, Wo, N] -> [N, Ho, Wo, 1, K2, Cw]
    dwk = jnp.transpose(dw_s, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dwk


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


def _block(shape, m=1):
    ndim = len(shape)
    return pl.BlockSpec((m, *shape[1:]), lambda i: (i,) + (0,) * (ndim - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def agg_core_pallas(x, w, kernel_size, dilation, padding=(0, 0)):
    """Stride-1 local aggregation with fused zero padding.

    x: [N, H, W, C]; w: [N, Ho, Wo, heads, K^2, Cw] -> [N, Ho, Wo, heads*C].
    For reflect padding, pre-pad with jnp.pad and pass padding=(0, 0).
    """
    return _agg_fwd_impl(x, w, kernel_size, dilation, padding)


def _flat_weight(w):
    """[N, Ho, Wo, heads, K^2, Cw] -> [N, Ho, Wo, heads*K^2*Cw] (bitcast)."""
    n, ho, wo, heads, k2, cw = w.shape
    return w.reshape(n, ho, wo, heads * k2 * cw)


def _agg_fwd_impl(x, w, kernel_size, dilation, padding):
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    cp = chwn_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if cp is not None:
        return _agg_fwd_chwn(x, w, None, None, geo, padding, cp[0])
    sp = chwn_strip_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if sp is not None:
        return _agg_fwd_chwn_strip(x, w, None, None, geo, padding, sp)
    wf = _flat_weight(w)
    plan = pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    assert plan is not None, "caller must gate on pallas_plan"
    if plan[0] == "wloop":
        return pl.pallas_call(
            functools.partial(_fwd_wloop_kernel, group=plan[1], **geo),
            grid=(n,),
            in_specs=[_block(x.shape), _block(wf.shape)],
            out_specs=_block((n, ho, wo, heads * c)),
            out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), x.dtype),
            scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32),
                            pltpu.VMEM((1, ho, wo, c), jnp.float32)],
            interpret=_use_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * ho * wo * heads * geo["kh"] * geo["kw"] * c,
                bytes_accessed=(x.size + wf.size + n * ho * wo * heads * c)
                * x.dtype.itemsize,
                transcendentals=0),
        )(x, wf)
    if plan[0] == "strip":
        s = plan[1]
        return pl.pallas_call(
            functools.partial(_fwd_strip_kernel, s=s, **geo),
            grid=(n, ho // s),
            in_specs=[
                pl.BlockSpec((1, hi, wi, c), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, wo, wf.shape[-1]),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s, wo, heads * c),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), x.dtype),
            scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32),
                            pltpu.VMEM((1, s, wo, c), jnp.float32)],
            interpret=_use_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * ho * wo * heads * geo["kh"] * geo["kw"] * c,
                bytes_accessed=(x.size + wf.size + n * ho * wo * heads * c)
                * x.dtype.itemsize,
                transcendentals=0),
        )(x, wf)
    m = plan[1]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block(wf.shape, m)],
        out_specs=_block((n, ho, wo, heads * c), m),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * heads * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(x.size + wf.size + n * ho * wo * heads * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(x, wf)
    return out


def _agg_fwd_rule(x, w, kernel_size, dilation, padding):
    return _agg_fwd_impl(x, w, kernel_size, dilation, padding), (x, w)


def _agg_bwd_rule(kernel_size, dilation, padding, res, dy):
    x, w = res
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    ph, pw_ = geo["ph"], geo["pw"]
    cp = chwn_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if cp is not None:
        bs = chwn_strip_bwd_plan(x.shape, w.shape, x.dtype.itemsize,
                                 padding)
        if bs is not None:
            # non-None here only when the whole-image backward would
            # split G (gs_bwd < g) — the strip form reads w once per
            # strip and emits dw complete, 1.23x at the 28x28x128
            # G-split shape (see chwn_strip_bwd_plan)
            return _agg_bwd_chwn_strip(x, w, dy, geo, padding, bs)
        return _agg_bwd_chwn(x, w, dy, geo, padding, cp[1])
    plan = pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if (plan is None and
            chwn_strip_plan(x.shape, w.shape, x.dtype.itemsize,
                            padding) is not None):
        bs = chwn_strip_bwd_plan(x.shape, w.shape, x.dtype.itemsize,
                                 padding)
        if bs is not None:
            # in-kernel-g-reduction strip backward: 1.74x over the XLA
            # gather-VJP at the stage-1 shape (see chwn_strip_bwd_plan)
            return _agg_bwd_chwn_strip(x, w, dy, geo, padding, bs)
        # strip-plan shapes the bwd plan excludes (VMEM/geometry) ride
        # the gather-VJP XLA formulation (the tuned stage-1 training
        # backward this shape used before strips shipped)
        from cotnet_tpu.ops import local_agg as _la

        def _xla_fwd2(xx, ww):
            xxp = jnp.pad(xx, ((0, 0), (geo["ph"], geo["ph"]),
                               (geo["pw"], geo["pw"]), (0, 0)))
            return _la._agg_xla_stride1(xxp, ww, kernel_size, dilation)

        return jax.vjp(_xla_fwd2, x, w)[1](dy)
    wf = _flat_weight(w)
    assert plan is not None
    if plan[0] == "wloop":
        # dx via the XLA transpose (as with strips: the dx gather form
        # needs full-res dy/w resident beyond VMEM at this shape)
        from cotnet_tpu.ops import local_agg as _la

        def _xla_fwd(xx):
            xxp = jnp.pad(xx, ((0, 0), (geo["ph"], geo["ph"]),
                               (geo["pw"], geo["pw"]), (0, 0)))
            return _la._agg_core_xla(xxp, w, kernel_size, (1, 1), dilation)

        dx = jax.vjp(_xla_fwd, x)[1](dy)[0]
        dwf = pl.pallas_call(
            functools.partial(_dw_wloop_kernel, group=plan[1], **geo),
            grid=(n,),
            in_specs=[_block(x.shape), _block((n, ho, wo, heads * c))],
            out_specs=_block(wf.shape),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32)],
            interpret=_use_interpret(),
        )(x, dy)
        return dx, dwf.reshape(w.shape)
    if plan[0] == "strip":
        s = plan[1]
        f = wf.shape[-1]
        # dx via the XLA transpose of the reference formulation (the strip
        # kernels only cover fwd/dw; see _strip_working_set note)
        from cotnet_tpu.ops import local_agg as _la

        def _xla_fwd(xx):
            xxp = jnp.pad(xx, ((0, 0), (geo["ph"], geo["ph"]),
                               (geo["pw"], geo["pw"]), (0, 0)))
            return _la._agg_core_xla(xxp, w, kernel_size, (1, 1), dilation)

        dx = jax.vjp(_xla_fwd, x)[1](dy)[0]
        dwf = pl.pallas_call(
            functools.partial(_dw_strip_kernel, s=s, **geo),
            grid=(n, ho // s),
            in_specs=[
                pl.BlockSpec((1, hi, wi, c), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, wo, heads * c),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s, wo, f), lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((1, hp, wp, c), jnp.float32)],
            interpret=_use_interpret(),
        )(x, dy)
        return dx, dwf.reshape(w.shape)
    m = plan[1]

    lh = (geo["kh"] - 1) * geo["dh"] - geo["ph"]
    lw = (geo["kw"] - 1) * geo["dw"] - geo["pw"]
    # measured dispatch (tools/dx_bench.py, v5e bf16 bs128): the gather dx
    # and dot-form dw win on large maps (28x28: 2.24 vs 2.44 / 2.43 vs 3.43)
    # and lose or tie at 14x14 and below, where the incumbents stay
    big_map = ho * wo >= DX_BIG_MAP_MIN
    # bf16-only when compiled: Mosaic keeps the K^2 tap slices live across
    # the SSA chain, which the working-set model can't see — measured 17.34M
    # scoped vmem at f32 28x28x128 m=1 (OOM at the 16M limit) while bf16
    # fits and wins; interpret mode (tests) has no vmem and stays open.
    gather_dtype_ok = x.dtype.itemsize <= 2 or _use_interpret()

    if FUSED_BWD:
        # gather form preferred at EVERY map size (unlike the separate-dx
        # crossover at DX_BIG_MAP_MIN): measured 28/14/7px it wins or ties
        # fused-scatter and both beat the two-launch pair (bwd_pair_bench)
        use_gather = (DX_GATHER and gather_dtype_ok
                      and lh >= 0 and lw >= 0
                      and _dxdw_working_set(x.shape, w.shape,
                                            x.dtype.itemsize, padding, m,
                                            True) <= _VMEM_BUDGET_BYTES)
        scatter_fits = _dxdw_working_set(
            x.shape, w.shape, x.dtype.itemsize, padding, m,
            False) <= _VMEM_BUDGET_BYTES
        if use_gather or scatter_fits:
            f = wf.shape[-1]
            dw_dot = big_map and (x.dtype.itemsize <= 2 or _use_interpret())
            if use_gather:
                kern = functools.partial(_dxdw_gather_kernel, dw_dot=dw_dot,
                                         **geo)
                scratch = [
                    pltpu.VMEM((m, hp, wp, c), x.dtype),
                    pltpu.VMEM((m, ho + 2 * lh, wo + 2 * lw, f), w.dtype),
                    pltpu.VMEM((m, ho + 2 * lh, wo + 2 * lw, heads * c),
                               dy.dtype)]
            else:
                kern = functools.partial(_dxdw_scatter_kernel, dw_dot=dw_dot,
                                         **geo)
                scratch = [pltpu.VMEM((m, hp, wp, c), x.dtype),
                           pltpu.VMEM((m, hp, wp, c), jnp.float32)]
            dx, dwf = pl.pallas_call(
                kern,
                grid=(n // m,),
                in_specs=[_block(x.shape, m), _block(wf.shape, m),
                          _block((n, ho, wo, heads * c), m)],
                out_specs=(_block(x.shape, m), _block(wf.shape, m)),
                out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                           jax.ShapeDtypeStruct(wf.shape, w.dtype)),
                scratch_shapes=scratch,
                interpret=_use_interpret(),
                cost_estimate=pl.CostEstimate(
                    flops=4 * n * ho * wo * heads * geo["kh"] * geo["kw"]
                    * c,
                    bytes_accessed=(x.size + 2 * wf.size
                                    + 2 * n * ho * wo * heads * c)
                    * x.dtype.itemsize,
                    transcendentals=0),
            )(x, wf, dy)
            return dx, dwf.reshape(w.shape)
    if (DX_GATHER and big_map and gather_dtype_ok and lh >= 0 and lw >= 0
            and _dx_gather_working_set(x.shape, w.shape, x.dtype.itemsize,
                                       padding, m) <= _VMEM_BUDGET_BYTES):
        f = wf.shape[-1]
        dx = pl.pallas_call(
            functools.partial(_dx_gather_kernel, **geo),
            grid=(n // m,),
            in_specs=[_block(wf.shape, m),
                      _block((n, ho, wo, heads * c), m)],
            out_specs=_block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((m, ho + 2 * lh, wo + 2 * lw, f), w.dtype),
                pltpu.VMEM((m, ho + 2 * lh, wo + 2 * lw, heads * c),
                           dy.dtype)],
            interpret=_use_interpret(),
        )(wf, dy)
    else:
        dx = pl.pallas_call(
            functools.partial(_dx_kernel, **geo),
            grid=(n // m,),
            in_specs=[_block(wf.shape, m),
                      _block((n, ho, wo, heads * c), m)],
            out_specs=_block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, wp, c), jnp.float32)],
            interpret=_use_interpret(),
        )(wf, dy)

    # dot-form dw is bf16-only when compiled: the MXU truncates f32
    # operands to bf16 passes at default precision (measured 2.3e-3 dw
    # error vs XLA at f32 28x28 on-chip); for bf16 models the truncation
    # is within the output dtype's own rounding.  Same bf16 gate as the
    # gather dx (and interpret mode computes exactly, so tests stay open).
    use_dw_dot = big_map and (x.dtype.itemsize <= 2 or _use_interpret())
    dwf = pl.pallas_call(
        functools.partial(_dw_kernel_dot if use_dw_dot else _dw_kernel,
                          **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block((n, ho, wo, heads * c), m)],
        out_specs=_block(wf.shape, m),
        out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
    )(x, dy)
    return dx, dwf.reshape(w.shape)


agg_core_pallas.defvjp(_agg_fwd_rule, _agg_bwd_rule)


# ---------------------------------------------------------------------------
# CHWN-resident weights (COTNET_CHWN_W): the weight tensor enters — and its
# gradient leaves — in the kernel-native [Cw, K2, Ho, Wo, N] layout, so the
# most expensive boundary transposes (w fwd, dw bwd: the K2*Cw tensor is
# 9/8 x the activation) never happen.  CotLayer produces wt directly from
# embed_conv2 as a channel-major matmul + CHWN GroupNorm (models/cotnet.py).


def chwn_wt_plan(x_shape, wt_shape, itemsize, padding):
    """(gs_fwd, gs_bwd) for the wt-resident form, or None if ineligible
    (same rules as chwn_plan on the equivalent NHWC shapes)."""
    cw, k2, ho, wo, n = wt_shape
    return chwn_plan(x_shape, (n, ho, wo, 1, k2, cw), itemsize, padding)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def agg_core_pallas_wt(x, wt, kernel_size, dilation, padding=(0, 0)):
    """Stride-1 local aggregation, weights pre-transposed to CHWN.

    x: [N, H, W, C]; wt: [Cw, K2, Ho, Wo, N] -> out [N, Ho, Wo, C].
    Gradient wrt wt is returned in the same CHWN layout.  Caller must gate
    on ``chwn_wt_plan``."""
    return _agg_fwd_wt_impl(x, wt, kernel_size, dilation, padding)


def _agg_fwd_wt_impl(x, wt, kernel_size, dilation, padding):
    cw, k2, ho, wo, n = wt.shape
    w_shape = (n, ho, wo, 1, k2, cw)
    geo = _geometry(x.shape, w_shape, kernel_size, dilation, padding)
    cp = chwn_plan(x.shape, w_shape, x.dtype.itemsize, padding)
    assert cp is not None, "caller must gate on chwn_wt_plan"
    return _agg_fwd_chwn(x, None, None, None, geo, padding, cp[0], wt=wt)


def _agg_wt_fwd_rule(x, wt, kernel_size, dilation, padding):
    return _agg_fwd_wt_impl(x, wt, kernel_size, dilation, padding), (x, wt)


def _agg_wt_bwd_rule(kernel_size, dilation, padding, res, dy):
    x, wt = res
    cw, k2, ho, wo, n = wt.shape
    w_shape = (n, ho, wo, 1, k2, cw)
    geo = _geometry(x.shape, w_shape, kernel_size, dilation, padding)
    cp = chwn_plan(x.shape, w_shape, x.dtype.itemsize, padding)
    return _agg_bwd_chwn(x, None, dy, geo, padding, cp[1], wt_in=wt)


agg_core_pallas_wt.defvjp(_agg_wt_fwd_rule, _agg_wt_bwd_rule)


# ---------------------------------------------------------------------------
# Affine-folded variant: aggregation with the GroupNorm normalize fused in.
#
# The CoT attention weight is produced by embed-conv -> GroupNorm and
# consumed exactly once by the aggregation.  A pallas_call is a fusion
# boundary, so with the plain kernel the *normalized* weight tensor — the
# largest activation in every CoT layer — must be materialized in HBM (one
# write by the normalize fusion + one read by the kernel).  Folding the
# normalize's per-(image, tap, cw) affine ``wn = w*s + b`` into the kernels
# deletes that round-trip: forward reads the raw conv output directly, and
# backward emits (dw, ds, db) in one pass instead of writing the
# normalized-weight cotangent for an XLA GroupNorm-backward to re-read.
# The tiny stats reductions that produce s and b stay outside in XLA (they
# fuse with the embed conv's output); their gradient chain back to w
# composes automatically because s and b are primal inputs here.
# ---------------------------------------------------------------------------


def _flat_affine(s):
    """[N, heads, K^2, Cw] -> [N, 1, 1, heads*K^2*Cw] f32 (bitcast+cast)."""
    n, heads, k2, cw = s.shape
    return s.reshape(n, 1, 1, heads * k2 * cw).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def agg_core_pallas_affine(x, w, s, b, kernel_size, dilation,
                           padding=(0, 0)):
    """Stride-1 local aggregation of ``x`` with ``w*s + b``, fused.

    x: [N, H, W, C]; w: [N, Ho, Wo, heads, K^2, Cw];
    s, b: [N, heads, K^2, Cw] float32 (per-image GroupNorm affine).
    Only the whole-image kernel flavor supports the fold — callers gate on
    ``pallas_plan(..., affine=True) == ('whole', m)`` and pre-apply the
    affine for other plans.
    """
    return _agg_affine_fwd_impl(x, w, s, b, kernel_size, dilation, padding)


def _agg_affine_fwd_impl(x, w, s, b, kernel_size, dilation, padding):
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    cp = chwn_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if cp is not None:
        return _agg_fwd_chwn(x, w, s, b, geo, padding, cp[0])
    sp = chwn_strip_plan(x.shape, w.shape, x.dtype.itemsize, padding)
    if sp is not None:
        return _agg_fwd_chwn_strip(x, w, s, b, geo, padding, sp)
    wf = _flat_weight(w)
    sf, bf = _flat_affine(s), _flat_affine(b)
    plan = pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding,
                       affine=True)
    assert plan is not None and plan[0] == "whole", \
        "caller must gate on pallas_plan(affine=True)"
    m = plan[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_affine, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block(wf.shape, m),
                  _block(sf.shape, m), _block(bf.shape, m)],
        out_specs=_block((n, ho, wo, heads * c), m),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, heads * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * ho * wo * heads * geo["kh"] * geo["kw"] * c,
            bytes_accessed=(x.size + wf.size + n * ho * wo * heads * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(x, wf, sf, bf)


def _agg_affine_fwd_rule(x, w, s, b, kernel_size, dilation, padding):
    out = _agg_affine_fwd_impl(x, w, s, b, kernel_size, dilation, padding)
    return out, (x, w, s, b)


def _agg_affine_bwd_rule(kernel_size, dilation, padding, res, dy):
    x, w, s, b = res
    geo = _geometry(x.shape, w.shape, kernel_size, dilation, padding)
    n, hi, wi, c = x.shape
    ho, wo, heads = geo["ho"], geo["wo"], geo["heads"]
    hp, wp = hi + 2 * geo["ph"], wi + 2 * geo["pw"]
    plan = pallas_plan(x.shape, w.shape, x.dtype.itemsize, padding,
                       affine=True)
    if ((plan is None or plan[0] != "whole")
            and chwn_strip_plan(x.shape, w.shape, x.dtype.itemsize,
                                padding) is not None):
        # strip-plan shapes (stage 1) differentiate via the XLA affine
        # formulation (the strip kernels cover the forward only; the
        # affine-train path is gated off by default anyway)
        from cotnet_tpu.ops import local_agg as _la

        def _xla_aff(xx, ww, ss, bb):
            xxp = jnp.pad(xx, ((0, 0), (geo["ph"], geo["ph"]),
                               (geo["pw"], geo["pw"]), (0, 0)))
            return _la._agg_core_xla(xxp, ww, kernel_size, (1, 1), dilation,
                                     ss, bb)

        return jax.vjp(_xla_aff, x, w, s, b)[1](dy)
    wf = _flat_weight(w)
    sf, bf = _flat_affine(s), _flat_affine(b)
    assert plan is not None and plan[0] == "whole"
    # bwd picks its own packing: the dw kernel's extra raw-weight block
    # must not shrink the forward's m
    m = _pick_batch_block(x.shape, w.shape, x.dtype.itemsize, padding,
                          affine_dw=True)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel_affine, **geo),
        grid=(n // m,),
        in_specs=[_block(wf.shape, m), _block(sf.shape, m),
                  _block(bf.shape, m), _block((n, ho, wo, heads * c), m)],
        out_specs=_block(x.shape, m),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), jnp.float32)],
        interpret=_use_interpret(),
    )(wf, sf, bf, dy)

    dwf, dsf, dbf = pl.pallas_call(
        functools.partial(_dw_kernel_affine, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block((n, ho, wo, heads * c), m),
                  _block(wf.shape, m), _block(sf.shape, m)],
        out_specs=(_block(wf.shape, m), _block(sf.shape, m),
                   _block(bf.shape, m)),
        out_shape=(jax.ShapeDtypeStruct(wf.shape, w.dtype),
                   jax.ShapeDtypeStruct(sf.shape, jnp.float32),
                   jax.ShapeDtypeStruct(bf.shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), x.dtype)],
        interpret=_use_interpret(),
    )(x, dy, wf, sf)
    return (dx, dwf.reshape(w.shape), dsf.reshape(s.shape).astype(s.dtype),
            dbf.reshape(b.shape).astype(b.dtype))


agg_core_pallas_affine.defvjp(_agg_affine_fwd_rule, _agg_affine_bwd_rule)


# ---------------------------------------------------------------------------
# Inference mega-fusion: embed 1x1 conv -> GroupNorm -> aggregation in ONE
# kernel (VERDICT r2 next-steps #1's "if it fits" extension).  The attention
# weight tensor — K^2/share_planes times larger than the image — is computed
# from the embed mid-activation ON-CHIP: its conv output, GroupNorm
# statistics, normalize, and consumption by the aggregation all happen in
# VMEM, so it NEVER exists in HBM in any form.  Per CoT layer this deletes
# the conv2 output write, the stats read, and the kernel's weight read
# (~2.5x the weight tensor's bytes), replacing them with one read of the
# 2.25x-smaller mid tensor.  Eval-only (no VJP): training keeps the
# materialized path, whose backward measured faster.
#
# MEASURED VERDICT (r3, tools/fused_embed_bench.py, bs128 bf16 on the real
# chip): ties at 14px (1.00x) and 7px (1.01x), LOSES at 28px (0.67x), and
# 56px exceeds scoped VMEM (20.2 MB vs 16) — once the deferred-affine fold
# removed the separate GN pass, the unfused path stopped being HBM-bound,
# and the per-image in-kernel dot can't match XLA's single batched matmul.
# Gated off by default (models/cotnet.py COTNET_MEGA_FUSE); kept
# oracle-tested.
# ---------------------------------------------------------------------------


def _fused_rows(ho: int) -> int:
    """Row-chunk size for the fused kernel's phases: bounds Mosaic's live
    fp32 temporaries to chunk-sized tensors (a whole-image SSA chain at
    stage 2 measured 57 MB scoped VMEM vs the 16 MB limit)."""
    for s in (8, 7, 5, 4, 2, 1):
        if ho % s == 0:
            return s
    return 1


def _fused_embed_kernel(x_ref, wp_ref, w2_ref, b2_ref, g_ref, be_ref,
                        out_ref, xp_ref, wr_ref, *, kh, kw, dh, dw, heads,
                        g, cw, ho, wo, c, ph, pw, hi, wi, eps):
    """w_raw = wp @ w2 + b2 (MXU); per-image GroupNorm stats over
    (Ho, Wo, K^2) per cw lane; aggregate x with the normalized weight.
    All phases run over row chunks so live temporaries stay chunk-sized."""
    assert heads == 1
    k2 = kh * kw
    out_dtype = out_ref.dtype
    _fill_padded(x_ref, xp_ref, ph, pw, hi, wi)
    m = wp_ref.shape[0]
    w2 = w2_ref[...]
    b2 = b2_ref[...].astype(jnp.float32)
    rows = _fused_rows(ho)

    # phase 1a: embed conv (MXU).  Whole-image dot per image by default;
    # when ho has a multiple-of-8 divisor (sublane-aligned row slices) the
    # dot runs per row chunk, shrinking its live buffers — this is what
    # lets the 56x56 stage-1 map fit scoped VMEM.
    rows_dot = 0
    for cand in (32, 24, 16, 8):
        if ho % cand == 0:
            rows_dot = cand
            break
    for i in range(m):
        if rows_dot and ho > 28:
            for r0 in range(0, ho, rows_dot):
                wr_ref[i, r0:r0 + rows_dot] = (jax.lax.dot_general(
                    wp_ref[i, r0:r0 + rows_dot], w2,
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + b2[0]).astype(
                        wr_ref.dtype)
        else:
            wr_ref[i] = (jax.lax.dot_general(
                wp_ref[i], w2, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b2[0]).astype(
                    wr_ref.dtype)
    # phase 1b: running GN stats per row chunk
    s1 = None
    s2 = None
    for r0 in range(0, ho, rows):
        blk = wr_ref[:, r0:r0 + rows].astype(jnp.float32)
        a = jnp.sum(blk, axis=(1, 2), keepdims=True)
        b = jnp.sum(blk * blk, axis=(1, 2), keepdims=True)
        s1 = a if s1 is None else s1 + a
        s2 = b if s2 is None else s2 + b
    # fold the k2 tap groups: stats are per cw lane -> [m, 1, 1, cw]
    sa = None
    sb = None
    for k in range(k2):
        t1 = s1[:, :, :, k * cw:(k + 1) * cw]
        t2 = s2[:, :, :, k * cw:(k + 1) * cw]
        sa = t1 if sa is None else sa + t1
        sb = t2 if sb is None else sb + t2
    n_el = k2 * ho * wo
    mean = sa / n_el
    var = jnp.maximum(sb / n_el - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)

    # phase 2: normalize + aggregate per row chunk.  gamma/beta arrive as
    # [K^2, Cw] so each tap is a SUBLANE row slice — lane slicing them
    # (either on the ref or a loaded value) trips Mosaic's layout checks
    # at one alignment or another depending on Cw
    for r0 in range(0, ho, rows):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                xs = xp_ref[:, r0 + ikh * dh:r0 + ikh * dh + rows,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                gk = g_ref[k:k + 1, :].reshape(1, 1, 1, cw)
                bk = be_ref[k:k + 1, :].reshape(1, 1, 1, cw)
                wn = ((wr_ref[:, r0:r0 + rows, :, k * cw:(k + 1) * cw]
                       .astype(jnp.float32) - mean) * (inv * gk) + bk)
                tap = xs * _tile_lanes(wn, g)
                acc = tap if acc is None else acc + tap
        out_ref[:, r0:r0 + rows] = acc.astype(out_dtype)


# Budget calibrated against compiler-reported scoped VMEM: the f32-scratch
# whole-dot variant of the kernel needed 19.5 MB at 56x56x64 (over the
# 16 MB limit); with the sublane gamma/beta layout the 56x56 map still
# needs 20.2 MB on hardware, so the plan rejects it explicitly below.
_FUSED_BUDGET_BYTES = 11 * 1024 * 1024


def fused_embed_plan(x_shape, wp_shape, f, itemsize, padding=(0, 0)):
    """('whole', m) or None for the embed+GN+agg mega-fusion.

    All compute phases are row-chunked (``_fused_rows``), so live fp32
    temporaries are chunk-sized — even the 56x56 stage-1 map fits, which no
    other whole-image kernel flavor does."""
    n, hi, wi, c = x_shape
    if hi > 28 or wi > 28:
        # measured: 56x56x64 needs 20.2 MB scoped VMEM (Mosaic keeps the
        # unrolled row-chunk temporaries live) vs the 16 MB limit
        return None
    cp = wp_shape[-1]
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    rows = _fused_rows(hi)

    def ws(m):
        bufs = (_tiled_bytes((m, hi, wi, c), itemsize)
                + _tiled_bytes((m, hi, wi, cp), itemsize)
                + _tiled_bytes((m, hi, wi, c), itemsize)      # out
                + _tiled_bytes((cp, f), 4)
                + 3 * _tiled_bytes((1, 1, 1, f), 4))
        scratch = (_tiled_bytes((m, hp, wp, c), itemsize)
                   + _tiled_bytes((m, hi, wi, f), itemsize)   # w_raw
                   + 6 * _tiled_bytes((m, rows, wi, c), 4)    # tap chunks
                   + 2 * _tiled_bytes((m, rows, wi, f), 4))   # stats chunks
        return 2 * bufs + scratch

    if ws(1) > _FUSED_BUDGET_BYTES:
        return None
    m = 1
    for cand in (2, 4, 8):
        if n % cand or ws(cand) > _FUSED_BUDGET_BYTES:
            break
        m = cand
    return ("whole", m)


def agg_embed_gn_pallas(x, w_pre, w2, b2, gamma, beta, kernel_size, dilation,
                        padding, eps=1e-5):
    """Fused embed-conv + GroupNorm + aggregation forward (eval only).

    x: [N, H, W, C] values; w_pre: [N, H, W, Cp] embed mid-activation;
    w2: [Cp, K^2*Cw] (the 1x1 embed_conv2 kernel); b2, gamma, beta:
    [K^2*Cw].  Caller gates on :func:`fused_embed_plan`.
    """
    n, hi, wi, c = x.shape
    f = w2.shape[-1]
    kh, kw = kernel_size
    geo = dict(kh=kh, kw=kw, dh=dilation[0], dw=dilation[1], heads=1,
               g=c // (f // (kh * kw)), cw=f // (kh * kw), ho=hi, wo=wi,
               c=c, ph=padding[0], pw=padding[1], hi=hi, wi=wi, eps=eps)
    plan = fused_embed_plan(x.shape, w_pre.shape, f, x.dtype.itemsize,
                            padding)
    assert plan is not None, "caller must gate on fused_embed_plan"
    m = plan[1]
    hp, wp = hi + 2 * padding[0], wi + 2 * padding[1]
    k2 = kh * kw
    cw = f // k2
    vec = lambda v: v.reshape(1, 1, 1, f).astype(jnp.float32)  # noqa: E731
    tap2d = lambda v: v.reshape(k2, cw).astype(jnp.float32)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fused_embed_kernel, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block(w_pre.shape, m),
                  pl.BlockSpec((w2.shape[0], f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 1, f), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [
                  pl.BlockSpec((k2, cw), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=_block((n, hi, wi, c), m),
        out_shape=jax.ShapeDtypeStruct((n, hi, wi, c), x.dtype),
        # wr scratch holds the conv output in the model dtype — exactly
        # what the unfused path's GroupNorm reads (its conv also emits the
        # model dtype); halves the scratch at the big early stages
        scratch_shapes=[pltpu.VMEM((m, hp, wp, c), x.dtype),
                        pltpu.VMEM((m, hi, wi, f), x.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hi * wi * (w_pre.shape[-1] * f
                                     + kh * kw * c * 2),
            bytes_accessed=(x.size + w_pre.size + x.size) * x.dtype.itemsize,
            transcendentals=0),
    )(x, w_pre, w2.astype(x.dtype), vec(b2), tap2d(gamma), tap2d(beta))


# ---------------------------------------------------------------------------
# Single-launch dual-kernel ("mix") aggregation: the 3x3 AND 5x5 weighted
# aggregations of the SAME input in one kernel per pass, mirroring the
# reference's fused CUDA kernels (aggregation_zeropad_mix.py:20-74 forward,
# :76-141 input-grad, :143-207 weight-grad — one launch each).  The fused
# form reads x once for both kernels (the composed fallback reads it twice)
# and writes the two output halves into one buffer (no concat pass).
# Channel order is kernel-major [kernel_idx, head, c], identical to the
# reference's output layout.  Geometry restrictions match the reference
# module (LocalConvolutionMix asserts K1=3/K2=5, aggregation_zeropad_mix.py
# :328-329): stride 1, dilation 1, SAME zero padding, whole-image plan.
# ---------------------------------------------------------------------------


def _mix_working_set(x_shape, w1_shape, w2_shape, itemsize, m) -> int:
    """VMEM bytes for an m-image mix block: both flat weights + dy-sized
    I/O (2*heads*C), the pad-2 scratch, and the SSA chains' live f32 taps
    (the 25-tap chain dominates; same live-temp model as _working_set)."""
    n, hi, wi, c = x_shape
    heads, cw = w1_shape[3], w1_shape[5]
    f1 = heads * w1_shape[4] * cw
    f2 = heads * w2_shape[4] * cw
    hp, wp = hi + 4, wi + 4
    bufs = (_tiled_bytes((m, hi, wi, c), itemsize)
            + _tiled_bytes((m, hi, wi, f1), itemsize)
            + _tiled_bytes((m, hi, wi, f2), itemsize)
            + _tiled_bytes((m, hi, wi, 2 * heads * c), itemsize))
    live_temps = 3 + (w1_shape[4] + w2_shape[4]) // 4
    scratch = (_tiled_bytes((m, hp, wp, c), itemsize)
               + live_temps * _tiled_bytes((m, hp, wp, c), 4))
    return 2 * bufs + scratch


def mix_plan(x_shape, w1_shape, w2_shape, itemsize):
    """('whole', m) when the fused dual-kernel fits VMEM, else None."""
    n, hi, wi, c = x_shape
    if w1_shape[1] != hi or w1_shape[2] != wi or w2_shape[1] != hi:
        return None
    if _mix_working_set(x_shape, w1_shape, w2_shape, itemsize,
                        1) > _VMEM_BUDGET_BYTES:
        return None
    m = 1
    if hi * wi <= 64:
        for cand in (2, 4, 8, 16):
            if n % cand != 0 or _mix_working_set(
                    x_shape, w1_shape, w2_shape, itemsize,
                    cand) > _VMEM_BUDGET_BYTES:
                break
            m = cand
    return ("whole", m)


def _mix_taps(kk, pu):
    """(tap index, row offset in the pad-`pu` scratch, col offset) for a
    kk x kk SAME kernel read from the union-padded (pad 2) image."""
    off = pu - (kk - 1) // 2
    return [(ikh * kk + ikw, off + ikh, off + ikw)
            for ikh in range(kk) for ikw in range(kk)]


def _mix_fwd_kernel(x_ref, w1_ref, w2_ref, out_ref, xp_ref, *, k1, k2k,
                    heads, g, cw, ho, wo, c, hi, wi):
    _fill_padded(x_ref, xp_ref, 2, 2, hi, wi)
    out_dtype = out_ref.dtype
    for half, (w_ref, kk) in enumerate(((w1_ref, k1), (w2_ref, k2k))):
        for head in range(heads):
            acc = None
            for k, oh, ow in _mix_taps(kk, 2):
                xs = xp_ref[:, oh:oh + ho, ow:ow + wo, :].astype(jnp.float32)
                wk = _tap_weight(w_ref, None, None, head * kk * kk + k, cw)
                tap = xs * _tile_lanes(wk, g)
                acc = tap if acc is None else acc + tap
            ch0 = (half * heads + head) * c
            out_ref[:, :, :, ch0:ch0 + c] = acc.astype(out_dtype)


def _mix_dx_kernel(w1_ref, w2_ref, dy_ref, dx_ref, acc_ref, *, k1, k2k,
                   heads, g, cw, ho, wo, c, hi, wi):
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for half, (w_ref, kk) in enumerate(((w1_ref, k1), (w2_ref, k2k))):
        for head in range(heads):
            ch0 = (half * heads + head) * c
            dys = dy_ref[:, :, :, ch0:ch0 + c].astype(jnp.float32)
            for k, oh, ow in _mix_taps(kk, 2):
                wk = _tap_weight(w_ref, None, None, head * kk * kk + k, cw)
                contrib = _tile_lanes(wk, g) * dys
                cur = acc_ref[:, oh:oh + ho, ow:ow + wo, :]
                acc_ref[:, oh:oh + ho, ow:ow + wo, :] = cur + contrib
    dx_ref[...] = acc_ref[:, 2:2 + hi, 2:2 + wi, :].astype(dx_ref.dtype)


def _mix_dw_kernel(x_ref, dy_ref, dw1_ref, dw2_ref, xp_ref, *, k1, k2k,
                   heads, g, cw, ho, wo, c, hi, wi):
    _fill_padded(x_ref, xp_ref, 2, 2, hi, wi)
    for half, (dw_ref, kk) in enumerate(((dw1_ref, k1), (dw2_ref, k2k))):
        out_dtype = dw_ref.dtype
        for head in range(heads):
            ch0 = (half * heads + head) * c
            dys = dy_ref[:, :, :, ch0:ch0 + c].astype(jnp.float32)
            for k, oh, ow in _mix_taps(kk, 2):
                xs = xp_ref[:, oh:oh + ho, ow:ow + wo, :].astype(jnp.float32)
                t = xs * dys
                acc = t[:, :, :, 0:cw]
                for gi in range(1, g):
                    acc = acc + t[:, :, :, gi * cw:(gi + 1) * cw]
                kf = head * kk * kk + k
                dw_ref[:, :, :, kf * cw:(kf + 1) * cw] = acc.astype(out_dtype)


@jax.custom_vjp
def agg_core_pallas_mix(x, w1, w2):
    """Fused dual-kernel aggregation: x [N,H,W,C] with w1 (3x3 SAME) and
    w2 (5x5 SAME) -> [N,H,W,2*heads*C], kernel-major channel order.  Caller
    gates on ``mix_plan``."""
    return _mix_fwd_impl(x, w1, w2)


def _mix_geo(x, w1, w2):
    n, hi, wi, c = x.shape
    heads, cw = w1.shape[3], w1.shape[5]
    assert w1.shape[4] == 9 and w2.shape[4] == 25, "mix kernel is 3x3 + 5x5"
    assert w2.shape[3] == heads and w2.shape[5] == cw
    return dict(k1=3, k2k=5, heads=heads, g=c // cw, cw=cw,
                ho=hi, wo=wi, c=c, hi=hi, wi=wi)


def _mix_fwd_impl(x, w1, w2):
    geo = _mix_geo(x, w1, w2)
    n, hi, wi, c = x.shape
    heads = geo["heads"]
    plan = mix_plan(x.shape, w1.shape, w2.shape, x.dtype.itemsize)
    assert plan is not None, "caller must gate on mix_plan"
    m = plan[1]
    w1f, w2f = _flat_weight(w1), _flat_weight(w2)
    return pl.pallas_call(
        functools.partial(_mix_fwd_kernel, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block(w1f.shape, m),
                  _block(w2f.shape, m)],
        out_specs=_block((n, hi, wi, 2 * heads * c), m),
        out_shape=jax.ShapeDtypeStruct((n, hi, wi, 2 * heads * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, hi + 4, wi + 4, c), x.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hi * wi * heads * 34 * c,
            bytes_accessed=(x.size + w1f.size + w2f.size
                            + n * hi * wi * 2 * heads * c)
            * x.dtype.itemsize,
            transcendentals=0),
    )(x, w1f, w2f)


def _mix_fwd_rule(x, w1, w2):
    return _mix_fwd_impl(x, w1, w2), (x, w1, w2)


def _mix_bwd_rule(res, dy):
    x, w1, w2 = res
    geo = _mix_geo(x, w1, w2)
    n, hi, wi, c = x.shape
    heads = geo["heads"]
    plan = mix_plan(x.shape, w1.shape, w2.shape, x.dtype.itemsize)
    m = plan[1]
    w1f, w2f = _flat_weight(w1), _flat_weight(w2)
    dx = pl.pallas_call(
        functools.partial(_mix_dx_kernel, **geo),
        grid=(n // m,),
        in_specs=[_block(w1f.shape, m), _block(w2f.shape, m),
                  _block(dy.shape, m)],
        out_specs=_block(x.shape, m),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((m, hi + 4, wi + 4, c), jnp.float32)],
        interpret=_use_interpret(),
    )(w1f, w2f, dy)
    dw1f, dw2f = pl.pallas_call(
        functools.partial(_mix_dw_kernel, **geo),
        grid=(n // m,),
        in_specs=[_block(x.shape, m), _block(dy.shape, m)],
        out_specs=[_block(w1f.shape, m), _block(w2f.shape, m)],
        out_shape=[jax.ShapeDtypeStruct(w1f.shape, w1.dtype),
                   jax.ShapeDtypeStruct(w2f.shape, w2.dtype)],
        scratch_shapes=[pltpu.VMEM((m, hi + 4, wi + 4, c), x.dtype)],
        interpret=_use_interpret(),
    )(x, dy)
    return dx, dw1f.reshape(w1.shape), dw2f.reshape(w2.shape)


agg_core_pallas_mix.defvjp(_mix_fwd_rule, _mix_bwd_rule)
