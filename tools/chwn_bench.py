"""CHWN (batch-on-lanes) aggregation prototype — the untried formulation.

Every shipped aggregation kernel keeps C on lanes (NHWC blocks), so the
cw->c group replication (fwd/dx) and the c->cw group reduction (dw) are
lane-space shuffles the VPU serializes — measured at 10-16% of byte bound
while sitting AT the lane-op bound (STATUS.md r4 roofline table).  This
prototype moves the BATCH to lanes instead: layout [G, Cw, H, W, N] with
N=128 exactly filling the lane dim, W on sublanes, and (G, Cw, H) as major
dims.  Consequences:
  - tap shifts: H major (free) + W sublane static slices (cheap);
  - cw->c replication: indexing the w block at major dim cw — NO shuffle;
  - c->cw reduction (dw): an SSA add chain over the G major dim — NO
    lane reduction;
  - every multiply is a full 128-lane elementwise op.
The price is a pair of NHWC<->CHWN transposes at the op boundary (XLA
tiled transposes, ~2x bytes); this bench times the prototype INCLUDING
those transposes against the shipped whole-image kernels on the cotnet50
stage geometries (reference kernels: cupy_layers/aggregation_zeropad.py).

Usage: python tools/chwn_bench.py [fwd|bwd|all] [stage ...]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cotnet_tpu.ops import local_aggregate

ITERS = 20
K, D = 3, 1
_INTERP = jax.default_backend() != "tpu"
_call = functools.partial(pl.pallas_call, interpret=_INTERP)


# ---------------------------------------------------------------- kernels
def _fwd_chwn_kernel(xp_ref, w_ref, out_ref, *, kh, kw, dh, dw, g, ho, wo):
    """out[g, 0, ho, wo, n] = sum_k w[0, k, ho, wo, n]
                                    * xp[g, 0, ho+kh*dh, wo+kw*dw, n]

    Blocks: xp [G, 1(cw), Hp, Wp, N], w [1(cw), K2, Ho, Wo, N],
    out [G, 1(cw), Ho, Wo, N]; grid over cw.  All slices are major-dim
    (g, k, h) or static sublane (w) offsets — no lane ops anywhere."""
    out_dtype = out_ref.dtype
    for gi in range(g):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                xs = xp_ref[gi, 0, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = w_ref[0, k].astype(jnp.float32)
                tap = xs * wk
                acc = tap if acc is None else acc + tap
        out_ref[gi, 0] = acc.astype(out_dtype)


def _bwd_chwn_kernel(xp_ref, wp_ref, dyp_ref, dx_ref, dw_ref, *, kh, kw,
                     dh, dw, g, ho, wo, hi, wi, lh, lw):
    """Fused dx+dw in CHWN layout, gather-form dx (static shifted slices of
    the pre-padded dy/w), SSA-chain dw group reduction over the g major dim.

    Blocks: xp [Gs, 1, Hp, Wp, N], wp [1, K2, Ho+2lh, Wo+2lw, N],
    dyp [Gs, 1, Ho+2lh, Wo+2lw, N]; dx [Gs, 1, Hi, Wi, N],
    dw [1, 1, K2, Ho, Wo, N] (per-G-half partial, summed outside); grid
    (cw, G/Gs) — the G split keeps the block working set under the 16 MB
    scoped-VMEM limit — the block model excludes the ~6 MB of f32
    SSA-chain temporaries Mosaic keeps live at 28x28, hence the 9 MB
    block budget (full-G booked 16.29 MB stack at 28x28x128)."""
    out_dtype = dx_ref.dtype
    for gi in range(g):
        # dx[hi,wi] = sum_k wp[k, hi+lh-kh*dh, wi+lw-kw*dw] * dyp[same]
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
    # dw[k, ho, wo] = sum_g xp[g, ho+kh*dh, wo+kw*dw] * dy[g, ho, wo]
    dw_dtype = dw_ref.dtype
    for ikh in range(kh):
        for ikw in range(kw):
            k = ikh * kw + ikw
            red = None
            for gi in range(g):
                xs = xp_ref[gi, 0, ikh * dh:ikh * dh + ho,
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                dys = dyp_ref[gi, 0, lh:lh + ho,
                              lw:lw + wo, :].astype(jnp.float32)
                t = xs * dys
                red = t if red is None else red + t
            dw_ref[0, 0, k] = red.astype(dw_dtype)


# ------------------------------------------------------------- dispatchers
def fwd_chwn(x, w, pad):
    """x [N,H,W,C] NHWC, w [N,Ho,Wo,1,K2,Cw] -> out [N,Ho,Wo,C].
    Transposes to/from [G|Cw, ., H, W, N] inside."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    assert heads == 1
    g = c // cw
    hp, wp = hi + 2 * pad, wi + 2 * pad
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    # [N,Hp,Wp,C] -> [C,Hp,Wp,N] -> [G,Cw,Hp,Wp,N]
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, wp, n)
    # [N,Ho,Wo,1,K2,Cw] -> [Cw,K2,Ho,Wo,N]
    wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))
    kern = functools.partial(_fwd_chwn_kernel, kh=K, kw=K, dh=D, dw=D,
                             g=g, ho=ho, wo=wo)
    out_t = _call(
        kern,
        grid=(cw,),
        in_specs=[
            pl.BlockSpec((g, 1, hp, wp, n), lambda i: (0, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, ho, wo, n), lambda i: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, 1, ho, wo, n), lambda i: (0, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, ho, wo, n), x.dtype),
    )(xt, wt)
    # [G,Cw,Ho,Wo,N] -> [C,Ho,Wo,N] -> [N,Ho,Wo,C]
    return jnp.transpose(out_t.reshape(c, ho, wo, n), (3, 1, 2, 0))


def bwd_chwn(x, w, dy, pad):
    """Fused dx+dw in CHWN layout. Returns (dx [N,H,W,C], dw like w)."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    hp, wp = hi + 2 * pad, wi + 2 * pad
    lh = (K - 1) * D - pad
    lw = lh
    he, we = ho + 2 * lh, wo + 2 * lw
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, wp, n)
    dyp = jnp.pad(dy, [(0, 0), (lh, lh), (lw, lw), (0, 0)])
    dyt = jnp.transpose(dyp, (3, 1, 2, 0)).reshape(g, cw, he, we, n)
    wpad = jnp.pad(w[:, :, :, 0], [(0, 0), (lh, lh), (lw, lw), (0, 0),
                                   (0, 0)])
    wt = jnp.transpose(wpad, (4, 3, 1, 2, 0))   # [Cw,K2,He,We,N]
    # split G across the grid when the full-G working set exceeds VMEM
    gs = g
    while gs > 1 and _bwd_blocks_bytes(gs, k2, hp, wp, he, we, hi, wi, ho,
                                       wo, n, x.dtype, w.dtype) > 9 * 2**20:
        gs //= 2
    nsplit = g // gs
    kern = functools.partial(_bwd_chwn_kernel, kh=K, kw=K, dh=D, dw=D,
                             g=gs, ho=ho, wo=wo, hi=hi, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = _call(
        kern,
        grid=(cw, nsplit),
        in_specs=[
            pl.BlockSpec((gs, 1, hp, wp, n), lambda i, s: (s, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, he, we, n), lambda i, s: (i, 0, 0, 0, 0)),
            pl.BlockSpec((gs, 1, he, we, n), lambda i, s: (s, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gs, 1, hi, wi, n), lambda i, s: (s, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, ho, wo, n),
                         lambda i, s: (s, i, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cw, hi, wi, n), x.dtype),
            jax.ShapeDtypeStruct((nsplit, cw, k2, ho, wo, n), w.dtype),
        ],
    )(xt, wt, dyt)
    dx = jnp.transpose(dx_t.reshape(c, hi, wi, n), (3, 1, 2, 0))
    dw_s = dw_t[0] if nsplit == 1 else jnp.sum(
        dw_t.astype(jnp.float32), axis=0).astype(w.dtype)
    dw = jnp.transpose(dw_s, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dw


def fwd_chwn_packed(x, w, pad, pack=2):
    """N=64 form (VERDICT r4 #2): pack ``pack`` channel-GROUPS into the
    128-lane dim (lane = g_half*64 + n) so every lane op runs full-width.
    The kernels are reused unchanged with a virtual N = pack*64; w is
    lane-duplicated in XLA (w[..., lane % 64]) — trivial extra HBM bytes —
    so no in-kernel lane shuffle appears anywhere."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    assert g % pack == 0 and heads == 1
    gp = g // pack
    nv = n * pack
    hp, wp = hi + 2 * pad, wi + 2 * pad
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    # [N,Hp,Wp,C] -> [G,Cw,Hp,Wp,N] -> [pack,Gp,Cw,Hp,Wp,N] -> lanes (pack,N)
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(pack, gp, cw, hp, wp, n)
    xt = jnp.transpose(xt, (1, 2, 3, 4, 0, 5)).reshape(gp, cw, hp, wp, nv)
    wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))   # [Cw,K2,Ho,Wo,N]
    wt = jnp.concatenate([wt] * pack, axis=-1)           # duplicate lanes
    kern = functools.partial(_fwd_chwn_kernel, kh=K, kw=K, dh=D, dw=D,
                             g=gp, ho=ho, wo=wo)
    out_t = _call(
        kern,
        grid=(cw,),
        in_specs=[
            pl.BlockSpec((gp, 1, hp, wp, nv), lambda i: (0, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, ho, wo, nv), lambda i: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gp, 1, ho, wo, nv),
                               lambda i: (0, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gp, cw, ho, wo, nv), x.dtype),
    )(xt, wt)
    # [Gp,Cw,Ho,Wo,pack*N] -> [G,Cw,Ho,Wo,N] -> NHWC
    out_t = out_t.reshape(gp, cw, ho, wo, pack, n)
    out_t = jnp.transpose(out_t, (4, 0, 1, 2, 3, 5)).reshape(c, ho, wo, n)
    return jnp.transpose(out_t, (3, 1, 2, 0))


def bwd_chwn_packed(x, w, dy, pad, pack=2):
    """Packed-N64 fused dx+dw: kernels unchanged; the dw lane halves hold
    different g partials and fold in XLA after the launch."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    gp = g // pack
    nv = n * pack
    hp, wp = hi + 2 * pad, wi + 2 * pad
    lh = (K - 1) * D - pad
    lw = lh
    he, we = ho + 2 * lh, wo + 2 * lw

    def to_packed(t, ph, pw):
        tp = jnp.pad(t, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
        hh, ww = tp.shape[1], tp.shape[2]
        tt = jnp.transpose(tp, (3, 1, 2, 0)).reshape(pack, gp, cw, hh, ww, n)
        return jnp.transpose(tt, (1, 2, 3, 4, 0, 5)).reshape(
            gp, cw, hh, ww, nv)

    xt = to_packed(x, pad, pad)
    dyt = to_packed(dy, lh, lw)
    wpad = jnp.pad(w[:, :, :, 0], [(0, 0), (lh, lh), (lw, lw), (0, 0),
                                   (0, 0)])
    wt = jnp.transpose(wpad, (4, 3, 1, 2, 0))
    wt = jnp.concatenate([wt] * pack, axis=-1)
    gs = gp
    while gs > 1 and _bwd_blocks_bytes(gs, k2, hp, wp, he, we, hi, wi, ho,
                                       wo, nv, x.dtype, w.dtype) > 9 * 2**20:
        gs //= 2
    nsplit = gp // gs
    kern = functools.partial(_bwd_chwn_kernel, kh=K, kw=K, dh=D, dw=D,
                             g=gs, ho=ho, wo=wo, hi=hi, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = _call(
        kern,
        grid=(cw, nsplit),
        in_specs=[
            pl.BlockSpec((gs, 1, hp, wp, nv), lambda i, s: (s, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, he, we, nv), lambda i, s: (i, 0, 0, 0, 0)),
            pl.BlockSpec((gs, 1, he, we, nv), lambda i, s: (s, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gs, 1, hi, wi, nv), lambda i, s: (s, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, ho, wo, nv),
                         lambda i, s: (s, i, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, cw, hi, wi, nv), x.dtype),
            jax.ShapeDtypeStruct((nsplit, cw, k2, ho, wo, nv), w.dtype),
        ],
    )(xt, wt, dyt)
    dx_t = dx_t.reshape(gp, cw, hi, wi, pack, n)
    dx_t = jnp.transpose(dx_t, (4, 0, 1, 2, 3, 5)).reshape(c, hi, wi, n)
    dx = jnp.transpose(dx_t, (3, 1, 2, 0))
    # fold the G split AND the lane halves in f32
    dw_f = dw_t.astype(jnp.float32).reshape(nsplit, cw, k2, ho, wo, pack, n)
    dw_s = jnp.sum(dw_f, axis=(0, 5)).astype(w.dtype)
    dw = jnp.transpose(dw_s, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dw


def _bwd_blocks_bytes(gs, k2, hp, wp, he, we, hi, wi, ho, wo, n, xdt, wdt):
    """Crude block working-set model (sublane pad to 8) for the G split."""
    def tb(shape, it):
        pad = list(shape)
        pad[-2] = (pad[-2] + 7) // 8 * 8
        sz = it
        for d in pad:
            sz *= d
        return sz
    xi = jnp.dtype(xdt).itemsize
    wi_ = jnp.dtype(wdt).itemsize
    return (tb((gs, 1, hp, wp, n), xi) + tb((1, k2, he, we, n), wi_)
            + tb((gs, 1, he, we, n), xi) + tb((gs, 1, hi, wi, n), xi)
            + tb((1, 1, k2, ho, wo, n), wi_))


# ------------------------------------------------------------------ timing
def chain_time(fn, seed, *args):
    @jax.jit
    def chain(x0, *a):
        def body(_, xx):
            out = fn(xx, *a)
            flat = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in flat)
            bump = jnp.where(jnp.isnan(s), 1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x0)

    out = chain(seed, *args)
    np.asarray(out.ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(seed, *args)
        np.asarray(out.ravel()[0])
        ts.append((time.perf_counter() - t0) / ITERS)
    ts.sort()
    return ts[1]


def run_stage(n, h, c, dtype=jnp.bfloat16, do_fwd=True, do_bwd=True):
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)

    agg = functools.partial(local_aggregate, kernel_size=K, stride=1,
                            padding=pad, dilation=D)

    # parity vs the shipped pallas path (itself oracle-gated in tests)
    ref = jax.jit(functools.partial(agg, impl="pallas"))(x, w)
    got = jax.jit(functools.partial(fwd_chwn, pad=pad))(x, w)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(f"[{h}x{h}x{c}] fwd parity maxerr {err:.3e} (rel {err/scale:.1e})",
          flush=True)

    if do_fwd:
        t_ship = chain_time(lambda xx: agg(xx, w, impl="pallas"), x)
        t_chwn = chain_time(lambda xx: fwd_chwn(xx, w, pad), x)
        print(f"[{h}x{h}x{c} n{n}] FWD shipped {t_ship*1e3:7.3f} ms | "
              f"chwn {t_chwn*1e3:7.3f} ms | ratio "
              f"{t_ship/t_chwn:5.2f}x", flush=True)
        if n == 64 and (c // 8) >= 2:
            gotp = jax.jit(functools.partial(fwd_chwn_packed, pad=pad))(x, w)
            ep = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                       - gotp.astype(jnp.float32))))
            t_pack = chain_time(lambda xx: fwd_chwn_packed(xx, w, pad), x)
            print(f"[{h}x{h}x{c} n{n}] FWD packed {t_pack*1e3:7.3f} ms "
                  f"(parity {ep:.2e}) | vs shipped "
                  f"{t_ship/t_pack:5.2f}x | vs chwn "
                  f"{t_chwn/t_pack:5.2f}x", flush=True)

    if do_bwd:
        # shipped: vjp of the pallas op (fused dx+dw dispatch, default-ON)
        def ship_pair(dy_):
            f = lambda xx, ww: agg(xx, ww, impl="pallas")
            _, vjp = jax.vjp(f, x, w)
            return vjp(dy_)

        dxr, dwr = jax.jit(ship_pair)(dy)
        dxg, dwg = jax.jit(functools.partial(bwd_chwn, pad=pad))(x, w, dy)
        e_dx = float(jnp.max(jnp.abs(dxr.astype(jnp.float32)
                                     - dxg.astype(jnp.float32))))
        e_dw = float(jnp.max(jnp.abs(dwr.astype(jnp.float32)
                                     - dwg.astype(jnp.float32))))
        print(f"[{h}x{h}x{c}] bwd parity dx {e_dx:.3e} dw {e_dw:.3e}",
              flush=True)
        t_ship = chain_time(ship_pair, dy)
        t_chwn = chain_time(lambda dd: bwd_chwn(x, w, dd, pad), dy)
        print(f"[{h}x{h}x{c} n{n}] BWD shipped {t_ship*1e3:7.3f} ms | "
              f"chwn {t_chwn*1e3:7.3f} ms | ratio "
              f"{t_ship/t_chwn:5.2f}x", flush=True)
        if n == 64 and (c // 8) >= 2:
            dxp, dwp = jax.jit(
                functools.partial(bwd_chwn_packed, pad=pad))(x, w, dy)
            e_dxp = float(jnp.max(jnp.abs(dxr.astype(jnp.float32)
                                          - dxp.astype(jnp.float32))))
            e_dwp = float(jnp.max(jnp.abs(dwr.astype(jnp.float32)
                                          - dwp.astype(jnp.float32))))
            t_pack = chain_time(lambda dd: bwd_chwn_packed(x, w, dd, pad),
                                dy)
            print(f"[{h}x{h}x{c} n{n}] BWD packed {t_pack*1e3:7.3f} ms "
                  f"(parity dx {e_dxp:.2e} dw {e_dwp:.2e}) | vs shipped "
                  f"{t_ship/t_pack:5.2f}x | vs chwn "
                  f"{t_chwn/t_pack:5.2f}x", flush=True)


def _fwd_chwn_strip_kernel(xp_ref, w_ref, out_ref, *, kh, kw, dh, dw, gs,
                           hs, wo):
    """Stage-1 form: xp stays FULLY resident per (cw, g) block (0.9 MB at
    56x56x128n) while w/out are H-strips — the K2 weight block alone (~8 MB)
    is what excludes stage 1 from the whole-image CHWN plan.  H offsets are
    dynamic (program_id); W offsets static."""
    i = pl.program_id(2)
    out_dtype = out_ref.dtype
    for gi in range(gs):
        acc = None
        for ikh in range(kh):
            for ikw in range(kw):
                k = ikh * kw + ikw
                xs = xp_ref[gi, 0, pl.dslice(i * hs + ikh * dh, hs),
                            ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
                wk = w_ref[0, k].astype(jnp.float32)
                tap = xs * wk
                acc = tap if acc is None else acc + tap
        out_ref[gi, 0] = acc.astype(out_dtype)


def fwd_chwn_strip(x, w, pad, hs=8, gs=1):
    """CHWN forward with H-strips for the 56x56 stage-1 geometry.
    ``gs`` groups per block: the w strip is refetched per (g-block, strip),
    so gs=2 halves the w refetch traffic at 2x the xp block."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    hp, wp = hi + 2 * pad, wi + 2 * pad
    assert ho % hs == 0 and g % gs == 0
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, wp, n)
    wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))
    kern = functools.partial(_fwd_chwn_strip_kernel, kh=K, kw=K, dh=D, dw=D,
                             gs=gs, hs=hs, wo=wo)
    out_t = _call(
        kern,
        grid=(cw, g // gs, ho // hs),
        in_specs=[
            pl.BlockSpec((gs, 1, hp, wp, n),
                         lambda i, s, j: (s, i, 0, 0, 0)),
            pl.BlockSpec((1, k2, hs, wo, n),
                         lambda i, s, j: (i, 0, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gs, 1, hs, wo, n),
                               lambda i, s, j: (s, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, ho, wo, n), x.dtype),
    )(xt, wt)
    return jnp.transpose(out_t.reshape(c, ho, wo, n), (3, 1, 2, 0))


def _bwd_chwn_strip_kernel(xp_ref, wp_ref, dyp_ref, dx_ref, dw_ref, *, kh,
                           kw, dh, dw, hs, wo, wi, lh, lw):
    """Stage-1 fused dx+dw, H-strips, per-(cw, g, strip) grid: every input
    arrives as a PRE-MATERIALIZED overlapping strip (rows
    [j*hs : j*hs + hs + 2lh] duplicated by XLA — Pallas double-buffers
    each block, so a full-H wp block alone blows scoped VMEM 2x over).
    All offsets static.  dw written as per-g f32 partials, folded outside."""
    out_dtype = dx_ref.dtype
    acc = None
    for ikh in range(kh):
        for ikw in range(kw):
            sh = (kh - 1) * dh - ikh * dh
            sw = (kw - 1) * dw - ikw * dw
            dys = dyp_ref[0, 0, 0, sh:sh + hs,
                          sw:sw + wi, :].astype(jnp.float32)
            wk = wp_ref[0, 0, ikh * kw + ikw, sh:sh + hs,
                        sw:sw + wi, :].astype(jnp.float32)
            tap = dys * wk
            acc = tap if acc is None else acc + tap
    dx_ref[0, 0] = acc.astype(out_dtype)
    dw_dtype = dw_ref.dtype
    for ikh in range(kh):
        for ikw in range(kw):
            k = ikh * kw + ikw
            xs = xp_ref[0, 0, 0, ikh * dh:ikh * dh + hs,
                        ikw * dw:ikw * dw + wo, :].astype(jnp.float32)
            dys = dyp_ref[0, 0, 0, lh:lh + hs,
                          lw:lw + wo, :].astype(jnp.float32)
            dw_ref[0, 0, k] = (xs * dys).astype(dw_dtype)


def _h_strips(t, axis, hs, halo, nh):
    """Stack overlapping H-strips [j*hs : j*hs + hs + 2*halo] along a new
    leading-at-`axis` dim (XLA copies; bytes x (hs+2*halo)/hs)."""
    sl = [slice(None)] * t.ndim
    parts = []
    for j in range(nh):
        sl[axis] = slice(j * hs, j * hs + hs + 2 * halo)
        parts.append(t[tuple(sl)])
    return jnp.stack(parts, axis=0)


def bwd_chwn_strip(x, w, dy, pad, hs=8):
    """Stage-1 fused dx+dw, H-strips, per-group grid; dw partials summed
    over g in f32 outside the launch."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    lh = (K - 1) * D - pad
    lw = lh
    assert hi % hs == 0 and pad == lh, (hi, hs, pad, lh)
    nh = hi // hs
    hw = hs + 2 * lh
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hi + 2 * pad,
                                                 wi + 2 * pad, n)
    dyp = jnp.pad(dy, [(0, 0), (lh, lh), (lw, lw), (0, 0)])
    dyt = jnp.transpose(dyp, (3, 1, 2, 0)).reshape(g, cw, ho + 2 * lh,
                                                   wo + 2 * lw, n)
    wpad = jnp.pad(w[:, :, :, 0], [(0, 0), (lh, lh), (lw, lw), (0, 0),
                                   (0, 0)])
    wt = jnp.transpose(wpad, (4, 3, 1, 2, 0))
    # -> [NH, G, Cw, hs+2lh, Wp, N] / [NH, Cw, K2, hs+2lh, We, N]
    xs_t = _h_strips(xt, 2, hs, lh, nh)
    dys_t = _h_strips(dyt, 2, hs, lh, nh)
    ws_t = _h_strips(wt, 2, hs, lh, nh)
    we = wo + 2 * lw
    wp_ = wi + 2 * pad
    kern = functools.partial(_bwd_chwn_strip_kernel, kh=K, kw=K, dh=D, dw=D,
                             hs=hs, wo=wo, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = _call(
        kern,
        grid=(cw, g, nh),
        in_specs=[
            pl.BlockSpec((1, 1, 1, hw, wp_, n),
                         lambda i, s, j: (j, s, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, hw, we, n),
                         lambda i, s, j: (j, i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, hw, we, n),
                         lambda i, s, j: (j, s, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, hs, wi, n),
                         lambda i, s, j: (s, i, j, 0, 0)),
            pl.BlockSpec((1, 1, k2, hs, wo, n),
                         lambda i, s, j: (s, i, 0, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cw, hi, wi, n), x.dtype),
            # f32 partials: per-g rounding would otherwise stack 8 deep
            jax.ShapeDtypeStruct((g, cw, k2, ho, wo, n), jnp.float32),
        ],
    )(xs_t, ws_t, dys_t)
    dx = jnp.transpose(dx_t.reshape(c, hi, wi, n), (3, 1, 2, 0))
    dw_s = jnp.sum(dw_t, axis=0).astype(w.dtype)
    dw = jnp.transpose(dw_s, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dw


def _bwd_chwn_strip_g_kernel(xs_ref, ws_ref, dys_ref, dx_ref, dw_ref, *,
                             kh, kw, dh, dw, hs, g, wo, wi, lh, lw):
    """Stage-1 fused dx+dw, H-strips, g-reduction IN-KERNEL: grid (cw, nh)
    only — unlike _bwd_chwn_strip_kernel's (cw, g, nh) grid, the w strip is
    read ONCE per strip (not once per group: 8x less w traffic at stage 1)
    and dw leaves complete (f32 SSA chain over g inside the block), so the
    per-g f32 partial tensor (16x the final dw bytes at g=8) never exists.
    Traffic model at 56x56x64 bs128 hs=4: ~350 MB total vs ~1.5 GB for the
    per-g-grid form that measured 0.72x.  All inputs arrive as
    pre-materialized overlapping strips (bytes x (hs+2)/hs); offsets static.
    """
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


def bwd_chwn_strip_g(x, w, dy, pad, hs=4):
    """Stage-1 fused dx+dw, H-strips with the g loop inside the kernel
    (grid (cw, nh)); dw complete per strip — no partials, no w refetch."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    lh = (K - 1) * D - pad
    lw = lh
    assert hi % hs == 0 and pad == lh, (hi, hs, pad, lh)
    nh = hi // hs
    hw = hs + 2 * lh
    wp_ = wi + 2 * pad
    we = wo + 2 * lw
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hi + 2 * pad,
                                                 wp_, n)
    dyp = jnp.pad(dy, [(0, 0), (lh, lh), (lw, lw), (0, 0)])
    dyt = jnp.transpose(dyp, (3, 1, 2, 0)).reshape(g, cw, ho + 2 * lh,
                                                   we, n)
    wpad = jnp.pad(w[:, :, :, 0], [(0, 0), (lh, lh), (lw, lw), (0, 0),
                                   (0, 0)])
    wt = jnp.transpose(wpad, (4, 3, 1, 2, 0))
    # -> [NH, G, Cw, hw, Wp, N] / [NH, Cw, K2, hw, We, N]
    xs_t = _h_strips(xt, 2, hs, pad, nh)
    dys_t = _h_strips(dyt, 2, hs, lh, nh)
    ws_t = _h_strips(wt, 2, hs, lh, nh)
    kern = functools.partial(_bwd_chwn_strip_g_kernel, kh=K, kw=K, dh=D,
                             dw=D, hs=hs, g=g, wo=wo, wi=wi, lh=lh, lw=lw)
    dx_t, dw_t = _call(
        kern,
        grid=(cw, nh),
        in_specs=[
            pl.BlockSpec((1, g, 1, hw, wp_, n),
                         lambda i, j: (j, 0, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, k2, hw, we, n),
                         lambda i, j: (j, i, 0, 0, 0, 0)),
            pl.BlockSpec((1, g, 1, hw, we, n),
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
    )(xs_t, ws_t, dys_t)
    dx = jnp.transpose(dx_t.reshape(c, hi, wi, n), (3, 1, 2, 0))
    dw = jnp.transpose(dw_t, (4, 2, 3, 1, 0))[:, :, :, None]
    return dx, dw


def run_stage1_bwd_g(n, h, c, dtype=jnp.bfloat16, hss=(2, 4, 7)):
    """Shootout: shipped stage-1 backward (XLA gather-VJP) vs the in-kernel
    g-reduction strip form at several strip heights."""
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)
    agg = functools.partial(local_aggregate, kernel_size=K, stride=1,
                            padding=pad, dilation=D)

    def ship_pair(dy_):
        f = lambda xx, ww: agg(xx, ww, impl="auto")
        _, vjp = jax.vjp(f, x, w)
        return vjp(dy_)

    dxr, dwr = jax.jit(ship_pair)(dy)
    t_ship = chain_time(ship_pair, dy)
    print(f"[{h}x{h}x{c} n{n}] BWD shipped {t_ship*1e3:7.3f} ms",
          flush=True)
    for hs in hss:
        if h % hs:
            continue
        dxg, dwg = jax.jit(
            functools.partial(bwd_chwn_strip_g, pad=pad, hs=hs))(x, w, dy)
        e_dx = float(jnp.max(jnp.abs(dxr.astype(jnp.float32)
                                     - dxg.astype(jnp.float32))))
        e_dw = float(jnp.max(jnp.abs(dwr.astype(jnp.float32)
                                     - dwg.astype(jnp.float32))))
        t_g = chain_time(lambda dd: bwd_chwn_strip_g(x, w, dd, pad, hs), dy)
        print(f"[{h}x{h}x{c} n{n} hs{hs}] BWD strip-g {t_g*1e3:7.3f} ms "
              f"(parity dx {e_dx:.2e} dw {e_dw:.2e}) | vs shipped "
              f"{t_ship/t_g:5.2f}x", flush=True)


def run_stage1(n, h, c, hs=8, dtype=jnp.bfloat16):
    """Stage-1 shootout: XLA incumbent (what ships at 56x56) vs the CHWN
    H-strip forms."""
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)
    agg = functools.partial(local_aggregate, kernel_size=K, stride=1,
                            padding=pad, dilation=D)

    ref = jax.jit(functools.partial(agg, impl="auto"))(x, w)
    got = jax.jit(functools.partial(fwd_chwn_strip, pad=pad, hs=hs))(x, w)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"[{h}x{h}x{c} n{n} hs{hs}] fwd strip parity maxerr {err:.3e}",
          flush=True)
    t_ship = chain_time(lambda xx: agg(xx, w, impl="auto"), x)
    t_chwn = chain_time(lambda xx: fwd_chwn_strip(xx, w, pad, hs), x)
    print(f"[{h}x{h}x{c} n{n} hs{hs}] FWD shipped {t_ship*1e3:7.3f} ms | "
          f"chwn-strip {t_chwn*1e3:7.3f} ms | ratio {t_ship/t_chwn:5.2f}x",
          flush=True)
    for gs in (2, 4):
        if (c // 8) % gs:
            continue
        gotg = jax.jit(
            functools.partial(fwd_chwn_strip, pad=pad, hs=hs, gs=gs))(x, w)
        eg = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                   - gotg.astype(jnp.float32))))
        t_g = chain_time(lambda xx: fwd_chwn_strip(xx, w, pad, hs, gs), x)
        print(f"[{h}x{h}x{c} n{n} hs{hs}] FWD strip gs{gs} {t_g*1e3:7.3f} ms"
              f" (parity {eg:.1e}) | vs gs1 {t_chwn/t_g:5.2f}x", flush=True)

    def ship_pair(dy_):
        f = lambda xx, ww: agg(xx, ww, impl="auto")
        _, vjp = jax.vjp(f, x, w)
        return vjp(dy_)

    dxr, dwr = jax.jit(ship_pair)(dy)
    dxg, dwg = jax.jit(
        functools.partial(bwd_chwn_strip, pad=pad, hs=hs))(x, w, dy)
    e_dx = float(jnp.max(jnp.abs(dxr.astype(jnp.float32)
                                 - dxg.astype(jnp.float32))))
    e_dw = float(jnp.max(jnp.abs(dwr.astype(jnp.float32)
                                 - dwg.astype(jnp.float32))))
    print(f"[{h}x{h}x{c} n{n} hs{hs}] bwd strip parity dx {e_dx:.3e} "
          f"dw {e_dw:.3e}", flush=True)
    t_ship = chain_time(ship_pair, dy)
    t_chwn = chain_time(lambda dd: bwd_chwn_strip(x, w, dd, pad, hs), dy)
    print(f"[{h}x{h}x{c} n{n} hs{hs}] BWD shipped {t_ship*1e3:7.3f} ms | "
          f"chwn-strip {t_chwn*1e3:7.3f} ms | ratio {t_ship/t_chwn:5.2f}x",
          flush=True)


def run_transpose(n, h, c):
    """Boundary-transpose cost in isolation: the NHWC->CHWN pad+transpose
    of x, the w transpose, and the CHWN->NHWC out transpose — the bytes a
    block-resident CHWN pipeline would NOT pay (VERDICT r4 #2)."""
    cw = c // 8
    g = c // cw
    pad = K // 2
    kx, kw_ = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(kx, (n, h, h, c), jnp.bfloat16)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), jnp.bfloat16)

    def x_round_trip(xx):
        hp = h + 2 * pad
        xp = jnp.pad(xx, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, hp, n)
        back = jnp.transpose(
            (xt[:, :, pad:pad + h, pad:pad + h] * 1.000001).reshape(
                c, h, h, n), (3, 1, 2, 0))
        return back

    def w_one_way(xx):
        # w transpose feeds the kernel; fold its cost into an x-shaped
        # carry so the chain stays well-typed
        wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))
        s = jnp.sum(wt.astype(jnp.float32)) * 1e-20
        return xx + s.astype(xx.dtype)

    t_x = chain_time(x_round_trip, x)
    t_w = chain_time(w_one_way, x)
    print(f"[{h}x{h}x{c} n{n}] TRANSPOSE x round-trip {t_x*1e3:7.3f} ms | "
          f"w one-way {t_w*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    stages = [s for s in sys.argv[2:]] or ["28", "14", "7"]
    geo = {"28": (128, 28, 128), "14": (128, 14, 256), "7": (128, 7, 512),
           "tiny": (8, 6, 16),
           # flagship cells (VERDICT r4 #2): the @320 stage-4 10x10 map and
           # the @320-train bs64 forms (lanes half-filled)
           "20": (128, 20, 256), "16": (128, 16, 256), "10": (128, 10, 512),
           "20n64": (64, 20, 256), "10n64": (64, 10, 512),
           "28n64": (64, 28, 128), "14n64": (64, 14, 256)}
    print(f"devices: {jax.devices()}", flush=True)
    for s in stages:
        if mode == "s1":
            # stage-1 H-strip forms: s is the strip height
            geo1 = {"tiny": (8, 8, 16)}
            n, h, c = geo1.get(s, (128, 56, 64))
            run_stage1(n, h, c, hs=int(s) if s.isdigit() else 4)
            continue
        if mode == "s1bwdg":
            # in-kernel-g-reduction strip backward: remaining args are the
            # strip heights to sweep (one shipped-pair timing, one sweep)
            geo1 = {"tiny": (8, 8, 16)}
            n, h, c = geo1.get(s, (128, 56, 64))
            hss = tuple(int(a) for a in stages if a.isdigit()) or (2, 4, 7)
            run_stage1_bwd_g(n, h, c, hss=hss)
            break
        n, h, c = geo[s]
        if mode == "trans":
            run_transpose(n, h, c)
            continue
        run_stage(n, h, c, do_fwd=mode in ("fwd", "all"),
                  do_bwd=mode in ("bwd", "all"))
