"""Stage-1 (56x56) CHWN aggregation prototype: K-row-split grid + f32
scratch accumulation.

Stage 1 is the one cotnet map where every Pallas formulation has lost to
XLA across r1-r3 (whole-image NHWC needs ~30 MB scoped VMEM; halo strips
measured 3.04/7.75 vs XLA 2.81/6.36).  The CHWN layout (see chwn_bench.py)
can't hold the whole [1, K2, 56, 64, 128] weight block either (~8.3 MB),
so these kernels split K2 across the grid BY KERNEL ROW: each step handles
the kw taps of row ikh = program_id, so the H shift is a dynamic pl.ds
offset (allowed on the untiled H dim) while every W shift stays a static
sublane slice.  Partial tap sums accumulate in a persistent f32 VMEM
scratch; the output block flushes on the last K-row step.

  fwd: grid (cw, g, kh) — w blocks [1, kw, Ho, Wo, N]; xp resident per g
  dx:  grid (cw, g, kh) — wp blocks [1, kw, He, We, N]; dyp resident
  dw:  grid (cw, kh, g) — dw blocks [1, kw, Ho, Wo, N] accumulated across
       the inner g steps in scratch (xp/dy re-DMA once per K-row)

Usage: python tools/chwn_s1_bench.py [fwd|dx|dw|all]
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


def _fwd_s1_kernel(xp_ref, w_ref, out_ref, acc_ref, *, kh, kw, dh, dw,
                   ho, wo):
    """One (cw, g) output channel; grid dim 2 = kernel row ikh.  The H tap
    shift rides pl.ds on the untiled H dim; W shifts are static."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    row = None
    for j in range(kw):
        xs = xp_ref[0, 0, pl.ds(ki * dh, ho),
                    j * dw:j * dw + wo, :].astype(jnp.float32)
        wk = w_ref[0, j].astype(jnp.float32)
        t = xs * wk
        row = t if row is None else row + t
    acc_ref[...] += row[None, None]

    @pl.when(ki == kh - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def fwd_s1(x, w, pad):
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    assert heads == 1 and k2 == K * K
    g = c // cw
    hp, wp = hi + 2 * pad, wi + 2 * pad
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, wp, n)
    wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))  # [Cw,K2,Ho,Wo,N]
    kern = functools.partial(_fwd_s1_kernel, kh=K, kw=K, dh=D, dw=D,
                             ho=ho, wo=wo)
    out_t = _call(
        kern,
        grid=(cw, g, K),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp, n),
                         lambda i, g_, k_: (g_, i, 0, 0, 0)),
            pl.BlockSpec((1, K, ho, wo, n),
                         lambda i, g_, k_: (i, k_, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo, n),
                               lambda i, g_, k_: (g_, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, ho, wo, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, 1, ho, wo, n), jnp.float32)],
    )(xt, wt)
    return jnp.transpose(out_t.reshape(c, ho, wo, n), (3, 1, 2, 0))


def _dx_s1_kernel(wp_ref, dyp_ref, dx_ref, acc_ref, *, kh, kw, dh, dw,
                  hi, wi):
    """Gather-form dx row step: for kernel row ikh = program_id(2) the H
    source offset is (kh-1-ikh)*dh — dynamic on the untiled dim."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    sh = (kh - 1 - ki) * dh
    row = None
    for j in range(kw):
        sw = (kw - 1) * dw - j * dw
        dys = dyp_ref[0, 0, pl.ds(sh, hi),
                      sw:sw + wi, :].astype(jnp.float32)
        wk = wp_ref[0, j, pl.ds(sh, hi),
                    sw:sw + wi, :].astype(jnp.float32)
        t = dys * wk
        row = t if row is None else row + t
    acc_ref[...] += row[None, None]

    @pl.when(ki == kh - 1)
    def _flush():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def dx_s1(x_shape, w, dy, pad):
    n, hi, wi, c = x_shape
    _, ho, wo, heads, k2, cw = w.shape
    g = c // cw
    lh = (K - 1) * D - pad
    he, we = ho + 2 * lh, wo + 2 * lh
    dyp = jnp.pad(dy, [(0, 0), (lh, lh), (lh, lh), (0, 0)])
    dyt = jnp.transpose(dyp, (3, 1, 2, 0)).reshape(g, cw, he, we, n)
    wpad = jnp.pad(w[:, :, :, 0], [(0, 0), (lh, lh), (lh, lh), (0, 0),
                                   (0, 0)])
    wt = jnp.transpose(wpad, (4, 3, 1, 2, 0))
    kern = functools.partial(_dx_s1_kernel, kh=K, kw=K, dh=D, dw=D,
                             hi=hi, wi=wi)
    dx_t = _call(
        kern,
        grid=(cw, g, K),
        in_specs=[
            pl.BlockSpec((1, K, he, we, n),
                         lambda i, g_, k_: (i, k_, 0, 0, 0)),
            pl.BlockSpec((1, 1, he, we, n),
                         lambda i, g_, k_: (g_, i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hi, wi, n),
                               lambda i, g_, k_: (g_, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cw, hi, wi, n), dy.dtype),
        scratch_shapes=[pltpu.VMEM((1, 1, hi, wi, n), jnp.float32)],
    )(wt, dyt)
    return jnp.transpose(dx_t.reshape(c, hi, wi, n), (3, 1, 2, 0))


def _dw_s1_kernel(xp_ref, dy_ref, dw_ref, acc_ref, *, kh, kw, dh, dw,
                  ho, wo, g):
    """dw K-row block accumulated over the inner g grid dim; the H tap
    shift for row ikh = program_id(1) is again a dynamic pl.ds offset."""
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ki = pl.program_id(1)
    dys = dy_ref[0, 0].astype(jnp.float32)
    for j in range(kw):
        xs = xp_ref[0, 0, pl.ds(ki * dh, ho),
                    j * dw:j * dw + wo, :].astype(jnp.float32)
        acc_ref[0, j] += xs * dys

    @pl.when(gi == g - 1)
    def _flush():
        dw_ref[...] = acc_ref[...].astype(dw_ref.dtype)


def dw_s1(x, w_shape, dy, pad):
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w_shape
    g = c // cw
    hp, wp = hi + 2 * pad, wi + 2 * pad
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    xt = jnp.transpose(xp, (3, 1, 2, 0)).reshape(g, cw, hp, wp, n)
    dyt = jnp.transpose(dy, (3, 1, 2, 0)).reshape(g, cw, ho, wo, n)
    kern = functools.partial(_dw_s1_kernel, kh=K, kw=K, dh=D, dw=D,
                             ho=ho, wo=wo, g=g)
    dw_t = _call(
        kern,
        grid=(cw, K, g),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp, n),
                         lambda i, k_, g_: (g_, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, ho, wo, n),
                         lambda i, k_, g_: (g_, i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, ho, wo, n),
                               lambda i, k_, g_: (i, k_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((cw, k2, ho, wo, n), dy.dtype),
        scratch_shapes=[pltpu.VMEM((1, K, ho, wo, n), jnp.float32)],
    )(xt, dyt)
    # [Cw,K2,Ho,Wo,N] -> [N,Ho,Wo,1,K2,Cw]
    return jnp.transpose(dw_t, (4, 2, 3, 1, 0))[:, :, :, None]


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


def main(mode, n=128, h=56, c=64, dtype=jnp.bfloat16):
    if _INTERP:
        n, h, c, dtype = 8, 10, 16, jnp.float32
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)

    agg = functools.partial(local_aggregate, kernel_size=K, stride=1,
                            padding=pad, dilation=D)

    def ship_vjp(dy_):
        _, vjp = jax.vjp(lambda xx, ww: agg(xx, ww, impl="pallas"), x, w)
        return vjp(dy_)

    def rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))

    if mode in ("fwd", "all"):
        ref = jax.jit(functools.partial(agg, impl="xla"))(x, w)
        got = jax.jit(functools.partial(fwd_s1, pad=pad))(x, w)
        print(f"s1 fwd parity rel {rel(ref, got):.2e}", flush=True)
        t0 = chain_time(lambda xx: agg(xx, w, impl="pallas"), x)
        t1 = chain_time(lambda xx: fwd_s1(xx, w, pad), x)
        print(f"s1 FWD ship {t0*1e3:7.3f} ms | chwn-ks {t1*1e3:7.3f} ms | "
              f"{t0/t1:5.2f}x", flush=True)

    dxr, dwr = jax.jit(ship_vjp)(dy)
    if mode in ("dx", "all"):
        got = jax.jit(functools.partial(dx_s1, x.shape, pad=pad))(w, dy)
        print(f"s1 dx parity rel {rel(dxr, got):.2e}", flush=True)
        t1 = chain_time(lambda dd: dx_s1(x.shape, w, dd, pad), dy)
        print(f"s1 DX  chwn-ks {t1*1e3:7.3f} ms", flush=True)
    if mode in ("dw", "all"):
        got = jax.jit(functools.partial(dw_s1, x, w.shape, pad=pad))(dy)
        print(f"s1 dw parity rel {rel(dwr, got):.2e}", flush=True)
        t1 = chain_time(lambda dd: dw_s1(x, w.shape, dd, pad), dy)
        print(f"s1 DW  chwn-ks {t1*1e3:7.3f} ms", flush=True)
    if mode == "all":
        t_pair = chain_time(ship_vjp, dy)
        t_chwn = chain_time(
            lambda dd: (dx_s1(x.shape, w, dd, pad),
                        dw_s1(x, w.shape, dd, pad)), dy)
        print(f"s1 BWD-PAIR ship {t_pair*1e3:7.3f} ms | chwn-ks "
              f"{t_chwn*1e3:7.3f} ms | {t_pair/t_chwn:5.2f}x", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
