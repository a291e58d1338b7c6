"""Backward-pair shootout: the shipped two-launch dispatch (gather/scatter
dx + dot/slice dw) vs the single-launch fused dx+dw kernel (COTNET_FUSED_BWD),
isolated per cotnet50 stage, chained timing at bs128 bf16.

The fused kernel reads dy from HBM once (the pair's largest shared input)
and runs both grads in one grid step per image — VERDICT r3 #1's named
untried lever.  Also prints a floor estimate: bytes the pair must move at
the measured ~127 GB/s elementwise envelope.
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

import cotnet_tpu.ops.local_agg_pallas as lap

ITERS = 20
K, D = 3, 1
HBM_GBPS = 127.0


def chain_time(fn, seed_x, *args):
    @jax.jit
    def chain(x0, *a):
        def body(_, xx):
            out = fn(xx, *a)
            bump = jnp.where(jnp.isnan(jnp.sum(out.astype(jnp.float32))),
                             1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x0)

    out = chain(seed_x, *args)
    np.asarray(out.ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(seed_x, *args)
        np.asarray(out.ravel()[0])
        ts.append((time.perf_counter() - t0) / ITERS)
    ts.sort()
    return ts[1]


def run(n, h, c, dtype=jnp.bfloat16):
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)
    wf = w.reshape(n, h, h, K * K * cw)
    geo = lap._geometry(x.shape, w.shape, (K, K), (D, D), (pad, pad))
    itemsize = jnp.dtype(dtype).itemsize
    plan = lap.pallas_plan(x.shape, w.shape, itemsize, (pad, pad))
    assert plan and plan[0] == "whole", plan
    m = plan[1]
    hp = h + 2 * pad
    lh = (K - 1) * D - pad
    big = h * h >= lap.DX_BIG_MAP_MIN
    f = K * K * cw

    # --- shipped two-launch dispatch (mirrors _agg_bwd_rule) ---
    def pair_separate(dy_, x_, wf_):
        if big:
            dx = pl.pallas_call(
                functools.partial(lap._dx_gather_kernel, **geo),
                grid=(n // m,),
                in_specs=[lap._block(wf.shape, m), lap._block(dy.shape, m)],
                out_specs=lap._block(x.shape, m),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, f), w.dtype),
                    pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, c), dy.dtype)],
            )(wf_, dy_)
        else:
            dx = pl.pallas_call(
                functools.partial(lap._dx_kernel, **geo),
                grid=(n // m,),
                in_specs=[lap._block(wf.shape, m), lap._block(dy.shape, m)],
                out_specs=lap._block(x.shape, m),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                scratch_shapes=[pltpu.VMEM((m, hp, hp, c), jnp.float32)],
            )(wf_, dy_)
        dwf = pl.pallas_call(
            functools.partial(
                lap._dw_kernel_dot if big else lap._dw_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(wf.shape, m),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), x.dtype)],
        )(x_, dy_)
        return dx, dwf

    # --- fused single-launch variants ---
    def pair_fused(dy_, x_, wf_, gather):
        if gather:
            kern = functools.partial(lap._dxdw_gather_kernel, dw_dot=big,
                                     **geo)
            scratch = [pltpu.VMEM((m, hp, hp, c), x.dtype),
                       pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, f), w.dtype),
                       pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, c), dy.dtype)]
        else:
            kern = functools.partial(lap._dxdw_scatter_kernel, dw_dot=big,
                                     **geo)
            scratch = [pltpu.VMEM((m, hp, hp, c), x.dtype),
                       pltpu.VMEM((m, hp, hp, c), jnp.float32)]
        return pl.pallas_call(
            kern,
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(wf.shape, m),
                      lap._block(dy.shape, m)],
            out_specs=(lap._block(x.shape, m), lap._block(wf.shape, m)),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct(wf.shape, w.dtype)),
            scratch_shapes=scratch,
            interpret=lap._use_interpret(),
        )(x_, wf_, dy_)

    def chainable(fn):
        # chain through dy (dx has the same shape): dy' = dy + f(outputs)
        def g(dy_, x_, wf_):
            dx, dwf = fn(dy_, x_, wf_)
            return dx + 0.0 * dwf[..., :1]
        return g

    t_sep = chain_time(chainable(pair_separate), dy, x, wf)
    t_fg = chain_time(chainable(lambda d_, x_, w_: pair_fused(
        d_, x_, w_, True)), dy, x, wf)
    t_fs = chain_time(chainable(lambda d_, x_, w_: pair_fused(
        d_, x_, w_, False)), dy, x, wf)

    # HBM floor: separate reads wf+dy (dx) + x+dy (dw), writes dx+dwf;
    # fused reads x+wf+dy once, writes dx+dwf
    img = n * h * h * c * itemsize
    wt = n * h * h * f * itemsize
    floor_sep = (wt + img + img + img + img + wt) / HBM_GBPS / 1e6
    floor_fus = (img + wt + img + img + wt) / HBM_GBPS / 1e6
    ws_g = lap._dxdw_working_set(x.shape, w.shape, itemsize, (pad, pad), m,
                                 True) / 1e6
    ws_s = lap._dxdw_working_set(x.shape, w.shape, itemsize, (pad, pad), m,
                                 False) / 1e6
    print(f"N{n} {h}x{h}x{c} m={m} big={big}: "
          f"separate {t_sep*1e3:7.3f}ms  fused-gather {t_fg*1e3:7.3f}ms  "
          f"fused-scatter {t_fs*1e3:7.3f}ms  "
          f"(floors sep {floor_sep:5.3f} fused {floor_fus:5.3f}; "
          f"ws g/s {ws_g:.1f}/{ws_s:.1f} MB)", flush=True)


print(f"devices: {jax.devices()}", flush=True)
for h, c in [(28, 128), (14, 256), (7, 512)]:
    run(128, h, c)
