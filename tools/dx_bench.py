"""dx kernel shootout: scatter-form (in-place f32 accumulator) vs the
gather-form SSA chain (COTNET_DX_GATHER), isolated per cotnet50 stage,
chained timing at bs128 bf16.  Also times the dw kernel for the floor
comparison (dx and dw read/write comparable bytes)."""
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
    t0 = time.perf_counter()
    out = chain(seed_x, *args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def run(n, h, c, dtype=jnp.bfloat16):
    cw = c // 8
    pad = K // 2
    kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    dy = jax.random.normal(kd, (n, h, h, c), dtype)
    wf = w.reshape(n, h, h, K * K * cw)
    geo = lap._geometry(x.shape, w.shape, (K, K), (D, D), (pad, pad))
    plan = lap.pallas_plan(x.shape, w.shape, jnp.dtype(dtype).itemsize,
                           (pad, pad))
    assert plan and plan[0] == "whole", plan
    m = plan[1]
    hp = h + 2 * pad
    lh = (K - 1) * D - pad

    def dx_scatter(dy, wf):
        return pl.pallas_call(
            functools.partial(lap._dx_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(wf.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), jnp.float32)],
        )(wf, dy)

    def dx_gather(dy, wf):
        return pl.pallas_call(
            functools.partial(lap._dx_gather_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(wf.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, K * K * cw), w.dtype),
                pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, c), dy.dtype)],
        )(wf, dy)

    def dw(x_, dy_):
        return pl.pallas_call(
            functools.partial(lap._dw_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(wf.shape, m),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), x.dtype)],
        )(x_, dy_)

    def dw_dot(x_, dy_):
        return pl.pallas_call(
            functools.partial(lap._dw_kernel_dot, **geo),
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(wf.shape, m),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), x.dtype)],
        )(x_, dy_)

    t_sc = chain_time(lambda d_, w_: dx_scatter(d_, w_), dy, wf)
    t_ga = chain_time(lambda d_, w_: dx_gather(d_, w_), dy, wf)
    # dw chains through x (same shape in/out trick needs dy; chain via x)
    t_dw = chain_time(lambda x_, d_: dw(x_, d_)[..., :c], x, dy)
    t_dd = chain_time(lambda x_, d_: dw_dot(x_, d_)[..., :c], x, dy)
    print(f"N{n} {h}x{h}x{c} m={m}: dx scatter {t_sc*1e3:7.3f}ms  "
          f"dx gather {t_ga*1e3:7.3f}ms  dw {t_dw*1e3:7.3f}ms  "
          f"dw_dot {t_dd*1e3:7.3f}ms", flush=True)


print(f"devices: {jax.devices()}", flush=True)
for h, c in [(28, 128), (14, 256), (7, 512)]:
    run(128, h, c)
