"""m-packing probe for the 28x28 bwd kernels (and fwd, for reference):
is the big-map stage latency-bound at m=1?"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
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
    out = chain(seed_x, *args); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    out = chain(seed_x, *args); np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS

n, h, c = 128, 28, 128
cw = c // 8
pad = K // 2
kx, kw_, kd = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(kx, (n, h, h, c), jnp.bfloat16)
w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), jnp.bfloat16)
dy = jax.random.normal(kd, (n, h, h, c), jnp.bfloat16)
wf = w.reshape(n, h, h, K * K * cw)
geo = lap._geometry(x.shape, w.shape, (K, K), (D, D), (pad, pad))
hp = h + 2 * pad
lh = (K - 1) * D - pad
print("devices:", jax.devices(), flush=True)

for m in (1, 2, 4):
    def fwd(x_, w_):
        return pl.pallas_call(
            functools.partial(lap._fwd_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(wf.shape, m)],
            out_specs=lap._block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), x.dtype)],
        )(x_, w_)

    def dw_dot(x_, d_):
        return pl.pallas_call(
            functools.partial(lap._dw_kernel_dot, **geo),
            grid=(n // m,),
            in_specs=[lap._block(x.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(wf.shape, m),
            out_shape=jax.ShapeDtypeStruct(wf.shape, w.dtype),
            scratch_shapes=[pltpu.VMEM((m, hp, hp, c), x.dtype)],
        )(x_, d_)

    def dx_gather(d_, w_):
        return pl.pallas_call(
            functools.partial(lap._dx_gather_kernel, **geo),
            grid=(n // m,),
            in_specs=[lap._block(wf.shape, m), lap._block(dy.shape, m)],
            out_specs=lap._block(x.shape, m),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, K * K * cw), w.dtype),
                pltpu.VMEM((m, h + 2 * lh, h + 2 * lh, c), dy.dtype)],
        )(w_, d_)

    tf = chain_time(fwd, x, wf)
    td = chain_time(lambda x_, d_: dw_dot(x_, d_)[..., :c], x, dy)
    tg = chain_time(dx_gather, dy, wf)
    print(f"m={m}: fwd {tf*1e3:7.3f}  dw_dot {td*1e3:7.3f}  "
          f"dx_gather {tg*1e3:7.3f} ms", flush=True)
