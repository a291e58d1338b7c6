import time, functools, numpy as np
import jax, jax.numpy as jnp
from jax import lax
from cotnet_tpu.ops import local_aggregate

def bench_shape(B, H, C, impl, iters=10):
    Cw = C // 8
    x = jnp.ones((B, H, H, C), jnp.bfloat16)
    w = jnp.ones((B, H, H, 1, 9, Cw), jnp.bfloat16)
    @jax.jit
    def chained(x, w):
        def body(i, carry):
            y = local_aggregate(carry, w, kernel_size=3, impl=impl)
            eps = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))), 1.0, 0.0)
            return carry + eps.astype(carry.dtype)
        return lax.fori_loop(0, iters, body, x)
    np.asarray(chained(x, w)[0,0,0,0])
    t0 = time.perf_counter()
    np.asarray(chained(x, w)[0,0,0,0])
    dt = (time.perf_counter() - t0) / iters
    bytes_ = (B*H*H*C*2 + B*H*H*9*Cw + B*H*H*C) * 2
    return dt, bytes_ / dt / 1e9

for (B,H,C) in [(128,56,64),(128,28,128),(128,14,256),(128,7,512)]:
    for impl in ("xla","pallas"):
        dt, gbs = bench_shape(B,H,C,impl)
        print(f"B{B} {H}x{H}x{C} {impl:6s}: {dt*1e3:7.3f} ms  {gbs:6.1f} GB/s-effective", flush=True)
