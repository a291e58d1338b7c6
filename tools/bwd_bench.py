"""Backward-path shootout for the aggregation op, per cotnet50 stage:
pallas custom-VJP kernels vs XLA autodiff (scatter transpose) vs the
gather custom VJP (COTNET_XLA_AGG_VJP), chained timing at bs128 bf16.

The chained step runs grad(sum(agg(x, w)^2)) wrt (x, w) and carries the
data dependency through dx, so fwd+dx+dw are all inside the loop."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import cotnet_tpu.ops.local_agg as la

ITERS = 20
K, PAD = 3, 1


def chain_time(step, x, w):
    @jax.jit
    def chain(x, w):
        def body(_, xx):
            y = step(xx, w)
            bump = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                             1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = chain(x, w)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    out = chain(x, w)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def bwd_fn(impl, use_vjp):
    def f(x, w):
        old = la._XLA_AGG_VJP
        la._XLA_AGG_VJP = use_vjp
        try:
            y = la.local_aggregate(x, w, kernel_size=K, padding=PAD,
                                   impl=impl)
        finally:
            la._XLA_AGG_VJP = old
        return jnp.sum(y.astype(jnp.float32) ** 2)
    g = jax.grad(f, argnums=(0, 1))
    return lambda x, w: g(x, w)[0]


def run(n, h, c, dtype=jnp.bfloat16):
    cw = c // 8
    kx, kw_ = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, K * K, cw), dtype)
    res = {}
    for name, impl, vjp in [("xla-ad", "xla", False),
                            ("xla-gather", "xla", True),
                            ("pallas", "pallas", False)]:
        res[name] = chain_time(bwd_fn(impl, vjp), x, w)
    print(f"N{n} {h}x{h}x{c}: " + "  ".join(
        f"{k} {v*1e3:7.3f}ms" for k, v in res.items()), flush=True)


if __name__ == "__main__":
    import os
    print(f"devices: {jax.devices()}", flush=True)
    shapes = {"all": [(56, 64), (28, 128), (14, 256), (7, 512)],
              "s1": [(56, 64)]}[os.environ.get("SHAPES", "all")]
    for (h, c) in shapes:
        run(128, h, c)
