"""Per-stage aggregation kernel timing on the real chip: pallas vs XLA
oracle vs HBM roofline floor, fwd and fwd+bwd.

Timing method: chained fori_loop inside ONE jitted program with a
fold-proof data dependency (isnan guard) — independent repeated dispatches
through the axon relay carry per-call latency that in-model execution does
not, and XLA folds `*0`-style dependencies away."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cotnet_tpu.ops.local_agg import local_aggregate

HBM_GBPS = 127.0  # measured envelope (tools/roofline.py)
ITERS = 30


def chain_time(step, x, w):
    """step: (x, w) -> array. Returns seconds per call, chained."""

    @jax.jit
    def chain(x, w):
        def body(_, xx):
            y = step(xx, w)
            bump = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                             1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = chain(x, w)
    np.asarray(out.ravel()[0])  # warm + sync to host
    t0 = time.perf_counter()
    out = chain(x, w)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def run(n, h, c, cw=None, dtype=jnp.bfloat16):
    cw = cw or c // 8
    k, pad = 3, 1
    kx, kw_ = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, h, c), dtype)
    w = jax.random.normal(kw_, (n, h, h, 1, k * k, cw), dtype)

    def fwd(impl):
        return lambda x, w: local_aggregate(x, w, kernel_size=k, padding=pad,
                                            impl=impl)

    def bwd(impl):
        def f(x, w):
            return jnp.sum(local_aggregate(x, w, kernel_size=k, padding=pad,
                                           impl=impl).astype(jnp.float32) ** 2)
        g = jax.grad(f, argnums=(0, 1))
        return lambda x, w: g(x, w)[0]  # chain through dx

    # correctness: f32 grads (bf16 1-ulp diffs are accumulation-order noise)
    xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
    yp = jax.jit(fwd("pallas"))(x, w)
    yx = jax.jit(fwd("xla"))(x, w)
    err = float(jnp.max(jnp.abs(yp.astype(jnp.float32) -
                                yx.astype(jnp.float32))))

    def grads(impl):
        def f(x, w):
            return jnp.sum(local_aggregate(x, w, kernel_size=k, padding=pad,
                                           impl=impl) ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1)))(xf, wf)

    gp, gx = grads("pallas"), grads("xla")
    gerr = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        for a, b in zip(gp, gx))

    tf_p, tf_x = chain_time(fwd("pallas"), x, w), chain_time(fwd("xla"), x, w)
    tb_p, tb_x = chain_time(bwd("pallas"), x, w), chain_time(bwd("xla"), x, w)
    traffic = (2 * x.size + w.size) * x.dtype.itemsize
    floor_ms = traffic / (HBM_GBPS * 1e9) * 1e3
    print(f"N{n} {h}x{h}x{c}: fwd pallas {tf_p*1e3:7.3f}ms xla {tf_x*1e3:7.3f}ms "
          f"floor {floor_ms:6.3f}ms | bwd pallas {tb_p*1e3:7.3f}ms "
          f"xla {tb_x*1e3:7.3f}ms | maxerr fwd(bf16) {err:.2e} "
          f"grad-rel(f32) {gerr:.2e}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for (h, c) in [(56, 64), (28, 128), (14, 256), (7, 512)]:
        run(128, h, c)
