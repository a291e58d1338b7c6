"""Mega-fusion (embed conv2 + GroupNorm + aggregation in ONE Pallas kernel)
vs the unfused eval composition (XLA conv2 -> deferred-GN affine ->
whole-image Pallas aggregation), per cotnet50 stage, bs128 bf16.

The fused kernel's claim: the K^2*Cw weight tensor never exists in HBM —
traffic drops from {write w_raw + read for stats + read for agg} to one
read of the 2.25x-smaller mid activation.  This tool measures whether the
claim survives contact with Mosaic's scheduling.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cotnet_tpu.ops.local_agg import local_aggregate, local_aggregate_embed_gn
from cotnet_tpu.ops.local_agg_pallas import fused_embed_plan

HBM_GBPS = 127.0
ITERS = 30
K, PAD = 3, 1


def chain_time(step, *args):
    @jax.jit
    def chain(x, *rest):
        def body(_, xx):
            y = step(xx, *rest)
            bump = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                             1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = chain(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    out = chain(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def unfused(x, wp, w2, b2, gamma, beta, eps=1e-5):
    """Today's eval path: XLA conv2, deferred-normalize affine folded into
    the Pallas aggregation (GN_FOLD=1 semantics)."""
    n, h, w, _ = x.shape
    f = w2.shape[-1]
    k2 = K * K
    cw = f // k2
    acc = jnp.float32
    wr = (jnp.einsum("nhwc,cf->nhwf", wp, w2.astype(x.dtype),
                     preferred_element_type=acc) + b2).astype(x.dtype)
    wrk = wr.astype(acc).reshape(n, h, w, k2, cw)
    mean = jnp.mean(wrk, axis=(1, 2, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(wrk), axis=(1, 2, 3), keepdims=True)
        - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gk = gamma.astype(acc).reshape(1, k2, cw)
    bk = beta.astype(acc).reshape(1, k2, cw)
    s = inv[:, 0, 0] * gk
    b = bk - mean[:, 0, 0] * s
    return local_aggregate(x, wr.reshape(n, h, w, 1, k2, cw),
                           kernel_size=K, padding=PAD,
                           w_scale=s[:, None], w_bias=b[:, None])


def fused(x, wp, w2, b2, gamma, beta):
    return local_aggregate_embed_gn(x, wp, w2, b2, gamma, beta,
                                    kernel_size=K, padding=PAD,
                                    impl="pallas")


def run(n, h, c, dtype=jnp.bfloat16):
    cp = c // 2
    cw = c // 8
    f = K * K * cw
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (n, h, h, c), dtype)
    wp = jax.random.normal(ks[1], (n, h, h, cp), dtype)
    w2 = (jax.random.normal(ks[2], (cp, f), jnp.float32) * 0.1)
    b2 = jax.random.normal(ks[3], (f,), jnp.float32) * 0.1
    gamma = jax.random.normal(ks[4], (f,), jnp.float32) * 0.2 + 1.0
    beta = jax.random.normal(ks[5], (f,), jnp.float32) * 0.2

    plan = fused_embed_plan(x.shape, wp.shape, f, x.dtype.itemsize,
                            (PAD, PAD))
    print(f"N{n} {h}x{h}x{c}: plan={plan}", flush=True)
    if plan is None:
        return

    yf = jax.jit(fused)(x, wp, w2, b2, gamma, beta)
    yu = jax.jit(unfused)(x, wp, w2, b2, gamma, beta)
    err = float(jnp.max(jnp.abs(yf.astype(jnp.float32)
                                - yu.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(yu.astype(jnp.float32))))

    t_f = chain_time(fused, x, wp, w2, b2, gamma, beta)
    t_u = chain_time(unfused, x, wp, w2, b2, gamma, beta)
    # traffic floors: fused reads x+wp, writes y; unfused additionally
    # round-trips w_raw (write + agg read) and reads it for stats
    bpe = x.dtype.itemsize
    fl_f = (2 * x.size + wp.size) * bpe / (HBM_GBPS * 1e9) * 1e3
    w_sz = n * h * h * f
    fl_u = ((2 * x.size + wp.size + 3 * w_sz) * bpe
            / (HBM_GBPS * 1e9) * 1e3)
    print(f"  fused {t_f*1e3:7.3f}ms (floor {fl_f:5.3f})  "
          f"unfused {t_u*1e3:7.3f}ms (floor {fl_u:5.3f})  "
          f"speedup {t_u/t_f:5.2f}x  err {err:.2e} (scale {scale:.1f})",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    import os
    shapes = {"all": [(56, 64), (28, 128), (14, 256), (7, 512)],
              "late": [(28, 128), (14, 256), (7, 512)],
              "s1": [(56, 64)]}[os.environ.get("SHAPES", "all")]
    for (h, c) in shapes:
        run(128, h, c)
