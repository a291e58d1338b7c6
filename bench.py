"""Benchmark: CoTNet-50 @224 bs128 inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference repo publishes no images/sec (BASELINE.md) — its inference-time
claim is a figure only — so ``vs_baseline`` is the speedup of this
framework's full forward (Pallas local-aggregation kernels) over the same
model with the op's pure-XLA oracle formulation (ops/local_agg.py
``_agg_core_xla``), i.e. kernel-engineering gain on identical hardware, same
model, same numerics.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _zeros_like_tree(tree_shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree_shapes)


def build(model_name: str, batch: int, size: int, impl: str, dtype):
    from cotnet_tpu.models import create_model

    model = create_model(model_name, dtype=dtype, block_args=dict(impl=impl))
    x = jnp.ones((batch, size, size, 3), dtype)
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    variables = _zeros_like_tree(shapes)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, training=False)

    return fwd, variables, x


def timeit(fwd, variables, x, iters=30, warmup=5):
    for _ in range(warmup):
        y = fwd(variables, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fwd(variables, x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    batch, size = 128, 224
    dtype = jnp.bfloat16

    fwd_p, v_p, x_p = build("cotnet50", batch, size, "pallas", dtype)
    dt_pallas = timeit(fwd_p, v_p, x_p)

    fwd_x, v_x, x_x = build("cotnet50", batch, size, "xla", dtype)
    dt_xla = timeit(fwd_x, v_x, x_x)

    ips = batch / dt_pallas
    ips_xla = batch / dt_xla
    best = max(ips, ips_xla)
    print(json.dumps({
        "metric": "cotnet50_224_bs128_bf16_infer_imgs_per_sec_chip",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ips_xla, 4),
        "detail": {"pallas_ips": round(ips, 1), "xla_ips": round(ips_xla, 1),
                   "ms_per_batch_pallas": round(dt_pallas * 1e3, 3),
                   "ms_per_batch_xla": round(dt_xla * 1e3, 3),
                   "platform": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
