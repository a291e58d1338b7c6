"""Where does cotnet50 inference time go? Ablation timing on the real chip.

Times (bs128 @224 bf16, steady state):
  - resnet50      : chassis without CoT (conv-only upper bound)
  - cotnet50 xla  : CoT with the XLA aggregation oracle
  - cotnet50 pallas: CoT with the Pallas kernels
  - cotnet50 noagg: CoT with aggregation replaced by identity (costless agg
                    bound — isolates the aggregation op's share)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def time_model(name, batch, size=224, iters=20, **kwargs):
    from cotnet_tpu.models import create_model

    model = create_model(name, dtype=jnp.bfloat16, **kwargs)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(0)}, x, training=False)
    )(jax.random.PRNGKey(0))

    @jax.jit
    def step(v, x):
        return model.apply(v, x, training=False)

    y = step(variables, x)
    np.asarray(jnp.sum(y))  # warm + sync

    @jax.jit
    def chain(v, x):
        def body(_, xx):
            y = step(v, xx)
            # fold-proof dependency: nan-guard can't be algebraically removed
            bump = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                             1.0, 0.0).astype(x.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, iters, body, x)

    out = chain(variables, x)
    np.asarray(jnp.sum(out))  # warm
    t0 = time.perf_counter()
    out = chain(variables, x)
    np.asarray(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    print(f"{name:24s} {kwargs.get('block_args', {})} "
          f"{dt * 1e3:8.2f} ms/batch  {ips:9.1f} img/s", flush=True)
    return ips


if __name__ == "__main__":
    bs = int(os.environ.get("BS", "128"))
    print(f"devices: {jax.devices()}  bs={bs}", flush=True)
    time_model("resnet50", bs)
    time_model("cotnet50", bs, block_args=dict(impl="xla"))
    time_model("cotnet50", bs, block_args=dict(impl="pallas"))
    time_model("cotnet50", bs, block_args=dict(impl="identity"))
