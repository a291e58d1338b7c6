"""SE-CoTNetD-152 at its accuracy-flagship resolutions (reference
README.md:51-52: 224 and 320; default_cfgs 'cot_s'/'cot_l' tiers): chained
inference throughput + the aggregation dispatch plan per CoT stage.

Run: python -u tools/flagship_bench.py  (real chip; ~3 compiles)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cotnet_tpu.models import create_model
from cotnet_tpu.ops.local_agg_pallas import pallas_plan

ITERS = 10


def dispatch_audit(size):
    """The hybrid chassis aggregates in stage 3 (odd blocks) and stage 4
    (CoTLayer, K=3, share_planes 8); stages stride 2 from a /2 stem."""
    print(f"  dispatch @ {size}:")
    for stage, c in ((3, 256), (4, 512)):
        hw = size // (2 ** (stage + 1))
        xs = (64, hw, hw, c)
        ws = (64, hw, hw, 1, 9, c // 8)
        plan = pallas_plan(xs, ws, 2, (1, 1))
        print(f"    stage{stage} {hw}x{hw}x{c}: "
              f"{plan if plan else 'XLA fallback'}")


def bench(size, batch=64):
    model = create_model("se_cotnetd_152", dtype=jnp.bfloat16)
    x = jnp.ones((batch, size, size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def chained(v, x):
        def body(_, carry):
            y = model.apply(v, carry, training=False)
            eps = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                            1.0, 0.0).astype(carry.dtype)
            return carry + eps
        return jax.lax.fori_loop(0, ITERS, body, x)

    np.asarray(chained(variables, x).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(chained(variables, x).ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"se_cotnetd_152 @{size} bs{batch} bf16: "
          f"{dt * 1e3:.2f} ms/batch = {batch / dt:.0f} img/s/chip",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for size in (224, 256, 320):
        dispatch_audit(size)
        bench(size)
