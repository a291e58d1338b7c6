"""A/B the training-mode GroupNorm affine fold (COTNET_GN_FOLD_TRAIN).

Chained train steps at bs128 (the platform's batch granularity — see
STATUS.md): param carry serializes iterations on-device.  Run once per
setting in a fresh process (the flag is read at cotnet_tpu import):

  python -u tools/gnfold_train_bench.py 0
  python -u tools/gnfold_train_bench.py 1
"""
import os
import sys
import time

fold = sys.argv[1] if len(sys.argv) > 1 else "0"
os.environ["COTNET_GN_FOLD_TRAIN"] = fold

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cotnet_tpu.models import create_model

B, S, ITERS = 128, 224, 8
model = create_model("cotnet50", dtype=jnp.bfloat16)
x = jnp.ones((B, S, S, 3), jnp.bfloat16)
labels = jnp.arange(B) % 1000
shapes = jax.eval_shape(
    lambda r, x: model.init({"params": r}, x, training=True),
    jax.random.PRNGKey(0), x)
variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def loss_fn(params, batch_stats, x):
    out, upd = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, training=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    logp = jax.nn.log_softmax(out.astype(jnp.float32))
    loss = -jnp.mean(logp[jnp.arange(out.shape[0]), labels])
    return loss, upd["batch_stats"]


@jax.jit
def chained(v, x):
    def body(i, carry):
        params, stats = carry
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, x)
        params = jax.tree.map(lambda p, g: p - 0.01 * g.astype(p.dtype),
                              params, grads)
        return params, stats
    params, stats = lax.fori_loop(
        0, ITERS, body, (v["params"], v["batch_stats"]))
    return jax.tree.leaves(params)[0]

print(f"devices: {jax.devices()}  GN_FOLD_TRAIN={fold}", flush=True)
out = chained(variables, x)
np.asarray(out).ravel()[0]  # real host fetch (relay acks block early)
t0 = time.time()
out = chained(variables, x)
np.asarray(out).ravel()[0]
dt = (time.time() - t0) / ITERS
print(f"GN_FOLD_TRAIN={fold}: {dt*1e3:.2f} ms/step  {B/dt:.1f} img/s (bs{B})",
      flush=True)
