"""Generic full-train-step A/B under env-var gates.

Chained train steps at bs128 on cotnet50 bf16 (param carry serializes
iterations on-device; bs128 is the platform's batch granularity — see
STATUS.md).  Gates are read at cotnet_tpu import, so each setting runs in a
fresh process:

  python -u tools/train_ab_bench.py                       # baseline
  python -u tools/train_ab_bench.py COTNET_DENSE_GROUPED=1
  python -u tools/train_ab_bench.py KEY=V KEY2=V2 model=se_cotnetd_152
"""
import os
import sys
import time

model_name = "cotnet50"
bs = 128
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    if k == "model":
        model_name = v
    elif k == "bs":
        bs = int(v)
    else:
        os.environ[k] = v

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cotnet_tpu.models import create_model

B, S, ITERS = bs, 224, 8
model = create_model(model_name, dtype=jnp.bfloat16)
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
def chained_train(v, x):
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


@jax.jit
def chained_infer(v, x):
    def body(i, carry):
        y = model.apply(v, carry, training=False)
        eps = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                        1.0, 0.0).astype(carry.dtype)
        return carry + eps
    return lax.fori_loop(0, ITERS, body, x)


def timeit(fn, *args):
    np.asarray(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(fn(*args).ravel()[0])
    return (time.perf_counter() - t0) / ITERS


gates = {k: os.environ[k] for k in sorted(os.environ)
         if k.startswith("COTNET_")}
print("model", model_name, "gates", gates, flush=True)
ti = timeit(chained_infer, variables, x)
print(f"infer {ti*1e3:8.3f} ms/batch  {B/ti:8.1f} img/s", flush=True)
tt = timeit(chained_train, variables, x)
print(f"train {tt*1e3:8.3f} ms/step   {B/tt:8.1f} img/s", flush=True)
