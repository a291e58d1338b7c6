"""Capture a jax.profiler trace of the chained cotnet50 train step (TPU).

Same formulation as tools/train_ab_bench.py (bs128 bf16, fori_loop-chained
steps so dispatch latency amortizes); writes the chrome trace under
/tmp/cotnet_trace and prints the .trace.json.gz path for
tools/train_attr.py:

  python -u tools/train_trace.py [KEY=V ...]         # env gates as in A/B
  python tools/train_attr.py <printed path> 8        # phase tables
  python tools/train_attr.py <printed path> 8 roofline  # per-fusion bounds
"""
import glob
import os
import sys

_model_name, _bs = "cotnet50", 128
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    if k == "model":
        _model_name = v
    elif k == "bs":
        _bs = int(v)
    else:
        os.environ[k] = v

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cotnet_tpu.models import create_model

B, S, ITERS = _bs, 224, 8
model = create_model(_model_name, dtype=jnp.bfloat16)
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


# warm up (compile) OUTSIDE the trace
np.asarray(chained_train(variables, x).ravel()[0])

outdir = "/tmp/cotnet_trace"
with jax.profiler.trace(outdir):
    np.asarray(chained_train(variables, x).ravel()[0])

paths = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
print("TRACE", paths[-1] if paths else "NOT-FOUND", flush=True)
