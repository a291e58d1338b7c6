"""Decompose train-step time: fwd / fwd+bwd / full step (TPU)."""
import time, numpy as np, jax, jax.numpy as jnp
from cotnet_tpu.models import create_model
from cotnet_tpu.train import TrainState, create_optimizer, make_train_step
from cotnet_tpu.train.loss import cross_entropy

B, S = 64, 224
model = create_model("cotnet50", dtype=jnp.bfloat16)
x = jnp.ones((B, S, S, 3), jnp.bfloat16)
labels = jnp.arange(B, dtype=jnp.int32) % 1000
tx = create_optimizer(dict(opt="sgd", momentum=0.9, weight_decay=4e-5), 0.1)
variables = jax.jit(lambda r, x: model.init({"params": r}, x, training=True))(jax.random.PRNGKey(0), x)
state = TrainState.create(variables, tx, ema=False)

def timed(f, *args, iters=10):
    r = f(*args); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    return (time.time() - t0) / iters

@jax.jit
def fwd_train(params, bs, x):
    out, mut = model.apply({"params": params, "batch_stats": bs}, x,
                           training=True, mutable=["batch_stats"])
    return cross_entropy(out, labels)

@jax.jit
def fwd_bwd(params, bs, x):
    def loss(p):
        out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                               training=True, mutable=["batch_stats"])
        return cross_entropy(out, labels)
    return jax.grad(loss)(params)

step = make_train_step(model, tx, lambda s: jnp.asarray(0.1), cross_entropy,
                       ema_decay=0.0, donate=False)
batch = {"image": x, "label": labels}

t = timed(fwd_train, state.params, state.batch_stats, x)
print(f"fwd(train-mode): {t*1e3:.1f} ms", flush=True)
t = timed(fwd_bwd, state.params, state.batch_stats, x)
print(f"fwd+bwd:         {t*1e3:.1f} ms", flush=True)
t = timed(lambda s: step(s, batch, jax.random.PRNGKey(0))[0], state)
print(f"full step:       {t*1e3:.1f} ms", flush=True)
