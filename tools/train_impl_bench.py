"""Compare train-step wall time for the aggregation impl choices on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cotnet_tpu.models import create_model
from cotnet_tpu.train import TrainState, create_optimizer, make_train_step
from cotnet_tpu.train.loss import cross_entropy

B, S = 64, 224
for impl in ("pallas", "xla"):
    model = create_model("cotnet50", dtype=jnp.bfloat16,
                         block_args=dict(impl=impl))
    x = jnp.ones((B, S, S, 3), jnp.bfloat16)
    tx = create_optimizer(dict(opt="sgd", momentum=0.9, weight_decay=4e-5), 0.1)
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, training=True))(jax.random.PRNGKey(0), x)
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(model, tx, lambda s: jnp.asarray(0.1), cross_entropy, ema_decay=0.9999)
    batch = {"image": x, "label": jnp.arange(B, dtype=jnp.int32) % 1000}
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    # host fetch: the relay can ack block_until_ready early; a transfer can't
    np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0]
    t0 = time.time(); n = 10
    for _ in range(n):
        state, m = step(state, batch, rng)
    np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0]
    dt = (time.time()-t0)/n
    print(f"{impl}: {dt*1e3:.1f} ms/step -> {B/dt:.1f} img/s (bs{B})", flush=True)
