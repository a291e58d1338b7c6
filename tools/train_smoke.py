import time, numpy as np, jax, jax.numpy as jnp
from cotnet_tpu.models import create_model
from cotnet_tpu.train import TrainState, create_optimizer, create_scheduler, make_train_step
from cotnet_tpu.train.loss import soft_target_cross_entropy
from cotnet_tpu.data.mixup import Mixup

B, S = 64, 224
model = create_model("cotnet50", dtype=jnp.bfloat16, drop_path_rate=0.1)
x = jnp.ones((B, S, S, 3), jnp.bfloat16)
sched, _ = create_scheduler(dict(sched="cosine", epochs=350, lr=0.25, warmup_epochs=5, warmup_lr=1e-4, min_lr=1e-5), 10000)
tx = create_optimizer(dict(opt="sgd", momentum=0.9, weight_decay=4e-5), sched)
t0 = time.time()
variables = jax.jit(lambda r, x: model.init({"params": r, "dropout": r}, x, training=True))(jax.random.PRNGKey(0), x)
state = TrainState.create(variables, tx, ema=True)
print(f"init {time.time()-t0:.1f}s", flush=True)
mixup = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1, num_classes=1000)
step = make_train_step(model, tx, sched, soft_target_cross_entropy, ema_decay=0.9999, mixup_fn=mixup)
batch = {"image": x, "label": jnp.arange(B, dtype=jnp.int32) % 1000}
rng = jax.random.PRNGKey(1)
t0 = time.time()
state, m = step(state, batch, rng)
print(f"train step compile+run {time.time()-t0:.1f}s loss={float(m['loss']):.4f} lr={float(m['lr']):.6f} gn={float(m['grad_norm']):.3f}", flush=True)
t0 = time.time(); n = 10
for _ in range(n):
    state, m = step(state, batch, rng)
jax.block_until_ready(state.params)
dt = (time.time()-t0)/n
print(f"steady train: {dt*1e3:.1f} ms/step -> {B/dt:.1f} img/s (bs{B})", flush=True)
print("loss", float(m["loss"]), "step", int(state.step), flush=True)
