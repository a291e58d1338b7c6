import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from cotnet_tpu.models import create_model

for name in ("se_cotnetd_50", "cotnext50_2x48d"):
    model = create_model(name, dtype=jnp.bfloat16)
    x = jnp.ones((16, 224, 224, 3), jnp.bfloat16)
    v = jax.jit(lambda r: model.init({"params": r}, x, training=False))(jax.random.PRNGKey(0))
    f = jax.jit(lambda v, x: model.apply(v, x, training=False))
    y = f(v, x); np.asarray(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(5):
        y = f(v, x)
    np.asarray(jnp.sum(y))
    dt = (time.perf_counter() - t0) / 5
    yf = np.asarray(y.astype(jnp.float32))
    print(f"{name}: {yf.shape} finite={np.isfinite(yf).all()} "
          f"{16/dt:.0f} img/s (bs16, dispatch-bound)", flush=True)
