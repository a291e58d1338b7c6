"""Child process for the multi-process distributed tests.

Run as ``python multiproc_child.py <mode> ...``:

* ``train <coordinator> <nproc> <pid>`` — join a real
  ``jax.distributed`` rendezvous (Gloo collectives on CPU, the analog of
  the reference's one-process-per-GPU NCCL group, train.py:222-227),
  build a tiny BN model, run 3 global-batch train steps on this process's
  batch shard, and print the loss / param / batch-stats fingerprints that
  the parent asserts are identical across processes AND equal to its own
  single-process oracle.
* ``badinit`` — assert that ``initialize_distributed`` with inconsistent
  explicit arguments raises instead of silently degrading to single-host.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _model_and_data():
    import jax.numpy as jnp
    from flax import linen as fnn

    class MpNet(fnn.Module):
        @fnn.compact
        def __call__(self, x, training=False):
            x = fnn.Conv(8, (3, 3), padding="SAME")(x)
            x = fnn.BatchNorm(use_running_average=not training,
                              momentum=0.9)(x)
            x = fnn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return fnn.Dense(4)(x)

    rng = np.random.RandomState(0)
    images = rng.randn(8, 8, 8, 3).astype(np.float32)
    labels = (np.arange(8) % 4).astype(np.int32)
    return MpNet(), images, labels


def oracle_steps(n_steps=3):
    """Single-process reference: full global batch on one device."""
    import jax
    import jax.numpy as jnp

    from cotnet_tpu.train.loss import cross_entropy
    from cotnet_tpu.train.optim import create_optimizer
    from cotnet_tpu.train.state import TrainState
    from cotnet_tpu.train.step import make_train_step

    model, images, labels = _model_and_data()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(images), training=True)
    tx = create_optimizer(dict(opt="momentum", momentum=0.9,
                               weight_decay=0.0), 0.1)
    state = TrainState.create(variables, tx, ema=False)
    step = make_train_step(model, tx, lambda s: jnp.asarray(0.1),
                           cross_entropy, ema_decay=0.0, donate=False)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    loss = None
    for _ in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        loss = float(metrics["loss"])
    p = float(np.sum(np.abs(np.asarray(
        jax.tree.leaves(state.params)[0], dtype=np.float64))))
    b = float(np.sum(np.abs(np.asarray(
        jax.tree.leaves(state.batch_stats)[0], dtype=np.float64))))
    return loss, p, b


def run_train(coord, nproc, pid):
    from cotnet_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coord, nproc, pid)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cotnet_tpu.parallel.mesh import make_mesh, replicated
    from cotnet_tpu.train.loss import cross_entropy
    from cotnet_tpu.train.optim import create_optimizer
    from cotnet_tpu.train.state import TrainState
    from cotnet_tpu.train.step import make_train_step

    assert jax.process_count() == nproc, jax.process_count()
    model, images, labels = _model_and_data()
    mesh = make_mesh()

    # this process's shard of the deterministic global batch
    n_local = images.shape[0] // nproc
    sl = slice(pid * n_local, (pid + 1) * n_local)

    def to_global(arr):
        spec = P("data", *([None] * (arr.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr[sl])

    batch = {"image": to_global(images), "label": to_global(labels)}

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(images), training=True)
    tx = create_optimizer(dict(opt="momentum", momentum=0.9,
                               weight_decay=0.0), 0.1)
    state = TrainState.create(variables, tx, ema=False)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, lambda s: jnp.asarray(0.1),
                           cross_entropy, ema_decay=0.0, donate=False)
    loss = None
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        loss = float(metrics["loss"])  # replicated -> addressable
    p = float(np.sum(np.abs(np.asarray(
        jax.tree.leaves(state.params)[0], dtype=np.float64))))
    b = float(np.sum(np.abs(np.asarray(
        jax.tree.leaves(state.batch_stats)[0], dtype=np.float64))))
    print(f"RESULT pid={pid} loss={loss:.8f} p={p:.8f} b={b:.8f}",
          flush=True)


def run_badinit():
    from cotnet_tpu.parallel.mesh import initialize_distributed
    try:
        # process_id >= num_processes is structurally invalid: must raise,
        # not silently fall back to single-host
        initialize_distributed("localhost:1", 1, 1)
    except (RuntimeError, ValueError) as e:
        print(f"RAISED {type(e).__name__}", flush=True)
        return
    print("NO_RAISE", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "train":
        run_train(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif mode == "badinit":
        run_badinit()
    else:
        raise SystemExit(f"unknown mode {mode}")
