"""Checkpoint round-trip, top-N retention, recovery, and resume
trajectory-equivalence (reference checkpoint_saver.py semantics +
models/helpers.py:51-88 resume / train.py:130-141 scheduler fast-forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn

from cotnet_tpu.train.loss import cross_entropy
from cotnet_tpu.train.optim import create_optimizer
from cotnet_tpu.train.schedule import create_scheduler
from cotnet_tpu.train.state import TrainState
from cotnet_tpu.train.step import make_train_step
from cotnet_tpu.utils.checkpoint import CheckpointSaver, load_weights, save_weights


def _tiny_state():
    params = {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))}}
    variables = {"params": params,
                 "batch_stats": {"bn": {"mean": jnp.zeros((4,)),
                                        "var": jnp.ones((4,))}}}
    tx = create_optimizer(dict(opt="momentum", momentum=0.9), 0.1)
    return TrainState.create(variables, tx, ema=True)


def test_roundtrip(tmp_path):
    saver = CheckpointSaver(str(tmp_path / "ckpt"), max_history=3)
    state = _tiny_state()
    state = state.replace(params=jax.tree.map(lambda p: p + 5.0, state.params))
    saver.save_checkpoint(state, epoch=1, metric=50.0)

    restored = saver.restore(_tiny_state())
    np.testing.assert_allclose(
        np.asarray(restored.params["dense"]["kernel"]), 6.0)
    assert int(restored.step) == 0


def test_topn_retention(tmp_path):
    saver = CheckpointSaver(str(tmp_path / "ckpt"), max_history=2)
    state = _tiny_state()
    saver.save_checkpoint(state, 1, metric=10.0)
    saver.save_checkpoint(state, 2, metric=30.0)
    saver.save_checkpoint(state, 3, metric=20.0)  # evicts epoch-1 (worst)
    epochs = sorted(e["epoch"] for e in saver.index)
    assert epochs == [2, 3]
    assert saver.best()["epoch"] == 2


def test_recovery(tmp_path):
    saver = CheckpointSaver(str(tmp_path / "ckpt"), recovery_interval=2)
    state = _tiny_state()
    saver.save_recovery(state, 1)           # not on interval
    assert saver.find_recovery() is None
    saver.save_recovery(state, 2)
    info = saver.find_recovery()
    assert info is not None and info["epoch"] == 2
    restored = saver.restore(_tiny_state(), path=info["path"])
    assert int(restored.step) == 0


def test_weights_io_ema_select(tmp_path):
    state = _tiny_state()
    ema_p = jax.tree.map(lambda p: p * 2 + 1, state.params)
    path = str(tmp_path / "weights")
    save_weights(path, state.params, state.batch_stats, ema_p,
                 state.batch_stats)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "ema_params": state.params, "ema_batch_stats": state.batch_stats}
    plain = load_weights(path, template)
    np.testing.assert_allclose(
        np.asarray(plain["params"]["dense"]["kernel"]), 1.0)
    ema = load_weights(path, template, use_ema=True)
    np.testing.assert_allclose(
        np.asarray(ema["params"]["dense"]["kernel"]), 3.0)


class _BnNet(fnn.Module):
    """Tiny conv+BN+dropout net: exercises every TrainState leaf kind a real
    resume must round-trip (params, batch_stats, EMA, optimizer momentum)."""
    num_classes: int = 4

    @fnn.compact
    def __call__(self, x, training=False):
        x = fnn.Conv(8, (3, 3), padding=1)(x)
        x = fnn.BatchNorm(use_running_average=not training, momentum=0.9)(x)
        x = fnn.relu(x)
        x = fnn.Dropout(0.1, deterministic=not training)(x)
        x = jnp.mean(x, axis=(1, 2))
        return fnn.Dense(self.num_classes)(x)


def _trajectory_fixture():
    """(fresh state, jitted step, batch-of-step fn, base rng, schedule)."""
    model = _BnNet()
    # warmup + cosine so the LR is a DIFFERENT value at every step — a
    # resume that fails to fast-forward the schedule shows up immediately
    schedule_fn, _ = create_scheduler(
        dict(sched="cosine", epochs=2, lr=0.05, warmup_epochs=1,
             warmup_lr=1e-3, min_lr=1e-5), steps_per_epoch=8)
    tx = create_optimizer(
        dict(opt="momentum", momentum=0.9, weight_decay=1e-4), schedule_fn)
    x0 = jnp.zeros((8, 8, 8, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)},
        x0, training=True)
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(model, tx, schedule_fn, cross_entropy,
                           ema_decay=0.99, donate=False)

    def batch_at(i):
        # the batch stream is a pure function of the global step index, so
        # run A's step N+k and run B's post-resume step k see identical data
        x = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), i),
                              (8, 8, 8, 3))
        return {"image": x, "label": jnp.arange(8) % 4}

    return state, step, batch_at, jax.random.PRNGKey(3)


def _leaf_paths_allclose(a, b, what):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb), what
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=0, atol=0, err_msg=what)


def test_resume_trajectory_equivalence(tmp_path):
    """train(2N) == train(N) -> save -> restore -> train(N), exactly.

    The property that makes recovery checkpoints trustworthy: a restored
    state continues the SAME trajectory — params, EMA, optimizer momentum,
    BN stats bit-identical, and the LR at step N+k identical (in-graph
    scheduler fast-forward from the restored ``step``, the analog of the
    reference's lr_scheduler.step(resume_epoch) train.py:130-141).
    make_train_step folds the dropout rng by ``state.step``, so the rng
    stream fast-forwards with the step counter too."""
    n = 6
    state_a, step_fn, batch_at, rng = _trajectory_fixture()

    # run A: 2N uninterrupted steps, recording the LR trace of the tail
    lrs_a = []
    for i in range(2 * n):
        state_a, metrics = step_fn(state_a, batch_at(i), rng)
        if i >= n:
            lrs_a.append(float(metrics["lr"]))

    # run B: N steps -> recovery save -> restore into a FRESH state -> N more
    state_b, step_fn_b, _, _ = _trajectory_fixture()
    for i in range(n):
        state_b, _ = step_fn_b(state_b, batch_at(i), rng)
    saver = CheckpointSaver(str(tmp_path / "ckpt"), recovery_interval=1)
    saver.save_recovery(state_b, 1)
    info = saver.find_recovery()
    assert info is not None

    fresh, step_fn_c, _, _ = _trajectory_fixture()
    restored = saver.restore(fresh, path=info["path"])
    assert int(restored.step) == n
    lrs_b = []
    for i in range(n, 2 * n):
        restored, metrics = step_fn_c(restored, batch_at(i), rng)
        lrs_b.append(float(metrics["lr"]))

    # schedule fast-forward: LR at every post-resume step matches run A
    np.testing.assert_array_equal(np.asarray(lrs_a), np.asarray(lrs_b))
    # full-state equivalence, exact: same program, same inputs, same device
    _leaf_paths_allclose(state_a.params, restored.params, "params")
    _leaf_paths_allclose(state_a.batch_stats, restored.batch_stats,
                         "batch_stats")
    _leaf_paths_allclose(state_a.ema_params, restored.ema_params, "ema")
    _leaf_paths_allclose(state_a.ema_batch_stats, restored.ema_batch_stats,
                         "ema_batch_stats")
    _leaf_paths_allclose(state_a.opt_state, restored.opt_state, "opt_state")
    assert int(state_a.step) == int(restored.step) == 2 * n


def test_last_survives_worst_ranked_save(tmp_path):
    """A newest epoch that ranks worst must not be pruned out from under the
    rolling 'last' pointer (reference always keeps a real last checkpoint)."""
    saver = CheckpointSaver(str(tmp_path / "ckpt"), max_history=2)
    state = _tiny_state()
    saver.save_checkpoint(state, 1, metric=30.0)
    saver.save_checkpoint(state, 2, metric=20.0)
    saver.save_checkpoint(state, 3, metric=5.0)  # worst so far, but newest
    epochs = sorted(e["epoch"] for e in saver.index)
    assert 3 in epochs and len(epochs) == 2
    restored = saver.restore(_tiny_state())  # via 'last' -> epoch 3
    assert int(restored.step) == 0
