"""Checkpoint round-trip, top-N retention, recovery (reference
checkpoint_saver.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotnet_tpu.train.optim import create_optimizer
from cotnet_tpu.train.state import TrainState
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
