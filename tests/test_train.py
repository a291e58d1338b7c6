"""Train-stack tests: losses, schedules, optimizers, train step (loss
decreases), EMA, and the sharded multi-device path on the fake CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as fnn

from cotnet_tpu.data.mixup import Mixup, one_hot_smooth
from cotnet_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from cotnet_tpu.train.loss import (
    cross_entropy,
    jsd_cross_entropy,
    label_smoothing_cross_entropy,
    soft_target_cross_entropy,
)
from cotnet_tpu.train.optim import create_optimizer
from cotnet_tpu.train.schedule import PlateauController, create_scheduler
from cotnet_tpu.train.state import TrainState
from cotnet_tpu.train.step import make_eval_step, make_train_step


class TinyNet(fnn.Module):
    num_classes: int = 4

    @fnn.compact
    def __call__(self, x, training=False):
        x = fnn.Conv(8, (3, 3), padding=1)(x)
        x = fnn.BatchNorm(use_running_average=not training, momentum=0.9)(x)
        x = fnn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return fnn.Dense(self.num_classes)(x)


def _torch_free_ce_check():
    logits = jnp.asarray([[2.0, 0.5, -1.0], [0.1, 0.2, 0.3]])
    labels = jnp.asarray([0, 2])
    # manual
    logp = jax.nn.log_softmax(logits)
    expect = -(logp[0, 0] + logp[1, 2]) / 2
    return logits, labels, expect


def test_losses():
    logits, labels, expect = _torch_free_ce_check()
    np.testing.assert_allclose(cross_entropy(logits, labels), expect, rtol=1e-6)
    # smoothing=0 reduces to CE
    np.testing.assert_allclose(
        label_smoothing_cross_entropy(logits, labels, 0.0), expect, rtol=1e-6)
    # soft-target CE with one-hot == CE
    onehot = jax.nn.one_hot(labels, 3)
    np.testing.assert_allclose(
        soft_target_cross_entropy(logits, onehot), expect, rtol=1e-6)
    # smoothing moves loss toward uniform
    l_sm = label_smoothing_cross_entropy(logits, labels, 0.1)
    assert l_sm > cross_entropy(logits, labels) - 1.0
    # jsd: identical splits -> zero divergence term
    stacked = jnp.concatenate([logits, logits, logits], axis=0)
    np.testing.assert_allclose(
        jsd_cross_entropy(stacked, labels, 3, smoothing=0.0), expect,
        rtol=1e-5, atol=1e-6)


def test_cosine_schedule_shape():
    spe = 10
    fn, total = create_scheduler(
        dict(sched="cosine", epochs=100, lr=0.2, min_lr=0.0,
             warmup_epochs=5, warmup_lr=1e-4, cooldown_epochs=10), spe)
    assert total == 110
    lr0 = float(fn(0))
    lr_warm_end = float(fn(5 * spe))
    lr_mid = float(fn(52 * spe))
    lr_end = float(fn(100 * spe - 1))
    assert abs(lr0 - 1e-4) < 1e-6
    # at warmup end the cosine has already advanced to t=5/100
    assert abs(lr_warm_end - 0.19877) < 1e-3
    assert 0.05 < lr_mid < 0.12
    assert lr_end < 1e-3


def test_plateau_controller():
    pc = PlateauController(decay_rate=0.5, patience=1, cooldown=0)
    assert pc.update(10.0) == 1.0
    assert pc.update(10.0) == 1.0   # bad 1
    assert pc.update(10.0) == 0.5   # bad 2 > patience -> decay
    assert pc.update(20.0) == 0.5   # new best, scale stays


@pytest.mark.parametrize("opt", ["sgd", "momentum", "adamw", "adamp", "sgdp",
                                 "rmsproptf", "lookahead_sgd"])
def test_optimizers_run(opt):
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = create_optimizer(dict(opt=opt, weight_decay=1e-4, momentum=0.9,
                               clip_mode="norm", clip_grad=1.0), 0.1, params)
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert jnp.all(jnp.isfinite(new["w"]))
    assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0


def test_sync_lookahead_epoch_end():
    """Forced epoch-end sync (reference train.py:295-296 ->
    optim/lookahead.py:29-43): slow += alpha*(fast-slow), fast = slow, at
    ANY point in the sync period; no-op without a lookahead wrapper."""
    from cotnet_tpu.train import TrainState, sync_lookahead

    params = {"w": jnp.ones((4, 4))}
    tx = create_optimizer(dict(opt="lookahead_sgd", weight_decay=0.0), 0.1,
                          params)
    state = TrainState.create({"params": params}, tx)
    grads = {"w": jnp.full((4, 4), 2.0)}
    # two inner steps (< sync_period=6): slow stays at init, fast moves
    p = state.params
    opt = state.opt_state
    for _ in range(2):
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
    state = state.replace(params=p, opt_state=opt)
    fast = state.params["w"]
    assert float(jnp.abs(fast - 1.0).max()) > 0

    synced = sync_lookahead(state)
    expect = 1.0 + 0.5 * (fast - 1.0)  # slow(init)=1 + alpha*(fast-slow)
    assert jnp.allclose(synced.params["w"], expect, atol=1e-6)
    # the stored slow buffer equals the new fast weights
    from cotnet_tpu.train.optim import _LookaheadState
    la = [s for s in jax.tree_util.tree_leaves(
        synced.opt_state, is_leaf=lambda x: isinstance(x, _LookaheadState))
        if isinstance(s, _LookaheadState)]
    assert jnp.allclose(la[0].slow["w"], expect, atol=1e-6)

    # no lookahead -> identity
    tx2 = create_optimizer(dict(opt="sgd", weight_decay=0.0), 0.1, params)
    state2 = TrainState.create({"params": params}, tx2)
    assert sync_lookahead(state2) is state2


def test_wd_masking_sgd():
    """1-d params must not be weight-decayed (optim_factory.py:19-32)."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = create_optimizer(dict(opt="momentum", weight_decay=0.1, momentum=0.0),
                          1.0, params)
    state = tx.init(params)
    zero_grads = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    updates, _ = tx.update(zero_grads, state, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0  # decayed
    assert float(jnp.abs(updates["b"]).sum()) == 0  # masked


def _make_state_and_step(model, lr=0.5, ema_decay=0.9, mixup_fn=None,
                         loss_fn=None):
    x = jnp.ones((8, 8, 8, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, training=True)
    tx = create_optimizer(dict(opt="momentum", weight_decay=0.0, momentum=0.9),
                          lr)
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(model, tx, lambda s: jnp.asarray(lr),
                           loss_fn or cross_entropy,
                           ema_decay=ema_decay, mixup_fn=mixup_fn,
                           donate=False)
    return state, step


def test_train_step_loss_decreases():
    model = TinyNet()
    state, step = _make_state_and_step(model)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    batch = {"image": x, "label": jnp.arange(8) % 4}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # EMA drifted toward new params but isn't equal to them
    w_new = jax.tree.leaves(state.params)[0]
    w_ema = jax.tree.leaves(state.ema_params)[0]
    assert not jnp.allclose(w_new, w_ema)


def test_train_step_with_mixup():
    model = TinyNet()
    mixup = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1,
                  num_classes=4)
    state, step = _make_state_and_step(
        model, mixup_fn=mixup, loss_fn=soft_target_cross_entropy)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    batch = {"image": x, "label": jnp.arange(8) % 4}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])


def test_eval_step_counts():
    model = TinyNet()
    state, _ = _make_state_and_step(model)
    eval_step = make_eval_step(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    batch = {"image": x, "label": jnp.arange(8) % 4,
             "valid": jnp.asarray([1.0] * 6 + [0.0] * 2)}
    m = eval_step(state, batch)
    assert float(m["n"]) == 6.0
    assert 0 <= float(m["top1_count"]) <= float(m["top5_count"]) <= 6.0


def test_evaler_real_labels(tmp_path):
    """ReaL re-labeled evaluation plumbed through the Evaler
    (reference datasets/real_labels.py + validate.py --real-labels)."""
    import json

    from cotnet_tpu.data.real_labels import RealLabelsImagenet
    from cotnet_tpu.evaler import Evaler

    # 6 real val images; the first 4 accept every class (=> always correct),
    # the last 2 accept none (no annotation -> skipped, like the reference)
    real = [[0, 1, 2, 3]] * 4 + [[]] * 2
    rj = tmp_path / "real.json"
    rj.write_text(json.dumps(real))
    filenames = [f"ILSVRC2012_val_{i + 1:08d}.JPEG" for i in range(6)]
    rl = RealLabelsImagenet(filenames, real_json=str(rj))

    model = TinyNet()
    state, _ = _make_state_and_step(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    batch = {"image": x, "label": jnp.arange(8) % 4,
             "valid": jnp.asarray([1.0] * 6 + [0.0] * 2)}  # 2 padding rows
    evaler = Evaler(model, [batch], real_labels=rl)
    results = evaler(0, state)
    # padding rows dropped: exactly 6 samples consumed, 4 scored
    assert rl.sample_idx == 6
    assert len(rl.is_correct[1]) == 4
    assert results["real_top1"] == 100.0 and results["real_top5"] == 100.0
    assert results["samples"] == 6.0
    # a second pass on the same Evaler resets the accumulator instead of
    # running past the filename list
    results2 = evaler(1, state)
    assert rl.sample_idx == 6 and len(rl.is_correct[1]) == 4
    assert results2["real_top1"] == 100.0


def test_real_labels_logits_path(tmp_path):
    """add_result also accepts raw logits [N, K>5] and argsorts them."""
    import json

    from cotnet_tpu.data.real_labels import RealLabelsImagenet

    real = [[7], [3]]
    rj = tmp_path / "real.json"
    rj.write_text(json.dumps(real))
    rl = RealLabelsImagenet([f"ILSVRC2012_val_{i + 1:08d}.JPEG"
                             for i in range(2)], real_json=str(rj))
    logits = np.zeros((2, 10), np.float32)
    logits[0, 7] = 5.0   # top-1 hit
    logits[1, 9] = 5.0   # top-1 miss ...
    logits[1, 3] = 4.0   # ... but top-5 hit
    rl.add_result(logits)
    assert rl.get_accuracy(1) == 50.0
    assert rl.get_accuracy(5) == 100.0


def test_sharded_train_step_matches_single_device():
    """Global-batch semantics: the sharded step must produce the same loss
    and updated params as the unsharded one (GSPMD inserts collectives)."""
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    model = TinyNet()
    state, step = _make_state_and_step(model, ema_decay=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 3))
    batch = {"image": x, "label": jnp.arange(16) % 4}

    s1, m1 = step(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    state_r = jax.device_put(state, replicated(mesh))
    batch_s = shard_batch(batch, mesh)
    s2, m2 = step(state_r, batch_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    w1 = jax.tree.leaves(s1.params)[0]
    w2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-4,
                               atol=1e-5)
    # batch_stats must also match (global-batch BN == SyncBN semantics)
    b1 = jax.tree.leaves(s1.batch_stats)[0]
    b2 = jax.tree.leaves(s2.batch_stats)[0]
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-4,
                               atol=1e-5)


def test_mixup_targets_sum_to_one():
    mixup = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1,
                  num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    labels = jnp.arange(8) % 10
    out, tgt = mixup(jax.random.PRNGKey(1), x, labels)
    assert out.shape == x.shape and tgt.shape == (8, 10)
    np.testing.assert_allclose(np.asarray(jnp.sum(tgt, -1)), np.ones(8),
                               rtol=1e-5)


def test_adahessian_second_order_step():
    """AdaHessian with Hutchinson probes (reference optim/adahessian.py)."""
    from cotnet_tpu.train.optim import adahessian

    model = TinyNet()
    x = jnp.ones((8, 8, 8, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, training=True)
    tx = adahessian(0.01, weight_decay=1e-4)
    state = TrainState.create(variables, tx, ema=False)
    step = make_train_step(model, tx, lambda s: jnp.asarray(0.01),
                           cross_entropy, donate=False, second_order=True)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3)),
             "label": jnp.arange(8) % 4}
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_sharded_cotnet50_train_step():
    """The dryrun's coverage in CI: a REAL CoT model (Pallas aggregation in
    interpret mode) under GSPMD on the 8-fake-device mesh — sharded step ==
    single-device step (VERDICT r1 weak #6)."""
    from cotnet_tpu.models import create_model

    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    model = create_model("cotnet50", num_classes=4)
    x = jnp.ones((8, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           training=True)
    tx = create_optimizer(dict(opt="momentum", weight_decay=0.0,
                               momentum=0.9), 0.1)
    state = TrainState.create(variables, tx, ema=False)
    step = make_train_step(model, tx, lambda s: jnp.asarray(0.1),
                           cross_entropy, ema_decay=0.0, donate=False)
    xb = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 0.3
    batch = {"image": xb, "label": jnp.arange(8) % 4}

    s1, m1 = step(state, batch, jax.random.PRNGKey(2))

    mesh = make_mesh(8)
    state_r = jax.device_put(state, replicated(mesh))
    batch_s = shard_batch(batch, mesh)
    s2, m2 = step(state_r, batch_s, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    w1 = jax.tree.leaves(s1.params)[0]
    w2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-4,
                               atol=1e-5)
    b1 = jax.tree.leaves(s1.batch_stats)[0]
    b2 = jax.tree.leaves(s2.batch_stats)[0]
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-4,
                               atol=1e-5)
