"""Jitted train / eval steps (the hot loop — reference train.py:238-297).

TPU-first redesign of the reference inner loop:
- forward+backward+optimizer+EMA+metrics are ONE jitted program; there is no
  per-iteration host sync (the reference calls torch.cuda.synchronize every
  step, train.py:282) — the host only device_gets metrics at log intervals;
- the LR schedule is evaluated in-graph from ``state.step``;
- gradient averaging and global-batch BN statistics come from GSPMD when the
  batch is sharded over the data mesh (see parallel/mesh.py) — no explicit
  all-reduce calls (replaces DDP + scaled_all_reduce, train.py:287);
- EMA is a tree lerp fused into the same program (model_ema.py:45-53);
- mixup/cutmix run on-device inside the step when enabled (loader overlap
  comes free from async dispatch).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from cotnet_tpu.train.state import TrainState, ema_update


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    schedule_fn: Callable,
    loss_fn: Callable,
    ema_decay: float = 0.0,
    mixup_fn: Optional[Callable] = None,
    donate: bool = True,
    second_order: bool = False,
):
    """Build the jitted train step.

    The optimizer ``tx`` must be built with ``create_optimizer(cfg,
    schedule_wrapped)`` where the schedule reads ``state.step`` — we pass
    ``schedule_fn(step) * lr_scale`` through optax's inject_hyperparams-free
    route by letting tx consume a schedule directly; lr_scale multiplies via
    the injected schedule closure (see train_cli).
    """

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        images, labels = batch["image"], batch["label"]
        if mixup_fn is not None:
            mix_rng, step_rng = jax.random.split(step_rng)
            images, labels = mixup_fn(mix_rng, images, labels)

        def loss_inner(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, training=True,
                rngs={"dropout": step_rng},
                mutable=["batch_stats"])
            loss = loss_fn(out, labels)
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_inner, has_aux=True)(state.params)

        if second_order:
            # Hutchinson Hessian-diagonal probe for AdaHessian (the analog
            # of the reference's create_graph=True backward, train.py:249)
            z_rng = jax.random.fold_in(step_rng, 1)
            leaves, treedef = jax.tree.flatten(state.params)
            keys = jax.random.split(z_rng, len(leaves))
            z = treedef.unflatten([
                jax.random.rademacher(k, l.shape, jnp.float32)
                for k, l in zip(keys, leaves)])
            grad_only = lambda p: jax.grad(
                lambda q: loss_inner(q)[0])(p)
            _, hz = jax.jvp(grad_only, (state.params,), (z,))
            hessian_diag = jax.tree.map(lambda zi, hzi: zi * hzi, z, hz)
            updates, new_opt = tx.update(grads, state.opt_state, state.params,
                                         hessian_diag=hessian_diag)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema_p, new_ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay and state.ema_params is not None:
            new_ema_p = ema_update(state.ema_params, new_params, ema_decay)
            new_ema_bs = ema_update(state.ema_batch_stats, new_bs, ema_decay)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema_p,
            ema_batch_stats=new_ema_bs,
        )
        metrics = {
            "loss": loss,
            "lr": jnp.asarray(schedule_fn(state.step), jnp.float32)
                  * state.lr_scale,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, use_ema: bool = False, tta_hflip: bool = False,
                   return_topk: bool = False):
    """Top-1/top-5 correct counts (reference utils/meters.py:12-19); summed
    across the data mesh automatically under GSPMD.  ``tta_hflip`` averages
    logits with the horizontally flipped view (reference tta config knob)."""

    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        variables = {"params": params, "batch_stats": bs}
        logits = model.apply(variables, batch["image"], training=False)
        if tta_hflip:
            logits = 0.5 * (logits + model.apply(
                variables, batch["image"][:, :, ::-1, :], training=False))
        labels = batch["label"]
        valid = batch.get("valid", jnp.ones_like(labels, jnp.float32))
        k = min(5, logits.shape[-1])
        top5 = jax.lax.top_k(logits.astype(jnp.float32), k)[1]
        correct1 = (top5[:, 0] == labels).astype(jnp.float32) * valid
        correct5 = jnp.any(top5 == labels[:, None], axis=1
                           ).astype(jnp.float32) * valid
        out = {
            "top1_count": jnp.sum(correct1),
            "top5_count": jnp.sum(correct5),
            "n": jnp.sum(valid),
        }
        if return_topk:  # for ReaL-labels scoring (real_labels.py)
            out["topk"] = top5
        return out

    return jax.jit(eval_step)
