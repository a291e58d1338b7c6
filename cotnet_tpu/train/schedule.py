"""LR schedules (reference scheduler/ — cosine_lr.py, tanh_lr.py, step_lr.py,
plateau_lr.py, scheduler_factory.py).

TPU-first design: instead of a stateful host-side Scheduler object stepped
per epoch/update (reference scheduler.py:6-105), schedules are pure
``f(step) -> lr`` functions evaluated *in-graph* inside the jitted train
step — zero host sync.  Epoch granularity is recovered through
``steps_per_epoch``; all reference knobs (warmup, cycles via t_mul,
decay_rate, cycle_limit, lr noise) are supported.  The plateau schedule is
inherently metric-driven, so it is a small host-side controller emitting an
``lr_scale`` scalar that multiplies the in-graph schedule.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _warmup_wrap(fn, base_lr, warmup_t, warmup_lr_init, t_of_step):
    """Linear warmup override for t < warmup_t; the main schedule sees the
    *raw* t (reference Scheduler semantics: warmup replaces, not shifts —
    cosine_lr.py:86-95)."""
    def sched(step):
        t = t_of_step(step)
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * (
            t / jnp.maximum(warmup_t, 1e-8))
        main = fn(t)
        return jnp.where(t < warmup_t, warm, main) if warmup_t > 0 else main
    return sched


def _cycle_index(t, t_initial, t_mul):
    """(cycle index i, time within cycle, cycle length) — cosine_lr.py:68-85."""
    if t_mul == 1.0:
        i = jnp.floor(t / t_initial)
        t_curr = t - i * t_initial
        t_i = jnp.full_like(t, t_initial)
    else:
        i = jnp.floor(jnp.log1p(t / t_initial * (t_mul - 1)) / math.log(t_mul))
        start = t_initial * (jnp.power(t_mul, i) - 1) / (t_mul - 1)
        t_curr = t - start
        t_i = t_initial * jnp.power(t_mul, i)
    return i, t_curr, t_i


def cosine_schedule(base_lr: float, t_initial: float, lr_min: float = 0.0,
                    t_mul: float = 1.0, decay_rate: float = 1.0,
                    warmup_t: float = 0.0, warmup_lr_init: float = 0.0,
                    cycle_limit: int = 0, steps_per_epoch: int = 1):
    """SGDR cosine with warmup/restarts (reference cosine_lr.py:18-116)."""
    def main(t):
        i, t_curr, t_i = _cycle_index(t, t_initial, t_mul)
        gamma = jnp.power(decay_rate, i)
        lr = lr_min + 0.5 * (base_lr * gamma - lr_min) * (
            1 + jnp.cos(jnp.pi * t_curr / t_i))
        if cycle_limit:
            lr = jnp.where(i >= cycle_limit, lr_min, lr)
        return lr
    return _warmup_wrap(main, base_lr, warmup_t, warmup_lr_init,
                        lambda s: s / steps_per_epoch)


def tanh_schedule(base_lr: float, t_initial: float, lb: float = -6.0,
                  ub: float = 4.0, lr_min: float = 0.0, t_mul: float = 1.0,
                  decay_rate: float = 1.0, warmup_t: float = 0.0,
                  warmup_lr_init: float = 0.0, cycle_limit: int = 0,
                  steps_per_epoch: int = 1):
    """Hyperbolic-tangent decay (reference tanh_lr.py)."""
    def main(t):
        i, t_curr, t_i = _cycle_index(t, t_initial, t_mul)
        gamma = jnp.power(decay_rate, i)
        tr = t_curr / t_i
        lr = lr_min + 0.5 * (base_lr * gamma - lr_min) * (
            1 - jnp.tanh(lb * (1.0 - tr) + ub * tr))
        if cycle_limit:
            lr = jnp.where(i >= cycle_limit, lr_min, lr)
        return lr
    return _warmup_wrap(main, base_lr, warmup_t, warmup_lr_init,
                        lambda s: s / steps_per_epoch)


def step_schedule(base_lr: float, decay_epochs: float, decay_rate: float = 1.0,
                  warmup_t: float = 0.0, warmup_lr_init: float = 0.0,
                  steps_per_epoch: int = 1):
    """Fixed-interval step decay (reference step_lr.py)."""
    def main(t):
        return base_lr * jnp.power(decay_rate, jnp.floor(t / decay_epochs))
    return _warmup_wrap(main, base_lr, warmup_t, warmup_lr_init,
                        lambda s: s / steps_per_epoch)


def multistep_schedule(base_lr: float, milestones: Sequence[float],
                       decay_rate: float = 0.1, warmup_t: float = 0.0,
                       warmup_lr_init: float = 0.0, steps_per_epoch: int = 1):
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def main(t):
        n = jnp.sum(t >= ms)
        return base_lr * jnp.power(decay_rate, n)
    return _warmup_wrap(main, base_lr, warmup_t, warmup_lr_init,
                        lambda s: s / steps_per_epoch)


def with_lr_noise(sched: Callable, t_initial: float, steps_per_epoch: int,
                  noise_range_pct, noise_pct: float = 0.67,
                  noise_std: float = 1.0, seed: int = 42):
    """Multiplicative LR noise inside a fractional-epoch window
    (reference scheduler.py:71-80), deterministic per epoch."""
    if noise_range_pct is None:
        return sched
    if isinstance(noise_range_pct, (list, tuple)):
        lo, hi = (noise_range_pct[0] * t_initial,
                  noise_range_pct[1] * t_initial)
    else:
        lo, hi = noise_range_pct * t_initial, float("inf")
    key = jax.random.PRNGKey(seed)

    def noisy(step):
        lr = sched(step)
        t = jnp.floor(step / steps_per_epoch).astype(jnp.int32)
        k = jax.random.fold_in(key, t)
        if noise_std > 0:
            # rejection-free: clip a normal draw to +-noise_pct
            n = jnp.clip(jax.random.normal(k) * noise_std, -noise_pct,
                         noise_pct)
        else:
            n = 2 * (jax.random.uniform(k) - 0.5) * noise_pct
        tf = step / steps_per_epoch
        return jnp.where((tf >= lo) & (tf < hi), lr + lr * n, lr)
    return noisy


class PlateauController:
    """Host-side reduce-on-plateau (reference plateau_lr.py): call
    ``update(metric)`` per epoch; multiply the base lr by ``scale``."""

    def __init__(self, decay_rate=0.1, patience=10, threshold=1e-4,
                 mode="max", cooldown=10, min_scale=0.0):
        self.decay_rate, self.patience = decay_rate, patience
        self.threshold, self.mode = threshold, mode
        self.cooldown_t, self.min_scale = cooldown, min_scale
        self.scale = 1.0
        self.best = None
        self.num_bad = 0
        self.cooldown = 0

    def _better(self, m):
        if self.best is None:
            return True
        if self.mode == "max":
            return m > self.best * (1 + self.threshold)
        return m < self.best * (1 - self.threshold)

    def update(self, metric: float) -> float:
        if self._better(metric):
            self.best, self.num_bad = metric, 0
        elif self.cooldown > 0:
            self.cooldown -= 1
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.decay_rate, self.min_scale)
                self.cooldown = self.cooldown_t
                self.num_bad = 0
        return self.scale


def create_scheduler(cfg: dict, steps_per_epoch: int):
    """Config -> (schedule fn, total epochs incl. cooldown) — mirrors
    scheduler_factory.py:10-87 including the cycle-aware epoch count."""
    num_epochs = cfg.get("epochs", 200)
    sched_name = cfg.get("sched", "cosine")
    base_lr = cfg.get("base_lr", cfg.get("lr", 0.1))
    min_lr = cfg.get("min_lr", 0.0)
    warmup_epochs = cfg.get("warmup_epochs", 0)
    warmup_lr = cfg.get("warmup_lr", 1e-4)
    cycle_mul = cfg.get("lr_cycle_mul", 1.0)
    cycle_limit = cfg.get("lr_cycle_limit", 1)
    decay_rate = cfg.get("decay_rate", 0.1)
    cooldown = cfg.get("cooldown_epochs", 0)

    if sched_name in ("cosine", "tanh") and cycle_limit > 1:
        if cycle_mul == 1.0:
            total = num_epochs * cycle_limit
        else:
            total = int(math.floor(
                -num_epochs * (cycle_mul ** cycle_limit - 1) / (1 - cycle_mul)))
    else:
        total = num_epochs

    if sched_name == "cosine":
        fn = cosine_schedule(base_lr, num_epochs, lr_min=min_lr,
                             t_mul=cycle_mul, decay_rate=decay_rate,
                             warmup_t=warmup_epochs, warmup_lr_init=warmup_lr,
                             cycle_limit=cycle_limit,
                             steps_per_epoch=steps_per_epoch)
    elif sched_name == "tanh":
        fn = tanh_schedule(base_lr, num_epochs, lr_min=min_lr,
                           t_mul=cycle_mul, decay_rate=decay_rate,
                           warmup_t=warmup_epochs, warmup_lr_init=warmup_lr,
                           cycle_limit=cycle_limit,
                           steps_per_epoch=steps_per_epoch)
    elif sched_name == "step":
        fn = step_schedule(base_lr, cfg.get("decay_epochs", 30), decay_rate,
                           warmup_t=warmup_epochs, warmup_lr_init=warmup_lr,
                           steps_per_epoch=steps_per_epoch)
    elif sched_name == "multistep":
        fn = multistep_schedule(base_lr, cfg.get("decay_milestones", [30, 60]),
                                decay_rate, warmup_t=warmup_epochs,
                                warmup_lr_init=warmup_lr,
                                steps_per_epoch=steps_per_epoch)
    elif sched_name == "plateau":
        # constant in-graph schedule; host multiplies via PlateauController
        fn = _warmup_wrap(lambda t: jnp.asarray(base_lr, jnp.float32),
                          base_lr, warmup_epochs, warmup_lr,
                          lambda s: s / steps_per_epoch)
    else:
        raise ValueError(f"unknown sched {sched_name!r}")

    fn = with_lr_noise(fn, num_epochs, steps_per_epoch,
                       cfg.get("lr_noise"), cfg.get("lr_noise_pct", 0.67),
                       cfg.get("lr_noise_std", 1.0), cfg.get("seed", 42))
    return fn, total + cooldown
