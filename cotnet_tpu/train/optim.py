"""Optimizer factory (reference optim/optim_factory.py:34-119 + the custom
optimizer zoo optim/*.py).

Built on optax chains.  Parity features:
- no-weight-decay masking for 1-d params (bias/BN) and model-declared
  exclusions — reference add_weight_decay (optim_factory.py:19-32);
- the reference's 16 optimizer strings (fused apex variants map to their
  plain equivalents — on TPU, XLA fuses optimizer updates by construction);
- '<name>_lookahead' wrapper (optim_factory.py:117-118);
- gradient clipping modes norm/value/agc (utils/clip_grad.py:26-40) exposed
  as chain prefixes via ``clip_transform``.

AdamP/SGDP (projection-decoupled weight decay) are implemented natively
below; AdaHessian (second-order) requires a Hessian-vector product from the
train step and ships in a later revision of train/step.py.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def wd_mask(params) -> Any:
    """True where weight decay applies: ndim > 1 (optim_factory.py:19-32 —
    1-d params and biases get wd=0)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def _projection(p, update, delta: float, wd_ratio: float, eps: float):
    """AdamP/SGDP perturbation projection (reference adamp.py/sgdp.py):
    if the update is nearly parallel to a scale-invariant weight's channel
    direction, project it onto the tangent space and shrink wd."""
    if p.ndim < 2:
        return update, 1.0
    view = (p.shape[-1], -1)
    pv = jnp.reshape(jnp.moveaxis(p, -1, 0), view)
    uv = jnp.reshape(jnp.moveaxis(update, -1, 0), view)
    pn = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
    cos = jnp.abs(jnp.sum(pn * uv, axis=1)) / (
        jnp.linalg.norm(uv, axis=1) + eps)
    cond = jnp.max(cos) < delta / jnp.sqrt(pv.shape[1])
    proj = uv - pn * jnp.sum(pn * uv, axis=1, keepdims=True)
    proj = jnp.moveaxis(jnp.reshape(proj, (p.shape[-1],) + p.shape[:-1]), 0, -1)
    new_update = jnp.where(cond, proj, update)
    ratio = jnp.where(cond, wd_ratio, 1.0)
    return new_update, ratio


class _PState(NamedTuple):
    exp_avg: Any
    exp_avg_sq: Any
    count: jnp.ndarray


def _scale_by_adamp(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
                    delta=0.1, wd_ratio=0.1, nesterov=False):
    """AdamP direction (reference optim/adamp.py:1-107): Adam step with the
    perturbation projected off scale-invariant weight directions, plus
    ratio-scaled decoupled weight decay."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _PState(z, jax.tree.map(jnp.zeros_like, params),
                       jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        count = state.count + 1
        b1c = 1 - b1 ** count
        b2c = 1 - b2 ** count
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, grads)

        def upd(p, m, v, g):
            denom = jnp.sqrt(v / b2c) + eps
            d = ((b1 * m / b1c + (1 - b1) * g) if nesterov else m / b1c) / denom
            d, ratio = _projection(p, d, delta, wd_ratio, eps)
            if weight_decay:
                d = d + p * weight_decay * ratio
            return d

        updates = jax.tree.map(upd, params, exp_avg, exp_avg_sq, grads)
        return updates, _PState(exp_avg, exp_avg_sq, count)

    return optax.GradientTransformation(init, update)


def adamp(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          delta=0.1, wd_ratio=0.1, nesterov=False):
    return optax.chain(
        _scale_by_adamp(b1, b2, eps, weight_decay, delta, wd_ratio, nesterov),
        optax.scale_by_learning_rate(learning_rate))


def _scale_by_sgdp(momentum=0.9, dampening=0.0, eps=1e-8, weight_decay=0.0,
                   delta=0.1, wd_ratio=0.1, nesterov=False):
    """SGDP direction (reference optim/sgdp.py:1-96)."""

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, buf, params):
        new_buf = jax.tree.map(
            lambda b, g: momentum * b + (1 - dampening) * g, buf, grads)

        def upd(p, b, g):
            d = g + momentum * b if nesterov else b
            d, ratio = _projection(p, d, delta, wd_ratio, eps)
            if weight_decay:
                d = d + p * weight_decay * ratio
            return d

        return jax.tree.map(upd, params, new_buf, grads), new_buf

    return optax.GradientTransformation(init, update)


def sgdp(learning_rate, momentum=0.9, dampening=0.0, eps=1e-8,
         weight_decay=0.0, delta=0.1, wd_ratio=0.1, nesterov=False):
    return optax.chain(
        _scale_by_sgdp(momentum, dampening, eps, weight_decay, delta,
                       wd_ratio, nesterov),
        optax.scale_by_learning_rate(learning_rate))


class _LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              alpha: float = 0.5):
    """Lookahead wrapper (reference optim/lookahead.py): keep slow weights;
    every ``sync_period`` inner steps, pull fast weights toward slow by
    ``alpha`` and reset.  Implemented as a plain GradientTransformation over
    the fast params (no params wrapper needed, unlike optax.lookahead)."""

    def init(params):
        return _LookaheadState(inner.init(params),
                               jax.tree.map(jnp.copy, params),
                               jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        updates, inner_state = inner.update(grads, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def upd(u, p, s):
            fast = p + u
            slow_next = s + alpha * (fast - s)
            return (jnp.where(sync, slow_next - p, u),
                    jnp.where(sync, slow_next, s))

        pairs = jax.tree.map(upd, updates, params, state.slow)
        new_updates = jax.tree.map(lambda pr: pr[0], pairs,
                                   is_leaf=lambda x: isinstance(x, tuple))
        new_slow = jax.tree.map(lambda pr: pr[1], pairs,
                                is_leaf=lambda x: isinstance(x, tuple))
        return new_updates, _LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init, update)


def sync_lookahead(state, alpha: float = 0.5):
    """Epoch-end forced lookahead sync (reference train.py:295-296 ->
    optim/lookahead.py:29-43): slow += alpha * (fast - slow); fast = slow —
    so the end-of-epoch eval/checkpoint sees the slow-merged weights
    regardless of where the step counter sits in the sync period.

    Takes and returns a TrainState; a no-op when the optimizer chain has no
    lookahead wrapper.  ``alpha`` must match the wrapper's (create_optimizer
    always builds lookahead with alpha=0.5, as the reference does).
    """
    is_la = lambda x: isinstance(x, _LookaheadState)  # noqa: E731
    las = [s for s in jax.tree.leaves(state.opt_state, is_leaf=is_la)
           if is_la(s)]
    if not las:
        return state
    st = las[0]
    new_slow = jax.tree.map(lambda s, p: s + alpha * (p.astype(s.dtype) - s),
                            st.slow, state.params)
    new_params = jax.tree.map(lambda s, p: s.astype(p.dtype),
                              new_slow, state.params)
    new_opt = jax.tree.map(
        lambda x: _LookaheadState(x.inner, new_slow, x.count) if is_la(x)
        else x,
        state.opt_state, is_leaf=is_la)
    return state.replace(params=new_params, opt_state=new_opt)


class _AdaHessianState(NamedTuple):
    exp_avg: Any
    exp_hessian_sq: Any
    count: jnp.ndarray


def adahessian(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
               hessian_power=1.0):
    """AdaHessian (reference optim/adahessian.py): Adam-like update with the
    second moment built from Hutchinson Hessian-diagonal estimates.

    The Hessian diagonal arrives as an extra update arg (``hessian_diag``,
    computed by the train step via an hvp with Rademacher probes —
    make_train_step(second_order=True), the analog of the reference's
    create_graph=True backward, train.py:249).  Conv-kernel entries are
    spatially block-averaged as in the reference.
    """

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _AdaHessianState(z, jax.tree.map(jnp.zeros_like, params),
                                jnp.zeros((), jnp.int32))

    def _avg_spatial(h):
        if h.ndim == 4:  # HWIO conv kernel: average over spatial taps
            return jnp.broadcast_to(jnp.mean(jnp.abs(h), axis=(0, 1),
                                             keepdims=True), h.shape)
        return jnp.abs(h)

    def update(grads, state, params=None, *, hessian_diag=None, **_):
        assert hessian_diag is not None, (
            "adahessian needs hessian_diag from make_train_step("
            "second_order=True)")
        count = state.count + 1
        b1c = 1 - b1 ** count
        b2c = 1 - b2 ** count
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.exp_avg, grads)
        hd = jax.tree.map(_avg_spatial, hessian_diag)
        v = jax.tree.map(lambda v_, h: b2 * v_ + (1 - b2) * h * h,
                         state.exp_hessian_sq, hd)

        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(p, m_, v_):
            denom = jnp.power(jnp.sqrt(v_ / b2c), hessian_power) + eps
            step = (m_ / b1c) / denom
            if weight_decay:
                step = step + weight_decay * p
            return -lr * step

        updates = jax.tree.map(upd, params, m, v)
        return updates, _AdaHessianState(m, v, count)

    return optax.GradientTransformationExtraArgs(init, update)


def clip_transform(mode: Optional[str], value: float):
    """norm/value/agc (reference utils/clip_grad.py:26-40)."""
    if not mode or value is None or value <= 0:
        return optax.identity()
    if mode == "norm":
        return optax.clip_by_global_norm(value)
    if mode == "value":
        return optax.clip(value)
    if mode == "agc":
        return optax.adaptive_grad_clip(value)
    raise ValueError(f"unknown clip mode {mode!r}")


def create_optimizer(cfg: dict, schedule_or_lr, params=None,
                     no_weight_decay: Optional[set] = None):
    """Config -> optax.GradientTransformation.

    cfg keys (reference solver section): opt, weight_decay, momentum,
    opt_eps, opt_betas, clip_mode/clip_grad.  ``schedule_or_lr`` may be a
    float or an optax schedule; weight-decay masking always applies.
    """
    opt = cfg.get("opt", "sgd").lower()
    wd = cfg.get("weight_decay", 0.0)
    momentum = cfg.get("momentum", 0.9)
    eps = cfg.get("opt_eps", 1e-8)
    betas = cfg.get("opt_betas") or (0.9, 0.999)
    lr = schedule_or_lr

    use_lookahead = False
    if opt.startswith("lookahead_"):
        use_lookahead, opt = True, opt[len("lookahead_"):]
    if opt.endswith("_lookahead"):
        use_lookahead, opt = True, opt[:-len("_lookahead")]
    # apex fused variants -> plain equivalents (XLA fuses the update anyway)
    opt = {"fusedsgd": "sgd", "fusedmomentum": "momentum", "fusedadam": "adam",
           "fusedadamw": "adamw", "fusedlamb": "lamb",
           "fusednovograd": "novograd"}.get(opt, opt)

    mask = wd_mask
    decay = optax.masked(optax.add_decayed_weights(wd), mask) if wd else optax.identity()

    if opt in ("sgd", "momentum", "nesterov"):
        nesterov = opt in ("sgd", "nesterov")  # reference: 'sgd' == nesterov SGD
        tx = optax.chain(
            decay,
            optax.sgd(lr, momentum=momentum, nesterov=nesterov))
    elif opt == "adam":
        tx = optax.chain(decay, optax.adam(lr, *betas, eps))
    elif opt == "adamw":
        tx = optax.adamw(lr, *betas, eps, weight_decay=wd, mask=mask)
    elif opt == "nadam":
        tx = optax.chain(decay, optax.nadam(lr, *betas, eps))
    elif opt == "radam":
        tx = optax.chain(decay, optax.radam(lr, *betas, eps))
    elif opt == "adamp":
        # reference: delta=0.1, wd_ratio=0.01, nesterov=True (optim_factory.py:73-75);
        # wd masked off 1-d params via partition (add_weight_decay parity)
        def _mk_adamp(wd_):
            return adamp(lr, *betas, eps=eps, weight_decay=wd_, delta=0.1,
                         wd_ratio=0.01, nesterov=True)
        tx = optax.multi_transform(
            {"decay": _mk_adamp(wd), "no_decay": _mk_adamp(0.0)},
            lambda params: jax.tree.map(
                lambda p: "decay" if p.ndim > 1 else "no_decay", params))
    elif opt == "sgdp":
        def _mk_sgdp(wd_):
            return sgdp(lr, momentum=momentum, eps=eps, weight_decay=wd_,
                        nesterov=True)
        tx = optax.multi_transform(
            {"decay": _mk_sgdp(wd), "no_decay": _mk_sgdp(0.0)},
            lambda params: jax.tree.map(
                lambda p: "decay" if p.ndim > 1 else "no_decay", params))
    elif opt == "adadelta":
        tx = optax.chain(decay, optax.adadelta(lr, eps=eps))
    elif opt in ("rmsprop", "rmsproptf", "rmsprop_tf"):
        # rmsproptf: eps inside the sqrt + uncentered (reference rmsprop_tf.py)
        tf_style = opt != "rmsprop"
        tx = optax.chain(
            decay,
            optax.rmsprop(lr, decay=cfg.get("alpha", 0.9), eps=eps,
                          momentum=momentum,
                          eps_in_sqrt=tf_style, centered=False))
    elif opt == "novograd" or opt == "nvnovograd":
        tx = optax.chain(decay, optax.novograd(lr, *betas, eps=eps))
    elif opt == "adafactor":
        tx = optax.adafactor(lr if not isinstance(lr, float) else lr,
                             weight_decay_rate=wd or None,
                             weight_decay_mask=mask)
    elif opt == "lamb":
        tx = optax.lamb(lr, *betas, eps, weight_decay=wd, mask=mask)
    elif opt == "lars":
        tx = optax.lars(lr, weight_decay=wd, weight_decay_mask=mask,
                        momentum=momentum)
    elif opt == "adahessian":
        # pair with make_train_step(second_order=True)
        return adahessian(lr, *betas, eps=eps, weight_decay=wd)
    else:
        raise ValueError(f"Invalid optimizer {opt!r}")

    clip = clip_transform(cfg.get("clip_mode", "norm"), cfg.get("clip_grad"))
    tx = optax.chain(clip, tx)
    if use_lookahead:
        tx = lookahead(tx, sync_period=6, alpha=0.5)
    return tx
