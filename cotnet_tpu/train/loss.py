"""Training losses (reference loss/cross_entropy.py, loss/jsd.py,
loss/asymmetric_loss.py).

All take logits [N, K] and either int labels [N] or soft targets [N, K], and
return a scalar mean loss in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_cross_entropy(logits, labels, smoothing: float = 0.1):
    """Reference loss/cross_entropy.py:6-26."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_cross_entropy(logits, target):
    """Soft targets from mixup/cutmix (reference loss/cross_entropy.py:29-36)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-target.astype(jnp.float32) * logp, axis=-1))


def jsd_cross_entropy(logits_splits, labels, num_splits: int = 3,
                      alpha: float = 12.0, smoothing: float = 0.1):
    """JSD consistency loss for AugMix training (reference loss/jsd.py:8-39):
    CE on the clean split + alpha * JS divergence across all splits.

    logits_splits: [num_splits * N, K] — clean first (see AugMixDataset).
    """
    logits_splits = logits_splits.astype(jnp.float32)
    split = jnp.split(logits_splits, num_splits, axis=0)
    if smoothing > 0:
        ce = label_smoothing_cross_entropy(split[0], labels, smoothing)
    else:
        ce = cross_entropy(split[0], labels)
    probs = [jax.nn.softmax(s, axis=-1) for s in split]
    mixture = jnp.clip(sum(probs) / len(probs), 1e-7, 1.0)
    logm = jnp.log(mixture)
    kl = sum(jnp.sum(p * (jnp.log(jnp.clip(p, 1e-7, 1.0)) - logm), axis=-1)
             for p in probs) / len(probs)
    return ce + alpha * jnp.mean(kl)


def asymmetric_loss_multilabel(logits, target, gamma_neg: float = 4.0,
                               gamma_pos: float = 1.0, clip: float = 0.05,
                               eps: float = 1e-8):
    """ASL for multi-label (reference asymmetric_loss.py:5-52)."""
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    pn = jnp.clip(1.0 - p + clip, a_max=1.0) if clip else (1.0 - p)
    loss_pos = target * jnp.log(jnp.clip(p, eps))
    loss_neg = (1.0 - target) * jnp.log(jnp.clip(pn, eps))
    loss = loss_pos + loss_neg
    pt = p * target + pn * (1.0 - target)
    gamma = gamma_pos * target + gamma_neg * (1.0 - target)
    loss = loss * jnp.power(1.0 - pt, gamma)
    return -jnp.sum(loss)


def asymmetric_loss_single_label(logits, labels, gamma_neg: float = 4.0,
                                 gamma_pos: float = 0.0, smoothing: float = 0.1,
                                 eps: float = 0.1):
    """ASL for single-label (reference asymmetric_loss.py:55-97)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if eps > 0:
        onehot = onehot * (1 - eps) + eps / num_classes
    p = jnp.exp(logp)
    # focal weighting: pt = p on the target class, 1-p elsewhere
    pt = p * onehot + (1.0 - p) * (1.0 - onehot)
    gamma = gamma_pos * onehot + gamma_neg * (1.0 - onehot)
    focal = jnp.power(1.0 - pt, gamma)
    loss = -onehot * logp * focal
    return jnp.mean(jnp.sum(loss, axis=-1))


def create_loss_fn(cfg_loss: dict, mixup_active: bool = False):
    """Loss selection mirroring train.py:198-209.

    Returns (train_loss_fn(logits, target), eval_loss_fn(logits, labels)).
    Train target is soft [N, K] when mixup is active, int labels otherwise.
    """
    jsd = cfg_loss.get("jsd", False)
    smoothing = cfg_loss.get("smoothing", 0.0)
    aug_splits = cfg_loss.get("aug_splits", 0)
    if jsd:
        assert aug_splits > 1, "JSD needs aug splits"
        def train_fn(logits, labels):
            return jsd_cross_entropy(logits, labels, num_splits=aug_splits,
                                     smoothing=smoothing)
    elif mixup_active:
        train_fn = soft_target_cross_entropy
    elif smoothing:
        def train_fn(logits, labels):
            return label_smoothing_cross_entropy(logits, labels, smoothing)
    else:
        train_fn = cross_entropy
    return train_fn, cross_entropy
