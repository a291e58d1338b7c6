"""Checkpointing (reference utils/checkpoint_saver.py:18-157 +
models/helpers.py:23-88 resume).

Orbax-backed saver with the reference's semantics:
- keep the top-``max_history`` checkpoints ranked by a metric
  (checkpoint_saver.py:59-101), atomic writes (orbax's tmp+rename);
- a rolling "last" checkpoint;
- periodic recovery checkpoints (``save_recovery`` :135-147) with
  ``find_recovery`` lookup (:149-156);
- resume restores the FULL train state: params, optimizer state,
  batch_stats, EMA, step (helpers.py:51-88 restores model/optimizer/
  scaler/epoch — the amp scaler has no TPU analog, bf16 needs no loss
  scaling).

Checkpoints are pytree directories; metadata (epoch, metric) lives in an
index JSON next to them.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _save_pytree(path: str, tree: Any):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def _restore_pytree(path: str, target: Any):
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), target)
    ckptr.close()
    return out


class CheckpointSaver:
    """Top-N + last + recovery checkpoint management."""

    def __init__(self, directory: str, max_history: int = 10,
                 metric_mode: str = "max", recovery_interval: int = 0):
        self.dir = os.path.abspath(directory)
        self.max_history = max_history
        self.mode = metric_mode
        self.recovery_interval = recovery_interval
        os.makedirs(self.dir, exist_ok=True)
        self.index_path = os.path.join(self.dir, "index.json")
        self.index = []
        if os.path.exists(self.index_path):
            with open(self.index_path) as f:
                self.index = json.load(f)

    # -- helpers -----------------------------------------------------------
    def _ckpt_path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"ckpt-{epoch}")

    def _write_index(self):
        with open(self.index_path, "w") as f:
            json.dump(self.index, f, indent=1)

    def _worst_first(self):
        return sorted(self.index, key=lambda e: e["metric"],
                      reverse=(self.mode == "min"))

    # -- public API --------------------------------------------------------
    def save_checkpoint(self, state, epoch: int, metric: float) -> None:
        """Save, rank by metric, prune beyond max_history
        (checkpoint_saver.py:71-101)."""
        path = self._ckpt_path(epoch)
        _save_pytree(path, state)
        self.index = [e for e in self.index if e["epoch"] != epoch]
        self.index.append({"epoch": epoch, "metric": float(metric),
                           "path": path})
        while len(self.index) > self.max_history:
            # never prune the just-saved epoch: 'last' must always point at
            # a live checkpoint (reference keeps last.pth.tar outside the
            # ranked set, checkpoint_saver.py:59-101)
            worst = next(e for e in self._worst_first()
                         if e["epoch"] != epoch)
            self.index.remove(worst)
            shutil.rmtree(worst["path"], ignore_errors=True)
        self._write_index()
        # rolling last
        last = os.path.join(self.dir, "last")
        if os.path.islink(last) or os.path.exists(last):
            if os.path.islink(last):
                os.unlink(last)
            else:
                shutil.rmtree(last, ignore_errors=True)
        os.symlink(path, last)

    def save_recovery(self, state, epoch: int) -> None:
        if self.recovery_interval and epoch % self.recovery_interval == 0:
            path = os.path.join(self.dir, "recovery")
            tmp = path + ".new"
            _save_pytree(tmp, state)
            if os.path.exists(path):
                shutil.rmtree(path, ignore_errors=True)
            os.rename(tmp, path)
            with open(os.path.join(self.dir, "recovery.json"), "w") as f:
                json.dump({"epoch": epoch}, f)

    def find_recovery(self) -> Optional[dict]:
        meta = os.path.join(self.dir, "recovery.json")
        path = os.path.join(self.dir, "recovery")
        if os.path.exists(meta) and os.path.isdir(path):
            with open(meta) as f:
                info = json.load(f)
            info["path"] = path
            return info
        return None

    def best(self) -> Optional[dict]:
        if not self.index:
            return None
        return self._worst_first()[-1]

    def restore(self, target, path: Optional[str] = None):
        """Restore a full TrainState (or any pytree) from ``path`` or the
        rolling last checkpoint."""
        if path is None:
            path = os.path.join(self.dir, "last")
        return _restore_pytree(os.path.realpath(path), target)


def save_weights(path: str, params, batch_stats=None, ema_params=None,
                 ema_batch_stats=None):
    """Save inference weights only (the analog of a published .pth.tar)."""
    tree = {"params": params, "batch_stats": batch_stats or {}}
    if ema_params is not None:
        tree["ema_params"] = ema_params
        tree["ema_batch_stats"] = ema_batch_stats or {}
    _save_pytree(path, tree)


def load_weights(path: str, target=None, use_ema: bool = False):
    """Load inference weights; prefers EMA when use_ema (helpers.py:26-35
    EMA key select)."""
    tree = _restore_pytree(path, target)
    if use_ema and "ema_params" in tree:
        return {"params": tree["ema_params"],
                "batch_stats": tree.get("ema_batch_stats", {})}
    return {"params": tree["params"],
            "batch_stats": tree.get("batch_stats", {})}
