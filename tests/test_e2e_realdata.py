"""Full-pipeline convergence gate: real JPEG files -> ImageFolderDataset ->
worker decode -> device augmentation -> train_cli epoch loop -> EMA eval ->
checkpoint-best selection, asserted to LEARN.

The reference's only integration test is a real train run
(/root/reference/train.py:299-375: train_epoch -> validate -> EMA validate ->
checkpoint by metric).  This drives our full driver on a tiny on-the-fly
ImageFolder whose classes are separable by color, and asserts (a) strict
train-loss decrease across epochs and (b) val top-1 above chance by a wide
margin — a regression anywhere in decode, augmentation, the train step, the
evaler, or checkpointing trips it.
"""

import os
import re

import numpy as np
import pytest
from PIL import Image

NUM_CLASSES = 4
IMGS_PER_CLASS = 12
EPOCHS = 5

# distinct base colors per class (learnable from heavy random crops)
_COLORS = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]


def _build_imagefolder(root):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for cls in range(NUM_CLASSES):
            d = os.path.join(root, split, f"class_{cls:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(IMGS_PER_CLASS):
                base = np.asarray(_COLORS[cls], np.float32)
                noise = rng.randn(40, 40, 3) * 18.0
                arr = np.clip(base + noise, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(d, f"img_{i}.jpg"), quality=90)


_CONFIG = """\
seed: 1.0
data_loader:
  data_path: '{root}'
  batch_size: 8
  vbatch_size: 8
  workers: 2
model:
  name: 'resnet18'
  num_classes: {nc}
  model_ema: True
  model_ema_decay: 0.9
augmentation:
  scale: [0.35, 1.0]
  hflip: 0.5
  mixup: 0.0
  cutmix: 0.0
loss:
  smoothing: 0.0
solver:
  opt: 'sgd'
  momentum: 0.9
  weight_decay: 0.00004
  sched: 'cosine'
  lr: 0.05
  warmup_lr: 0.001
  min_lr: 1e-4
  epochs: {epochs}
  warmup_epochs: 1
  log_interval: 1
  recovery_interval: 1
eval:
  eval_metric: 'top1'
"""


def test_cli_real_data_convergence(tmp_path):
    from cotnet_tpu import train_cli

    root = str(tmp_path / "data")
    _build_imagefolder(root)
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text(
        _CONFIG.format(root=root, nc=NUM_CLASSES, epochs=EPOCHS))

    train_cli.main(["--folder", str(exp), "--img-size", "32"])

    log = (exp / "log.txt").read_text()

    # (a) strict loss decrease: mean of first-epoch iter losses vs last-epoch
    losses = {}
    for m in re.finditer(r"epoch (\d+)/\d+ iter \d+/\d+ loss ([\d.]+)", log):
        losses.setdefault(int(m.group(1)), []).append(float(m.group(2)))
    assert len(losses) == EPOCHS, sorted(losses)
    first = np.mean(losses[1])
    last = np.mean(losses[EPOCHS])
    assert last < first, (first, last)

    # (b) val top-1 above chance by margin: chance is 25%, demand >= 60%
    top1s = [float(m.group(1))
             for m in re.finditer(r"eval epoch \d+: top1 ([\d.]+)", log)]
    assert len(top1s) == EPOCHS, log
    assert max(top1s) >= 60.0, top1s

    # EMA eval ran (exercises the ema_params path end to end)
    assert re.search(r"eval\(ema\) epoch \d+: top1", log) or \
        "ema" in log.lower(), "EMA eval missing from the epoch loop"

    # checkpoint-best selection: the best() entry's metric equals the best
    # logged top-1 and its checkpoint directory exists on disk
    import json
    with open(exp / "checkpoints" / "index.json") as f:
        index = json.load(f)
    best = max(index, key=lambda e: e["metric"])
    assert best["metric"] == pytest.approx(max(top1s), abs=1e-3)
    assert os.path.isdir(best["path"])
    assert os.path.isdir(str(exp / "checkpoints" / "recovery"))
