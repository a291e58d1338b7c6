"""Training driver (reference train.py).

Usage parity: ``python -m cotnet_tpu.train_cli --folder <exp_dir>`` where
the folder holds a ``config.yaml`` in the reference recipe format
(cot_experiments/*/config.yaml parse unchanged).  The torch.distributed
launcher disappears: one process per host, chips via the data mesh.

Smoke-mode extras beyond the reference: ``--synthetic`` runs on random data,
``--steps N`` caps iterations/epoch, ``--epochs N`` overrides the schedule
length — used by CI and the multichip dryrun.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="cotnet_tpu training")
    p.add_argument("--folder", required=True,
                   help="experiment dir containing config.yaml")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data (smoke mode)")
    p.add_argument("--steps", type=int, default=0,
                   help="cap steps per epoch (0 = full)")
    p.add_argument("--epochs", type=int, default=0,
                   help="override solver.epochs")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--real-labels", default="",
                   help="path to ImageNet ReaL real.json (eval-only; "
                        "reference validate.py --real-labels)")
    p.add_argument("--img-size", type=int, default=0,
                   help="override input resolution (smoke mode)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="override train/val batch size (smoke mode)")
    p.add_argument("--model", default="",
                   help="override model.name (smoke mode)")
    return p.parse_args(argv)


def setup_env(cfg):
    from cotnet_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed()
    mesh = make_mesh()
    seed = int(cfg.seed)
    np.random.seed(seed + jax.process_index())
    return mesh


def build_model(cfg):
    from cotnet_tpu.models import create_model, get_model_default_cfg

    m = cfg.model
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[m.dtype]
    model = create_model(
        m.name,
        num_classes=m.num_classes,
        drop_rate=m.drop,
        drop_path_rate=m.drop_path,
        drop_block_rate=m.drop_block,
        global_pool=m.gp,
        dtype=dtype,
        block_args=dict(impl=m.kernel_impl),
    )
    data_cfg = get_model_default_cfg(m.name)
    return model, data_cfg


def build_loaders(cfg, data_cfg, args, mesh):
    from cotnet_tpu.data.loader import Loader, SyntheticLoader

    size = data_cfg["input_size"][-1]
    num_classes = cfg.model.num_classes
    aug = cfg.augmentation
    if args.synthetic or cfg.data_loader.get("dataset_type") == "synthetic":
        steps = args.steps or 100
        train = SyntheticLoader(cfg.data_loader.batch_size, size, num_classes,
                                steps=steps, mesh=mesh)
        val = SyntheticLoader(cfg.data_loader.vbatch_size, size, num_classes,
                              steps=max(1, steps // 10), mesh=mesh)
        return train, val
    from cotnet_tpu.data.dataset import ImageFolderDataset, TarDataset

    root = cfg.data_loader.data_path
    mk = TarDataset if cfg.data_loader.get("dataset_type") == "tar" else \
        ImageFolderDataset
    train_ds = mk(os.path.join(root, "train") if os.path.isdir(
        os.path.join(root, "train")) else root)
    val_ds = mk(os.path.join(root, "val") if os.path.isdir(
        os.path.join(root, "val")) else root,
        class_to_idx=train_ds.class_to_idx)
    common = dict(mean=data_cfg["mean"], std=data_cfg["std"],
                  workers=cfg.data_loader.workers, mesh=mesh,
                  # real datasets decode on worker processes (the torch
                  # DataLoader equivalent) — threads can't scale PIL decode
                  # past ~1 core; on single/dual-core hosts processes only
                  # add IPC cost, so gate on the core count
                  worker_procs=(cfg.data_loader.workers > 1
                                and (os.cpu_count() or 1) > 2))
    train = Loader(
        train_ds, cfg.data_loader.batch_size, train=True, image_size=size,
        interpolation=aug.train_interpolation or "random",
        scale=tuple(aug.scale), ratio=tuple(aug.ratio), hflip=aug.hflip,
        vflip=aug.vflip, auto_augment=aug.aa, reprob=aug.reprob,
        remode=aug.remode, recount=aug.recount,
        num_aug_splits=aug.aug_splits, seed=int(cfg.seed), **common)
    val = Loader(
        val_ds, cfg.data_loader.vbatch_size, train=False, image_size=size,
        crop_pct=data_cfg["crop_pct"],
        interpolation=data_cfg["interpolation"], **common)
    return train, val


def main(argv=None):
    args = parse_args(argv)
    from cotnet_tpu.config import load_experiment
    from cotnet_tpu.data.mixup import Mixup
    from cotnet_tpu.evaler import Evaler
    from cotnet_tpu.parallel.mesh import replicated
    from cotnet_tpu.train import (
        TrainState, create_loss_fn, create_optimizer, create_scheduler,
        make_train_step, sync_lookahead)
    from cotnet_tpu.utils.checkpoint import CheckpointSaver
    from cotnet_tpu.utils.logger import logger_info, setup_default_logging
    from cotnet_tpu.utils.meters import TrainMeter

    cfg = load_experiment(args.folder)
    if args.model:
        cfg["model"]["name"] = args.model
    if args.epochs:
        cfg["solver"]["epochs"] = args.epochs
    if args.batch_size:
        cfg["data_loader"]["batch_size"] = args.batch_size
        cfg["data_loader"]["vbatch_size"] = args.batch_size
    logger = setup_default_logging(args.folder)
    mesh = setup_env(cfg)

    model, data_cfg = build_model(cfg)
    if args.img_size:
        c = data_cfg["input_size"][0]
        data_cfg["input_size"] = (c, args.img_size, args.img_size)
    train_loader, val_loader = build_loaders(cfg, data_cfg, args, mesh)
    steps_per_epoch = min(len(train_loader), args.steps) if args.steps else \
        len(train_loader)

    # complexity report (reference train.py:68-70)
    try:
        from cotnet_tpu.ops.flops import get_model_complexity
        gmacs, n_params = get_model_complexity(
            model, (1, *data_cfg["input_size"][1:], 3))
        logger_info(logger, f"model {cfg.model.name}: {n_params / 1e6:.1f}M "
                            f"params, {gmacs:.2f} GMACs")
    except Exception as e:  # cost analysis isn't load-bearing
        logger_info(logger, f"complexity report skipped: {e}")

    solver = dict(cfg.solver)
    solver["base_lr"] = solver.get("lr", 0.1)
    solver["seed"] = int(cfg.seed)
    schedule_fn, num_epochs = create_scheduler(solver, steps_per_epoch)
    tx = create_optimizer(solver, schedule_fn)

    mixup_active = ((cfg.augmentation.mixup > 0 or cfg.augmentation.cutmix > 0)
                    and not cfg.loss.jsd)  # JSD trains on hard labels
    loss_cfg = dict(cfg.loss)
    loss_cfg["aug_splits"] = cfg.augmentation.aug_splits
    train_loss, _ = create_loss_fn(loss_cfg, mixup_active)
    mixup_fn = None
    if mixup_active:
        mixup_fn = Mixup(
            mixup_alpha=cfg.augmentation.mixup,
            cutmix_alpha=cfg.augmentation.cutmix,
            prob=cfg.augmentation.mixup_prob,
            switch_prob=cfg.augmentation.mixup_switch_prob,
            mode=cfg.augmentation.mixup_mode,
            label_smoothing=cfg.loss.smoothing,
            num_classes=cfg.model.num_classes)

    # init / resume
    size = data_cfg["input_size"][-1]
    dummy = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(
            {"params": r, "dropout": jax.random.PRNGKey(0)}, x, training=True),
        out_shardings=replicated(mesh),
    )(jax.random.PRNGKey(int(cfg.seed)), dummy)
    ema = bool(cfg.model.model_ema)
    state = TrainState.create(variables, tx, ema=ema)
    state = jax.device_put(state, replicated(mesh))

    saver = CheckpointSaver(
        os.path.join(args.folder, "checkpoints"), max_history=10,
        metric_mode="max",
        recovery_interval=cfg.solver.recovery_interval)
    start_epoch = 0
    if cfg.model.resume:
        state = saver.restore(state, cfg.model.resume)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        logger_info(logger, f"resumed at epoch {start_epoch}")
    elif saver.find_recovery():
        info = saver.find_recovery()
        state = saver.restore(state, info["path"])
        start_epoch = info["epoch"]
        logger_info(logger, f"recovered from epoch {start_epoch}")

    train_step = make_train_step(
        model, tx, schedule_fn, train_loss,
        ema_decay=cfg.model.model_ema_decay if ema else 0.0,
        mixup_fn=mixup_fn)
    # mixup can switch off near the end of training (cfg mixup_off_epoch,
    # reference train.py handles it via loader flag)
    mixup_off_epoch = cfg.augmentation.mixup_off_epoch or 0
    train_step_nomix = None
    if mixup_fn is not None and mixup_off_epoch > 0:
        from cotnet_tpu.train.loss import label_smoothing_cross_entropy

        def _hard_loss(logits, labels):
            return label_smoothing_cross_entropy(logits, labels,
                                                 cfg.loss.smoothing)
        train_step_nomix = make_train_step(
            model, tx, schedule_fn, _hard_loss,
            ema_decay=cfg.model.model_ema_decay if ema else 0.0,
            mixup_fn=None)

    tta = bool(cfg.augmentation.tta)
    real_labels = None
    if args.real_labels:
        from cotnet_tpu.data.real_labels import RealLabelsImagenet
        real_labels = RealLabelsImagenet(
            val_loader.dataset.filenames(basename=True),
            real_json=args.real_labels)
    evaler = Evaler(model, val_loader, logger, tta_hflip=tta,
                    real_labels=real_labels)
    evaler_ema = (Evaler(model, val_loader, logger, use_ema=True,
                         tta_hflip=tta) if ema else None)

    if args.eval_only:
        results = evaler(start_epoch, state)
        if "real_top1" in results:
            logger_info(logger, f"ReaL top1 {results['real_top1']:.3f} "
                                f"top5 {results['real_top5']:.3f}")
        return

    if cfg.solver.start_epoch is not None and not start_epoch:
        start_epoch = int(cfg.solver.start_epoch)

    rng = jax.random.PRNGKey(int(cfg.seed) + 777)
    best = -1.0
    try:
        for epoch in range(start_epoch, num_epochs):
            step_fn = train_step
            if (train_step_nomix is not None
                    and epoch >= num_epochs - mixup_off_epoch):
                step_fn = train_step_nomix
            train_loader.set_epoch(epoch)
            meter = TrainMeter(steps_per_epoch, num_epochs,
                               cfg.solver.log_interval, logger,
                               cfg.data_loader.batch_size)
            for it, batch in enumerate(train_loader):
                if args.steps and it >= args.steps:
                    break
                meter.iter_tic()
                state, metrics = step_fn(state, batch, rng)
                meter.iter_toc()
                if (it + 1) % cfg.solver.log_interval == 0:
                    meter.update(float(metrics["loss"]),
                                 float(metrics["lr"]))
                meter.log_iter_stats(epoch, it)

            # epoch-end forced lookahead sync (reference train.py:295-296):
            # eval + checkpoint on the slow-merged weights
            state = sync_lookahead(state)
            results = evaler(epoch, state)
            if evaler_ema is not None:
                ema_results = evaler_ema(epoch, state)
                if ema_results["top1"] > results["top1"]:
                    results = ema_results
            metric = results[cfg.eval.eval_metric]
            saver.save_recovery(state, epoch + 1)
            saver.save_checkpoint(state, epoch + 1, metric)
            best = max(best, metric)
    except KeyboardInterrupt:
        pass
    logger_info(logger, f"done; best {cfg.eval.eval_metric}: {best:.3f}")


if __name__ == "__main__":
    main()
