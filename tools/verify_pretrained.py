#!/usr/bin/env python
"""Verify a published reference checkpoint against its README accuracy.

Usage:
    python tools/verify_pretrained.py <ckpt.pth.tar> --model cotnet50 \
        --data-dir /path/to/imagenet/val [--use-ema] [--batch-size 128]

Converts the torch checkpoint (utils/convert.py: OIHW->HWIO, cw-major ->
k-major embed permutation, EMA select per reference helpers.py:26-35), runs
the full ImageNet validation protocol (resize by crop_pct + center crop,
reference transforms_factory.py:132-166), and reports top-1/top-5 next to the
published table (reference README.md:43-52).

This environment has no network egress, so the published .pth.tar files
cannot be fetched here — run this tool the moment a checkpoint file is
available.  The conversion path itself is verified offline by
tests/test_convert_full.py (whole-network logit parity vs the reference's
torch modules).
"""

import argparse
import sys
import time

PUBLISHED = {
    # model: (input_size, top1, top5)  — reference README.md:45-52
    "cotnet50": (224, 81.3, 95.6),
    "cotnext50_2x48d": (224, 82.1, 95.9),
    "se_cotnetd_50": (224, 81.6, 95.8),
    "cotnet101": (224, 82.8, 96.2),
    "cotnext101_2x48d": (224, 83.2, 96.4),
    "se_cotnetd_101": (224, 83.2, 96.5),
    "se_cotnetd_152": (224, 84.0, 97.0),
    "se_cotnetd_152_L": (320, 84.6, 97.1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--model", required=True)
    ap.add_argument("--data-dir", required=True,
                    help="ImageNet val directory (folder or .tar)")
    ap.add_argument("--use-ema", action="store_true",
                    help="load the EMA weights (state_dict_ema)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--input-size", type=int, default=0,
                    help="override eval resolution (default: model cfg)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cotnet_tpu.models import create_model, get_model_default_cfg
    from cotnet_tpu.utils.convert import convert_torch_checkpoint
    from cotnet_tpu.eval.evaler import Evaler

    cfg = get_model_default_cfg(args.model)
    size = args.input_size or cfg["input_size"][1]
    model = create_model(args.model)
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))
    t0 = time.time()
    variables = convert_torch_checkpoint(
        args.checkpoint, shapes, model_name=args.model, use_ema=args.use_ema)
    print(f"converted {args.checkpoint} in {time.time() - t0:.1f}s "
          f"(ema={args.use_ema})")

    evaler = Evaler(model_name=args.model, data_dir=args.data_dir,
                    batch_size=args.batch_size, input_size=size,
                    crop_pct=cfg.get("crop_pct", 0.875),
                    interpolation=cfg.get("interpolation", "bicubic"),
                    mean=cfg.get("mean"), std=cfg.get("std"))
    top1, top5 = evaler.run(model, variables)
    print(f"{args.model}@{size}: top1={top1:.2f} top5={top5:.2f}")
    if args.model in PUBLISHED:
        _, ref1, ref5 = PUBLISHED[args.model]
        d1, d5 = top1 - ref1, top5 - ref5
        print(f"published: top1={ref1} top5={ref5} "
              f"(delta {d1:+.2f}/{d5:+.2f})")
        ok = abs(d1) <= 0.1 and abs(d5) <= 0.1
        print("PARITY OK" if ok else "PARITY FAIL (>0.1%)")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
