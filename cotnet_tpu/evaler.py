"""Evaluator (reference evaler/evaler.py).

Builds the validation loader from the model's data config and accumulates
top-1/top-5 over the set.  No barrier / all-reduce code: eval batches are
padded with a ``valid`` mask (exact counting) and under GSPMD the counts in
the jitted step are already global.
"""

from __future__ import annotations

from typing import Optional

from cotnet_tpu.train.step import make_eval_step
from cotnet_tpu.utils.meters import TestMeter


class Evaler:
    def __init__(self, model, loader, logger=None, use_ema: bool = False,
                 tta_hflip: bool = False, real_labels=None):
        self.loader = loader
        self.logger = logger
        self.eval_step = make_eval_step(model, use_ema=use_ema,
                                        tta_hflip=tta_hflip,
                                        return_topk=real_labels is not None)
        self.use_ema = use_ema
        self.real_labels = real_labels  # RealLabelsImagenet, optional

    def __call__(self, epoch: int, state) -> dict:
        meter = TestMeter(self.logger)
        if self.real_labels is not None:
            self.real_labels.reset()
        for batch in self.loader:
            m = self.eval_step(state, batch)
            meter.update(m["top1_count"], m["top5_count"], m["n"])
            if self.real_labels is not None:
                import numpy as np
                topk = np.asarray(m["topk"])
                if "valid" in batch:  # drop eval padding rows
                    topk = topk[:int(np.asarray(batch["valid"]).sum())]
                self.real_labels.add_result(topk)
        meter.log_stats(epoch, tag="(ema)" if self.use_ema else "")
        out = {"top1": meter.top1_pct, "top5": meter.top5_pct,
               "samples": meter.n}
        if self.real_labels is not None:
            out["real_top1"] = self.real_labels.get_accuracy(1)
            out["real_top5"] = self.real_labels.get_accuracy(5)
        return out
