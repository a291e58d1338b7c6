"""TF-style eval preprocessing (reference datasets/tf_preprocessing.py:1-236).

The reference embeds a TensorFlow graph to reproduce TF-trained models'
preprocessing exactly.  TF eval preprocessing is: central crop of fraction
``central_fraction`` (0.875), then bicubic resize to the target size —
reproduced here with PIL (no TF dependency), which matches to within
interpolation rounding.
"""

from __future__ import annotations

import numpy as np


class TfEvalPreprocess:
    def __init__(self, size: int, central_fraction: float = 0.875,
                 interpolation: str = "bicubic"):
        self.size = size
        self.central_fraction = central_fraction
        self.interpolation = interpolation

    def __call__(self, img):
        from cotnet_tpu.data.transforms import _interp

        w, h = img.size
        cw = int(round(w * self.central_fraction))
        ch = int(round(h * self.central_fraction))
        left, top = (w - cw) // 2, (h - ch) // 2
        img = img.crop((left, top, left + cw, top + ch))
        img = img.resize((self.size, self.size), _interp(self.interpolation))
        return np.asarray(img, dtype=np.uint8)
