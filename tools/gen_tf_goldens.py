"""Generate TF-preprocessing goldens from the ACTUAL TensorFlow ops.

Reproduces the reference eval path (datasets/tf_preprocessing.py:117-135,
165-182: decode_jpeg -> padded center crop -> tf.image.resize -> round to
uint8) with real TF, on deterministic synthetic JPEGs, and stores
jpeg bytes + expected outputs in tests/data/tf_goldens.npz.  The checked-in
goldens let CI assert bit parity without a TF dependency.

Run (needs tensorflow, present in this image):
    python tools/gen_tf_goldens.py
"""
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import numpy as np
from PIL import Image

CROP_PADDING = 32
SHAPES = [(300, 180), (180, 300), (224, 224), (500, 333), (97, 311)]
CONFIGS = [(224, "bicubic"), (224, "bilinear"), (240, "bicubic")]


def mkimg(w, h, rng):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 128 + 100 * np.sin(xx / 17) * np.cos(yy / 23)
    g = 128 + 100 * np.cos(xx / 11 + 1) * np.sin(yy / 13)
    b = xx / w * 127 + yy / h * 127
    img = np.stack([r, g, b], -1) + rng.randn(h, w, 3) * 8
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    import tensorflow as tf

    rng = np.random.RandomState(0)
    out = {}
    for i, (w, h) in enumerate(SHAPES):
        buf = io.BytesIO()
        Image.fromarray(mkimg(w, h, rng)).save(buf, format="JPEG", quality=95)
        jpeg = buf.getvalue()
        out[f"jpeg_{i}"] = np.frombuffer(jpeg, np.uint8)
        for size, method in CONFIGS:
            # _decode_and_center_crop (reference tf_preprocessing.py:117-135).
            # INTEGER_ACCURATE (libjpeg ISLOW) decodes bit-identically to
            # PIL, so the goldens pin the crop+resize+round pipeline exactly;
            # TF's default IFAST DCT differs from every ISLOW decoder by a
            # few LSBs — a cross-library JPEG variance, not a pipeline one.
            img_t = tf.io.decode_jpeg(jpeg, channels=3,
                                      dct_method="INTEGER_ACCURATE")
            pad = int((size / (size + CROP_PADDING)) * min(h, w))
            oh = ((h - pad) + 1) // 2
            ow = ((w - pad) + 1) // 2
            crop = tf.cast(img_t[oh:oh + pad, ow:ow + pad], tf.float32)
            res = tf.image.resize([crop], [size, size], method)[0].numpy()
            # TfPreprocessTransform.__call__ rounding (:228-232)
            gold = np.clip(np.round(res), 0, 255).astype(np.uint8)
            out[f"gold_{i}_{size}_{method}"] = gold
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "tf_goldens.npz")
    np.savez_compressed(dest, **out)
    print(f"wrote {dest}: {len(out)} arrays,"
          f" {os.path.getsize(dest) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
