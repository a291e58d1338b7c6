"""Native batch-ops tests: build via g++, parity vs numpy/PIL reference."""

import numpy as np
import pytest

from cotnet_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native lib unavailable")


def test_collate():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (8, 9, 3), np.uint8) for _ in range(5)]
    out = native.batch_collate(imgs, num_threads=3)
    np.testing.assert_array_equal(out, np.stack(imgs))


def test_hflip():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (6, 7, 3), np.uint8)
    ref = img[:, ::-1].copy()
    out = native.hflip_inplace(img.copy())
    np.testing.assert_array_equal(out, ref)


def test_crop_resize_identity():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    out = native.batch_crop_resize([img], [(0, 0, 16, 16)], (16, 16))
    np.testing.assert_array_equal(out[0], img)  # 1:1 resize is exact


def test_crop_resize_vs_numpy_bilinear():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (32, 40, 3), np.uint8)
    box = (4, 2, 24, 28)  # x, y, w, h
    oh, ow = 16, 16
    out = native.batch_crop_resize([img], [box], (oh, ow))[0]

    # numpy reference: same center-aligned bilinear
    x0, y0, cw, ch = box
    sy, sx = ch / oh, cw / ow
    ref = np.empty((oh, ow, 3), np.float32)
    for oy in range(oh):
        fy = (oy + 0.5) * sy - 0.5 + y0
        yy0 = int(np.floor(fy))
        wy = fy - yy0
        y0c, y1c = np.clip([yy0, yy0 + 1], 0, 31)
        for ox in range(ow):
            fx = (ox + 0.5) * sx - 0.5 + x0
            xx0 = int(np.floor(fx))
            wx = fx - xx0
            x0c, x1c = np.clip([xx0, xx0 + 1], 0, 39)
            top = img[y0c, x0c] + (img[y0c, x1c].astype(np.float32)
                                   - img[y0c, x0c]) * wx
            bot = img[y1c, x0c] + (img[y1c, x1c].astype(np.float32)
                                   - img[y1c, x0c]) * wx
            ref[oy, ox] = top + (bot - top) * wy
    np.testing.assert_allclose(out.astype(np.float32), ref, atol=1.0)


def test_batch_parallelism():
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 255, (20 + i, 30, 3), np.uint8) for i in range(16)]
    boxes = [(0, 0, 30, 20 + i) for i in range(16)]
    out = native.batch_crop_resize(imgs, boxes, (8, 8), num_threads=8)
    assert out.shape == (16, 8, 8, 3)
    out1 = native.batch_crop_resize(imgs, boxes, (8, 8), num_threads=1)
    np.testing.assert_array_equal(out, out1)
