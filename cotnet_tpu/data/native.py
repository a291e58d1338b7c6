"""ctypes bindings for the native host batch ops (native/batchops.cpp).

Builds the shared library on demand with g++ (no pybind11 in the image —
plain C ABI + ctypes).  Falls back gracefully: every caller checks
``available()`` and keeps the PIL/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbatchops.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "batchops.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-pthread", "-shared",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib = False
            return _lib
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = False
            return _lib
        lib.batch_crop_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.batch_collate_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_int]
        lib.hflip_u8.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


def batch_crop_resize(images: List[np.ndarray],
                      boxes: List[Tuple[int, int, int, int]],
                      out_size: Tuple[int, int],
                      num_threads: int = 8) -> np.ndarray:
    """Crop box (x, y, w, h) from each uint8 HWC image and bilinear-resize to
    out_size (oh, ow); returns one NHWC uint8 batch."""
    lib = _load()
    assert lib, "native batchops unavailable"
    n = len(images)
    oh, ow = out_size
    images = [np.ascontiguousarray(im) for im in images]
    dst = np.empty((n, oh, ow, 3), np.uint8)
    srcs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in images])
    mk = lambda vals: (ctypes.c_int * n)(*vals)  # noqa: E731
    lib.batch_crop_resize_u8(
        srcs,
        mk([im.shape[0] for im in images]), mk([im.shape[1] for im in images]),
        mk([b[0] for b in boxes]), mk([b[1] for b in boxes]),
        mk([b[2] for b in boxes]), mk([b[3] for b in boxes]),
        dst.ctypes.data_as(ctypes.c_void_p), n, oh, ow, num_threads)
    return dst


def batch_collate(images: List[np.ndarray], num_threads: int = 8) -> np.ndarray:
    """Parallel NHWC collation of equal-size uint8 HWC images."""
    lib = _load()
    assert lib, "native batchops unavailable"
    n = len(images)
    images = [np.ascontiguousarray(im) for im in images]
    dst = np.empty((n, *images[0].shape), np.uint8)
    srcs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in images])
    lib.batch_collate_u8(srcs, dst.ctypes.data_as(ctypes.c_void_p), n,
                         int(np.prod(images[0].shape)), num_threads)
    return dst


def hflip_inplace(img: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib, "native batchops unavailable"
    assert img.flags["C_CONTIGUOUS"]
    lib.hflip_u8(img.ctypes.data_as(ctypes.c_void_p), img.shape[0],
                 img.shape[1])
    return img
