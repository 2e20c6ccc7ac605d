"""ctypes bindings for the native data-path library (libimageops.so).

Falls back silently when the library isn't built; the cv2/numpy pipeline
is always available. Build with ``make -C dat_segmentation_tpu/native``
(done automatically on first import when g++ is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libimageops.so"
_lib = None


def _build():
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    ci = ctypes.c_int
    cf = ctypes.c_float

    lib.resize_bilinear_u8.argtypes = [u8p, ci, ci, ci, u8p, ci, ci]
    lib.resize_nearest_i32.argtypes = [i32p, ci, ci, i32p, ci, ci]
    lib.normalize_pad_f32.argtypes = [u8p, ci, ci, f32p, f32p, f32p, ci, ci, cf]
    lib.crop_cat_ok.argtypes = [i32p, ci, ci, ci, ci, ci, ci, ci, ci, cf]
    lib.crop_cat_ok.restype = ci
    lib.photometric_distortion_u8.argtypes = [u8p, ci, ci, cf, cf, cf, cf, ci]
    lib.intersect_union_i32.argtypes = [i32p, i32p, ci, ci, ci, i64p, i64p, i64p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def enabled() -> bool:
    return os.environ.get("DAT_TPU_NATIVE", "0") == "1" and available()


# ---------------------------------------------------------------------------
# numpy-facing wrappers
# ---------------------------------------------------------------------------


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = load()
    out = np.empty((oh, ow, img.shape[2]), np.uint8)
    lib.resize_bilinear_u8(
        np.ascontiguousarray(img), img.shape[0], img.shape[1], img.shape[2],
        out, oh, ow,
    )
    return out


def resize_nearest_i32(mask: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = load()
    out = np.empty((oh, ow), np.int32)
    lib.resize_nearest_i32(
        np.ascontiguousarray(mask.astype(np.int32)),
        mask.shape[0], mask.shape[1], out, oh, ow,
    )
    return out


def normalize_pad_f32(
    img: np.ndarray, mean, std, oh: int, ow: int, pad_value: float = 0.0
) -> np.ndarray:
    lib = load()
    out = np.empty((oh, ow, 3), np.float32)
    stdinv = (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    lib.normalize_pad_f32(
        np.ascontiguousarray(img.astype(np.uint8)),
        img.shape[0], img.shape[1],
        np.asarray(mean, np.float32), stdinv, out, oh, ow, pad_value,
    )
    return out


def crop_cat_ok(mask, top, left, ch, cw, *, num_classes=150,
                ignore_index=255, max_ratio=0.75) -> bool:
    lib = load()
    m = np.ascontiguousarray(mask.astype(np.int32))
    return bool(
        lib.crop_cat_ok(m, m.shape[0], m.shape[1], top, left, ch, cw,
                        num_classes, ignore_index, max_ratio)
    )


def photometric_distortion_u8(img, *, brightness=0.0, contrast=1.0,
                              saturation=1.0, hue=0.0, contrast_first=False):
    lib = load()
    out = np.ascontiguousarray(img.astype(np.uint8)).copy()
    lib.photometric_distortion_u8(
        out, img.shape[0], img.shape[1],
        brightness, contrast, saturation, hue, int(contrast_first),
    )
    return out


def intersect_union(pred, label, num_classes, ignore_index=255):
    lib = load()
    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    area = np.zeros(num_classes, np.int64)
    p = np.ascontiguousarray(pred.astype(np.int32)).reshape(-1)
    l = np.ascontiguousarray(label.astype(np.int32)).reshape(-1)
    lib.intersect_union_i32(p, l, p.size, num_classes, ignore_index,
                            inter, union, area)
    return inter, union, area
