"""ctypes bindings for the native data-path library.

Builds on demand (g++, a few seconds) and falls back cleanly: callers
check `available()` and keep the pure-python path when the toolchain is
missing.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libadlm_data.so")
_lib: Optional[ctypes.CDLL] = None
_lib_attempted: List[str] = []


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    # Two passes: a stale prebuilt .so (missing a symbol added since it
    # was compiled) raises AttributeError at binding time — rebuild once
    # and retry before giving up, so callers degrade to the python path
    # instead of crashing.  dlopen caches the stale mapping by pathname
    # within this process, so the retry loads through a fresh temp copy.
    for rebuild in (not os.path.exists(_LIB_PATH), True):
        path = _LIB_PATH
        if rebuild:
            try:
                subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                               check=True, capture_output=True)
                if _lib_attempted:
                    fd, path = tempfile.mkstemp(suffix=".so")
                    os.close(fd)
                    shutil.copy(_LIB_PATH, path)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(path)
            _lib_attempted.append(path)
            _bind(lib)
        except (OSError, AttributeError):
            continue
        _lib = lib
        return lib
    return None


def _bind(lib: ctypes.CDLL) -> None:
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, f32p, ctypes.c_int,
                                       ctypes.c_int]
    lib.resize_nearest_i32.argtypes = [i32p, ctypes.c_int, ctypes.c_int,
                                       i32p, ctypes.c_int, ctypes.c_int]
    lib.augment_sample.argtypes = [
        u8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, f32p, i32p, f32p, i32p,
    ]
    lib.augment_sample_fused.argtypes = [
        u8p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, i32p, ctypes.c_int, f32p, i32p,
    ]
    lib.remap_bilinear_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.remap_nearest_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.gaussian_blur_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p, f32p,
    ]


def available() -> bool:
    return _load() is not None


def resize_bilinear_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.resize_bilinear_u8(img, h, w, c, out, dh, dw)
    return out


def resize_nearest_i32(label: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    label = np.ascontiguousarray(label, np.int32)
    h, w = label.shape
    out = np.empty((dh, dw), np.int32)
    lib.resize_nearest_i32(label, h, w, out, dh, dw)
    return out


_EMPTY_LUT = np.zeros(1, np.int32)


def augment_sample(img: np.ndarray, label: np.ndarray,
                   scale: float, window: Tuple[int, int],
                   start: Tuple[int, int], flip: bool,
                   mean: Tuple[float, ...], std: Tuple[float, ...],
                   cells: bool = False, normalize: bool = True,
                   label_lut: Optional[np.ndarray] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Full reference-parity training transform, natively.

    img: (H, W, 3) uint8 (a read-only np.memmap works — the kernel
    reads only the sampled region); label: (H, W) int32 or uint8;
    returns (window_h, window_w, 3) float32 + (window_h, window_w)
    int32.

    Uses the FUSED kernel: only window pixels are computed, sampling
    the source directly at the scaled crop coordinates — O(window²)
    instead of O(scale²·H·W), bit-identical per-pixel math (the
    resize-then-crop kernel remains exported; equality is asserted in
    tests/test_native.py).  ``label_lut`` applies the class table's
    raw→train-id remap to the cropped pixels (commutes with nearest
    resampling; padding stays train-id 0).
    """
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    if label.dtype == np.uint8:
        label = np.ascontiguousarray(label)
        label_u8 = 1
    else:
        label = np.ascontiguousarray(label, np.int32)
        label_u8 = 0
    h, w, c = img.shape
    sh2, sw2 = int(h * scale), int(w * scale)
    wh, ww = window
    out_img = np.empty((wh, ww, c), np.float32)
    out_label = np.empty((wh, ww), np.int32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    if label_lut is None:
        lut, lut_size = _EMPTY_LUT, 0
    else:
        lut = np.ascontiguousarray(label_lut, np.int32)
        lut_size = lut.shape[0]
    lib.augment_sample_fused(
        img, label.ctypes.data_as(ctypes.c_void_p), label_u8,
        h, w, c, sh2, sw2, wh, ww,
        start[0], start[1], int(flip), int(cells),
        int(normalize), mean_a, std_a, lut, lut_size,
        out_img.reshape(-1), out_label.reshape(-1))
    return out_img, out_label


def augment_sample_unfused(img: np.ndarray, label: np.ndarray,
                           scale: float, window: Tuple[int, int],
                           start: Tuple[int, int], flip: bool,
                           mean: Tuple[float, ...],
                           std: Tuple[float, ...],
                           cells: bool = False, normalize: bool = True
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Resize-then-crop reference kernel (kept for the fused-equality
    test; the pipeline uses ``augment_sample``)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    label = np.ascontiguousarray(label, np.int32)
    h, w, c = img.shape
    sh2, sw2 = int(h * scale), int(w * scale)
    wh, ww = window
    scratch_img = np.empty((sh2, sw2, c), np.float32)
    scratch_label = np.empty((sh2, sw2), np.int32)
    out_img = np.empty((wh, ww, c), np.float32)
    out_label = np.empty((wh, ww), np.int32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.augment_sample(img, label, h, w, c, sh2, sw2, wh, ww,
                       start[0], start[1], int(flip), int(cells),
                       int(normalize), mean_a, std_a,
                       scratch_img.reshape(-1), scratch_label.reshape(-1),
                       out_img.reshape(-1), out_label.reshape(-1))
    return out_img, out_label


def remap_bilinear(img: np.ndarray, map_y: np.ndarray,
                   map_x: np.ndarray) -> np.ndarray:
    """cv2.remap(INTER_LINEAR, BORDER_REFLECT_101) for float32
    (H, W[, C]) images."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    img3 = np.ascontiguousarray(
        img[..., None] if squeeze else img, np.float32)
    h, w, c = img3.shape
    oh, ow = map_y.shape
    out = np.empty((oh, ow, c), np.float32)
    lib.remap_bilinear_f32(
        img3.reshape(-1), h, w, c,
        np.ascontiguousarray(map_y, np.float32).reshape(-1),
        np.ascontiguousarray(map_x, np.float32).reshape(-1),
        oh, ow, out.reshape(-1))
    return out[..., 0] if squeeze else out


def remap_nearest(mask: np.ndarray, map_y: np.ndarray,
                  map_x: np.ndarray) -> np.ndarray:
    """cv2.remap(INTER_NEAREST, BORDER_REFLECT_101) for float32 masks."""
    lib = _load()
    assert lib is not None
    mask = np.ascontiguousarray(mask, np.float32)
    h, w = mask.shape
    oh, ow = map_y.shape
    out = np.empty((oh, ow), np.float32)
    lib.remap_nearest_f32(
        mask.reshape(-1), h, w,
        np.ascontiguousarray(map_y, np.float32).reshape(-1),
        np.ascontiguousarray(map_x, np.float32).reshape(-1),
        oh, ow, out.reshape(-1))
    return out


def gaussian_blur(src: np.ndarray, sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter(mode='constant', truncate=4)
    equivalent for float32 (H, W)."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src, np.float32)
    h, w = src.shape
    tmp = np.empty((h, w), np.float32)
    out = np.empty((h, w), np.float32)
    lib.gaussian_blur_f32(src.reshape(-1), h, w, ctypes.c_float(sigma),
                          tmp.reshape(-1), out.reshape(-1))
    return out
