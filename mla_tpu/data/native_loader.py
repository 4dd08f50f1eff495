"""ctypes binding for the C++ loader core (native/mla_native.cc).

Auto-builds `native/libmla_native.so` via make on first use; every entry point
degrades gracefully to the numpy/cv2 path when the toolchain or libjpeg is
unavailable, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmla_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mla_load_npy_batch.restype = ctypes.c_int
        lib.mla_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.mla_decode_jpeg_batch.restype = ctypes.c_int
        lib.mla_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        assert lib.mla_native_version() >= 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_npy_batch(paths: List[str], item_shape: Tuple[int, ...],
                   dtype=np.float32) -> np.ndarray:
    """(len(paths),) + item_shape array; short files zero-padded, long files
    truncated (cut-and-pad, extract_fbank.py:42-52). Falls back to np.load."""
    lib = _load()
    n = len(paths)
    per_item = int(np.prod(item_shape))
    as_int = 1 if np.issubdtype(dtype, np.integer) else 0
    out_dtype = np.int32 if as_int else np.float32
    if lib is not None:
        out = np.empty((n, per_item), dtype=out_dtype)
        fails = lib.mla_load_npy_batch(
            _paths_array(paths), n, out.ctypes.data_as(ctypes.c_void_p),
            per_item, as_int)
        if fails == 0:
            return out.reshape((n,) + item_shape)
    # fallback
    out = np.zeros((n, per_item), dtype=out_dtype)
    for i, p in enumerate(paths):
        a = np.load(p).reshape(-1)[:per_item]
        out[i, :a.size] = a.astype(out_dtype)
    return out.reshape((n,) + item_shape)


def decode_jpeg_batch(paths: List[str], out_hw: Tuple[int, int]
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """((n, H, W, 3) uint8 RGB, (n, 2) original sizes). cv2 fallback."""
    lib = _load()
    n = len(paths)
    h, w = out_hw
    if lib is not None:
        out = np.empty((n, h, w, 3), dtype=np.uint8)
        hw = np.empty((n, 2), dtype=np.int32)
        lib.mla_decode_jpeg_batch(
            _paths_array(paths), n, out.ctypes.data_as(ctypes.c_void_p),
            h, w, hw.ctypes.data_as(ctypes.c_void_p))
        # failed slots are zeroed with hw=(0,0) — modality-dropout-safe
        # (mirrors the reference's decode-error fallbacks, SURVEY.md §5.3)
        return out, hw
    from mla_tpu.data.transforms import host_decode
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    hw = np.empty((n, 2), dtype=np.int32)
    for i, p in enumerate(paths):
        img, ohw = host_decode(p, h)
        out[i] = img if img.shape[:2] == (h, w) else \
            np.resize(img, (h, w, 3))
        hw[i] = ohw
    return out, hw
