"""ctypes binding for the C++ loader core (native/mla_native.cc).

Auto-builds `native/libmla_native.so` via make on first use; every entry point
degrades gracefully to the numpy/cv2 path when the toolchain or libjpeg is
unavailable, so the framework never hard-depends on the native build.

Resampling note: the native JPEG path uses area-weighted sampling that is
statistically, not bitwise, equivalent to the fallback's cv2.INTER_AREA
(pinned by tests/test_native.py correlation bounds). Multi-host runs should
use a homogeneous native build across hosts if bit-identical global batches
matter (pipeline.py's bit-match guarantee assumes one decode path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmla_native.so")

_lib = None
_tried = False
_LOCK = threading.Lock()          # train+test Loader producers race first use
_warned: set = set()


def _warn_once(tag: str, msg: str) -> None:
    if tag not in _warned:
        _warned.add(tag)
        warnings.warn(msg, stacklevel=3)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _LOCK:
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
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
            lib.mla_decode_jpeg_batch.restype = ctypes.c_int
            lib.mla_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
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
        # per-batch serial np.load on every native failure is 3-10x slower
        # than the pool — if this fires persistently, the cached npys use a
        # dtype/layout the C++ reader rejects (it handles <f4/<f8/<i4/<i8
        # C-order only)
        _warn_once("npy", f"native npy reader failed for {fails}/{n} items "
                          "(unsupported dtype/fortran_order?); using the "
                          "serial np.load fallback for this and similar "
                          "batches")
    # fallback
    out = np.zeros((n, per_item), dtype=out_dtype)
    for i, p in enumerate(paths):
        a = np.load(p).reshape(-1)[:per_item]
        out[i, :a.size] = a.astype(out_dtype)
    return out.reshape((n,) + item_shape)


def decode_jpeg_batch(paths: List[str], out_hw: Tuple[int, int]
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """((n, H, W, 3) uint8 RGB, (n, 2) original sizes).

    Failed slots are zeroed with hw=(0,0) — modality-dropout-safe (mirrors
    the reference's decode-error fallbacks, SURVEY.md §5.3) — on BOTH the
    native and the cv2/PIL fallback path; 100% failure warns loudly (it is
    indistinguishable from success in the output arrays)."""
    lib = _load()
    n = len(paths)
    h, w = out_hw
    if lib is not None:
        out = np.empty((n, h, w, 3), dtype=np.uint8)
        hw = np.empty((n, 2), dtype=np.int32)
        fails = lib.mla_decode_jpeg_batch(
            _paths_array(paths), n, out.ctypes.data_as(ctypes.c_void_p),
            h, w, hw.ctypes.data_as(ctypes.c_void_p))
        if fails == n and n > 0:
            _warn_once("jpeg_all",
                       "EVERY jpeg decode in the batch failed (first path: "
                       f"{paths[0]}); images are all-zero — check the "
                       "visual root / file extensions")
        return out, hw
    from mla_tpu.data.transforms import host_decode
    out = np.zeros((n, h, w, 3), dtype=np.uint8)
    hw = np.zeros((n, 2), dtype=np.int32)
    fails = 0
    for i, p in enumerate(paths):
        try:
            out[i], hw[i] = host_decode(p, (h, w))
        except Exception:
            fails += 1          # slot stays zeroed, hw=(0,0) — same
            #                     semantics as the native path
    if fails == n and n > 0:
        _warn_once("jpeg_all",
                   "EVERY jpeg decode in the batch failed (first path: "
                   f"{paths[0]}); images are all-zero — check the visual "
                   "root / file extensions")
    return out, hw
