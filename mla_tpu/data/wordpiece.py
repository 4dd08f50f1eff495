"""ctypes binding for the C++ WordPiece tokenizer (native/wordpiece.cc).

Self-contained replacement for HF BertTokenizer in the offline ETL stage
(reference: data/extract_token.py — tokens are cached .npy, never on the
training hot path). Same output contract: ids without special tokens, padded
to max_length, pm = 1 - attention_mask.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwordpiece.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wp_load_vocab.restype = ctypes.c_int
    lib.wp_load_vocab.argtypes = [ctypes.c_char_p]
    lib.wp_encode.restype = ctypes.c_int
    lib.wp_encode.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


# The C library holds ONE global vocab; track whose it is (path -> size) so
# two tokenizer instances with different vocabs don't silently read each
# other's tables — encode() reloads when another instance swapped vocabs.
_loaded_vocab = (None, 0)  # (abspath, size)


class WordPieceTokenizer:
    def __init__(self, vocab_path: str):
        self._lib = _load()
        self._vocab_path = os.path.abspath(vocab_path)
        self.vocab_size = self._ensure_vocab()

    def _ensure_vocab(self) -> int:
        global _loaded_vocab
        if _loaded_vocab[0] != self._vocab_path:
            n = self._lib.wp_load_vocab(self._vocab_path.encode())
            if n <= 0:
                raise FileNotFoundError(
                    f"cannot load vocab {self._vocab_path}")
            _loaded_vocab = (self._vocab_path, n)
        return _loaded_vocab[1]

    def encode(self, text: str, max_length: int = 256
               ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids (1, L) int64, pm (1, L) float32) like extract_token.py."""
        self._ensure_vocab()   # reload if another instance swapped vocabs
        ids = np.zeros((max_length,), np.int32)
        pm = np.zeros((max_length,), np.float32)
        n = self._lib.wp_encode(text.encode(), ids.ctypes.data_as(ctypes.c_void_p),
                                pm.ctypes.data_as(ctypes.c_void_p), max_length)
        if n < 0:
            raise RuntimeError("vocab not loaded")
        return ids[None].astype(np.int64), pm[None]
