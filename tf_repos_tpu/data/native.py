"""ctypes bridge to the native C++ libsvm parser (data-loader hot path).

Compiled on first use with g++ (no pybind11 dependency — plain C ABI).
The shared object is cached next to the source; if no toolchain is
available, ``available()`` returns False and the pure-NumPy parser in
data/libsvm.py is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native_src")
_SRC = os.path.join(_SRC_DIR, "libsvm_parser.cpp")
_LIB_PATH = os.path.join(_SRC_DIR, "libsvm_parser.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.parse_libsvm.restype = ctypes.c_int64
        lib.parse_libsvm.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.split_lines.restype = ctypes.c_int64
        lib.split_lines.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_libsvm_lines(
    lines: Sequence[bytes], field_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Same contract as data/libsvm.parse_libsvm_lines, C++-parsed."""
    lib = _load()
    n = len(lines)
    ids = np.zeros((n, field_size), np.int32)
    vals = np.zeros((n, field_size), np.float32)
    labels = np.zeros((n,), np.float32)
    if n == 0:
        return ids, vals, labels
    offsets = np.empty((n + 1,), np.int64)
    pos = 0
    for i, ln in enumerate(lines):
        offsets[i] = pos
        pos += len(ln) + 1
    offsets[n] = pos
    blob = b"\n".join(lines) + b"\n"
    lib.parse_libsvm(
        blob,
        len(blob),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        field_size,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return ids, vals, labels


def parse_libsvm_blob(
    blob: bytes, field_size: int, max_lines: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a whole file blob in C++ (split + parse, one pass each)."""
    lib = _load()
    cap = max_lines if max_lines is not None else blob.count(b"\n") + 1
    offsets = np.empty((cap + 1,), np.int64)
    n = lib.split_lines(
        blob, len(blob), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap
    )
    ids = np.zeros((n, field_size), np.int32)
    vals = np.zeros((n, field_size), np.float32)
    labels = np.zeros((n,), np.float32)
    if n:
        lib.parse_libsvm(
            blob,
            len(blob),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            field_size,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return ids, vals, labels
