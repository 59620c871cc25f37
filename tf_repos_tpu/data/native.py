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
_SRCS = [
    os.path.join(_SRC_DIR, "libsvm_parser.cpp"),
    os.path.join(_SRC_DIR, "aliccp_parser.cpp"),
    os.path.join(_SRC_DIR, "coo_combine.cpp"),
]
_LIB_PATH = os.path.join(_SRC_DIR, "native_parsers.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    """Compile the parsers, multi-process safe.

    Concurrent processes (run_dist.sh workers, multi-host runs sharing a
    checkout) must not race g++ on the same output path — a torn .so
    would fail CDLL for every process and latch the slow NumPy fallback.
    Build to a per-process temp name and os.rename() into place (atomic
    on the same filesystem), serialized by an flock so at most one
    compile runs."""
    if _is_fresh(_LIB_PATH):
        return _LIB_PATH
    lockfile = _LIB_PATH + ".lock"
    try:
        import fcntl

        with open(lockfile, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                if _is_fresh(_LIB_PATH):  # another process built it
                    return _LIB_PATH
                tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", tmp],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.rename(tmp, _LIB_PATH)
                return _LIB_PATH
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
    except Exception:
        return None


def _is_fresh(path: str) -> bool:
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return False
    return all(mtime >= os.path.getmtime(s) for s in _SRCS)


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
        lib.parse_aliccp.restype = ctypes.c_int64
        lib.parse_aliccp.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.combine_dups.restype = ctypes.c_int64
        lib.combine_dups.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
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


def parse_aliccp_blob(blob: bytes, multi_hot_pad: int):
    """Parse a whole line-aligned aliccp blob in C++ (split + parse)."""
    lib = _load()
    cap = blob.count(b"\n") + 1
    offsets = np.empty((cap + 1,), np.int64)
    n = lib.split_lines(
        blob, len(blob), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap
    )
    return _parse_aliccp_core(lib, blob, offsets, int(n), multi_hot_pad)


def parse_aliccp_lines(lines: Sequence[bytes], multi_hot_pad: int):
    """Same batch contract as data/ragged.parse_aliccp_lines, C++-parsed."""
    lib = _load()
    n = len(lines)
    if n:
        offsets = np.empty((n + 1,), np.int64)
        pos = 0
        for i, ln in enumerate(lines):
            offsets[i] = pos
            pos += len(ln) + 1
        offsets[n] = pos
        blob = b"\n".join(lines) + b"\n"
    else:
        offsets, blob = np.zeros((1,), np.int64), b""
    return _parse_aliccp_core(lib, blob, offsets, n, multi_hot_pad)


def _parse_aliccp_core(lib, blob: bytes, offsets: np.ndarray, n: int, p: int):
    y = np.zeros((n,), np.float32)
    z = np.zeros((n,), np.float32)
    mask = np.zeros((n,), np.float32)
    feat_ids = np.zeros((n, 11), np.int32)
    u_ids = np.zeros((n, 4, p), np.int32)
    u_vals = np.zeros((n, 4, p), np.float32)
    a_scalar = np.zeros((n, 3), np.int32)
    a_int = np.zeros((n, p), np.int32)
    if n:
        lib.parse_aliccp(
            blob,
            len(blob),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            p,
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            z.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            feat_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            u_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            u_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            a_scalar.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a_int.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    out = {
        "y": y,
        "z": z,
        "label": y,
        "mask": mask,
        "feat_ids": feat_ids,
        "a_catids": a_scalar[:, 0].copy(),
        "a_shopids": a_scalar[:, 1].copy(),
        "a_brandids": a_scalar[:, 2].copy(),
        "a_intids": a_int,
    }
    for i, f in enumerate(("u_cat", "u_shop", "u_brand", "u_int")):
        out[f"{f}ids"] = u_ids[:, i]
        out[f"{f}vals"] = u_vals[:, i]
    return out


def combine_dups(
    ids: np.ndarray, vals: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row duplicate-id combine for the COO pack (--mh_coo).

    ids [b, p] int32 (id <= 0 dead); vals [b, p] float or None (None =>
    weight 1.0 per occurrence). Returns (flat combined ids, flat combined
    weights, per-row combined counts) — row-major compact, first-seen
    order inside a row. Exact for sum combiners up to float order
    (reference DeepCvrMTL.py:155-159 combiner="sum")."""
    lib = _load()
    b, p = ids.shape
    ids_c = np.ascontiguousarray(ids, np.int32)
    out_ids = np.empty(b * p, np.int32)
    out_w = np.empty(b * p, np.float32)
    out_cnt = np.empty(b, np.int32)
    if vals is not None:
        vals_c = np.ascontiguousarray(vals, np.float32)
        vp = vals_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        vp = ctypes.POINTER(ctypes.c_float)()
    m = lib.combine_dups(
        ids_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vp,
        b,
        p,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_ids[:m], out_w[:m], out_cnt


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
