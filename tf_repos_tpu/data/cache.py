"""Packed binary cache for text inputs (--packed_cache).

The text parse is the end-to-end bottleneck at the headline operating
point: the native libsvm parser sustains ~1.2M lines/s (3 workers on
this box) while one v5e chip trains DeepFM at ~1.6M examples/s — and
multi-epoch runs (the reference default is num_epochs=10) re-pay the
parse every pass. The reference avoids this with TFRecords (materialize
once, binary-decode forever, get_aliccp_tfrecord.py); the TPU-native
equivalent is flat packed arrays that memmap straight into the
fixed-shape batch layout with ZERO decode.

Generic format — one cache is a named set of row-major arrays sharing a
leading row count, keyed by source file and a reader `tag` (the parse
parameters: libsvm field_size, aliccp multi_hot_pad):

  <dir>/.packed_cache/<basename>.<tag>.<name>.bin   raw C-order data
  <dir>/.packed_cache/<basename>.<tag>.meta.json    dtypes/shapes + validation

The first pass parses and streams the packed arrays to disk (write-
behind — that epoch is not slowed); every later epoch and every later
RUN over the same file memmaps them and only pays the per-chunk shuffle
permutation copy (measured 6.7M lines/s warm vs 0.71M text on Criteo
shapes). Validation is by source (size, mtime), tag, array schema, and
format version; a stale or partial cache is rebuilt.

Concurrency: writers build under a temp name and os.rename() into place
(atomic on one filesystem; the meta file is renamed LAST, so a reader
never sees meta without complete data). Concurrent builders of the same
file produce identical bytes — last rename wins.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional

import numpy as np

FORMAT_VERSION = 2
CACHE_DIRNAME = ".packed_cache"

Arrays = Dict[str, np.ndarray]


def _cache_paths(path: str, tag: str, names):
    d = os.path.join(os.path.dirname(os.path.abspath(path)), CACHE_DIRNAME)
    stem = f"{os.path.basename(path)}.{tag}"
    p = {name: os.path.join(d, f"{stem}.{name}.bin") for name in names}
    p["__meta__"] = os.path.join(d, f"{stem}.meta.json")
    return d, p


class PackedCache:
    """Read side: validated memmap views of one cached source file."""

    def __init__(self, arrays: Arrays, rows: int):
        self.arrays = arrays
        self.rows = rows

    @staticmethod
    def open(path: str, tag: str) -> Optional["PackedCache"]:
        """Memmaps over a valid cache of `path`, or None (absent/stale)."""
        _, p = _cache_paths(path, tag, [])
        try:
            with open(p["__meta__"]) as f:
                meta = json.load(f)
            st = os.stat(path)
            if (
                meta.get("version") != FORMAT_VERSION
                or meta.get("tag") != tag
                or meta.get("src_size") != st.st_size
                or meta.get("src_mtime_ns") != st.st_mtime_ns
            ):
                return None
            n = int(meta["rows"])
            _, p = _cache_paths(path, tag, meta["arrays"].keys())
            arrays = {}
            for name, spec in meta["arrays"].items():
                shape = (n, *spec["shape_tail"])
                arrays[name] = np.memmap(p[name], np.dtype(spec["dtype"]), "r", shape=shape)
            return PackedCache(arrays, n)
        except (OSError, ValueError, KeyError):
            return None

    def iter_chunks(self, rows_per_chunk: int) -> Iterator[Arrays]:
        """Sequential row-chunk views (no copy; downstream batching slices
        them and the shuffle permutation makes its own chunk-local copy,
        exactly like the text path's parsed chunks)."""
        for s in range(0, self.rows, rows_per_chunk):
            e = min(s + rows_per_chunk, self.rows)
            yield {k: a[s:e] for k, a in self.arrays.items()}


class PackedCacheWriter:
    """Write side: stream parsed chunks to temp files; commit() renames
    them into place (data files first, meta last). The array schema is
    fixed by the first append."""

    def __init__(self, path: str, tag: str):
        self.src = path
        self.tag = tag
        self.rows = 0
        self._files: Dict[str, object] = {}
        self._schema: Dict[str, dict] = {}
        self._tmp: Dict[str, str] = {}
        self._paths: Dict[str, str] = {}
        self._failed = False

    def append(self, arrays: Arrays) -> None:
        if self._failed:
            return
        try:
            if not self._files:
                d, self._paths = _cache_paths(self.src, self.tag, arrays.keys())
                os.makedirs(d, exist_ok=True)
                self._tmp = {
                    k: f"{v}.tmp.{os.getpid()}" for k, v in self._paths.items()
                }
                for name, a in arrays.items():
                    a = np.asarray(a)
                    self._schema[name] = {
                        "dtype": a.dtype.str,
                        "shape_tail": list(a.shape[1:]),
                    }
                    self._files[name] = open(self._tmp[name], "wb")
            n = None
            for name, spec in self._schema.items():
                a = np.asarray(arrays[name])
                if list(a.shape[1:]) != spec["shape_tail"]:
                    raise ValueError(f"shape drift for {name}: {a.shape}")
                n = a.shape[0] if n is None else n
                self._files[name].write(
                    np.ascontiguousarray(a, np.dtype(spec["dtype"])).tobytes()
                )
            self.rows += int(n or 0)
        except (OSError, ValueError):  # disk full etc. — training survives
            self._failed = True

    def commit(self) -> bool:
        for f in self._files.values():
            try:
                f.close()
            except OSError:
                self._failed = True
        if self._failed or not self._files:
            self.abort()
            return False
        try:
            st = os.stat(self.src)
            for name in self._schema:
                os.rename(self._tmp[name], self._paths[name])
            meta = {
                "version": FORMAT_VERSION,
                "tag": self.tag,
                "rows": self.rows,
                "arrays": self._schema,
                "src_size": st.st_size,
                "src_mtime_ns": st.st_mtime_ns,
            }
            with open(self._tmp["__meta__"], "w") as f:
                json.dump(meta, f)
            os.rename(self._tmp["__meta__"], self._paths["__meta__"])
            return True
        except OSError:
            self.abort()
            return False

    def abort(self) -> None:
        self._failed = True
        for f in self._files.values():
            try:
                f.close()
            except OSError:
                pass
        for t in self._tmp.values():
            try:
                os.remove(t)
            except OSError:
                pass
