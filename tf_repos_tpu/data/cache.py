"""Packed binary cache for libsvm inputs (--packed_cache).

The text parse is the end-to-end bottleneck at the headline operating
point: the native parser sustains ~1.2M lines/s (3 workers on this box)
while one v5e chip trains DeepFM at ~1.6M examples/s — multi-epoch runs
(the reference default is num_epochs=10) and repeated experiment sweeps
re-pay the parse every pass. The reference avoids this with TFRecords
(materialize once, binary-decode forever, get_aliccp_tfrecord.py); the
TPU-native equivalent is flat packed arrays that memmap straight into
the fixed-shape batch layout with ZERO decode:

  <data_dir>/.packed_cache/<basename>.f<F>.ids.bin     int32  [N, F]
  <data_dir>/.packed_cache/<basename>.f<F>.vals.bin    float32[N, F]
  <data_dir>/.packed_cache/<basename>.f<F>.labels.bin  float32[N]
  <data_dir>/.packed_cache/<basename>.f<F>.meta.json   validation record

The first pass parses and streams the packed arrays to disk (write-
behind — the epoch itself is not slowed); every later epoch and every
later RUN over the same file memmaps them and only pays the per-chunk
shuffle permutation copy. Validation is by source (size, mtime),
field_size, and format version; a stale or partial cache is rebuilt.

Concurrency: writers build under a temp name and os.rename() into place
(atomic on one filesystem; the meta file is renamed LAST, so a reader
never sees meta without complete data). Concurrent builders of the same
file produce identical bytes — last rename wins.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1
CACHE_DIRNAME = ".packed_cache"

Chunk = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (ids, vals, labels)


def _cache_paths(path: str, field_size: int):
    d = os.path.join(os.path.dirname(os.path.abspath(path)), CACHE_DIRNAME)
    stem = f"{os.path.basename(path)}.f{field_size}"
    return d, {
        "ids": os.path.join(d, f"{stem}.ids.bin"),
        "vals": os.path.join(d, f"{stem}.vals.bin"),
        "labels": os.path.join(d, f"{stem}.labels.bin"),
        "meta": os.path.join(d, f"{stem}.meta.json"),
    }


class PackedCache:
    """Read side: a validated memmap view of one cached source file."""

    def __init__(self, ids: np.ndarray, vals: np.ndarray, labels: np.ndarray):
        self.ids, self.vals, self.labels = ids, vals, labels
        self.rows = int(labels.shape[0])

    @staticmethod
    def open(path: str, field_size: int) -> Optional["PackedCache"]:
        """A memmap over a valid cache of `path`, or None (absent/stale)."""
        _, p = _cache_paths(path, field_size)
        try:
            with open(p["meta"]) as f:
                meta = json.load(f)
            st = os.stat(path)
            if (
                meta.get("version") != FORMAT_VERSION
                or meta.get("field_size") != field_size
                or meta.get("src_size") != st.st_size
                or meta.get("src_mtime_ns") != st.st_mtime_ns
            ):
                return None
            n = int(meta["rows"])
            ids = np.memmap(p["ids"], np.int32, "r", shape=(n, field_size))
            vals = np.memmap(p["vals"], np.float32, "r", shape=(n, field_size))
            labels = np.memmap(p["labels"], np.float32, "r", shape=(n,))
            return PackedCache(ids, vals, labels)
        except (OSError, ValueError, KeyError):
            return None

    def iter_chunks(self, rows_per_chunk: int) -> Iterator[Chunk]:
        """Sequential row-chunk views (no copy; downstream batching slices
        them and the shuffle permutation makes its own chunk-local copy,
        exactly like the text path's parsed chunks)."""
        for s in range(0, self.rows, rows_per_chunk):
            e = min(s + rows_per_chunk, self.rows)
            yield self.ids[s:e], self.vals[s:e], self.labels[s:e]


class PackedCacheWriter:
    """Write side: stream parsed chunks to temp files; commit() renames
    them into place (data files first, meta last)."""

    def __init__(self, path: str, field_size: int):
        self.src = path
        self.field_size = field_size
        d, self.paths = _cache_paths(path, field_size)
        os.makedirs(d, exist_ok=True)
        self._tmp = {k: f"{v}.tmp.{os.getpid()}" for k, v in self.paths.items()}
        self._files = {
            k: open(self._tmp[k], "wb") for k in ("ids", "vals", "labels")
        }
        self.rows = 0
        self._failed = False

    def append(self, ids: np.ndarray, vals: np.ndarray, labels: np.ndarray) -> None:
        if self._failed:
            return
        try:
            self._files["ids"].write(np.ascontiguousarray(ids, np.int32).tobytes())
            self._files["vals"].write(np.ascontiguousarray(vals, np.float32).tobytes())
            self._files["labels"].write(
                np.ascontiguousarray(labels, np.float32).tobytes()
            )
            self.rows += int(labels.shape[0])
        except OSError:  # disk full etc. — training must not die for a cache
            self._failed = True

    def commit(self) -> bool:
        for f in self._files.values():
            try:
                f.close()
            except OSError:
                self._failed = True
        if self._failed:
            self.abort()
            return False
        try:
            st = os.stat(self.src)
            for k in ("ids", "vals", "labels"):
                os.rename(self._tmp[k], self.paths[k])
            meta = {
                "version": FORMAT_VERSION,
                "field_size": self.field_size,
                "rows": self.rows,
                "src_size": st.st_size,
                "src_mtime_ns": st.st_mtime_ns,
            }
            with open(self._tmp["meta"], "w") as f:
                json.dump(meta, f)
            os.rename(self._tmp["meta"], self.paths["meta"])
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
