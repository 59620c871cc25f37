"""Ali-CCP ragged-record reader -> fixed-shape padded batches (DIN/ESMM).

The reference converts joined/remapped sample lines
(``sample_id,y,z,field:fid:val field:fid:val ...``) into TFRecords with
VarLen sparse features (get_aliccp_tfrecord.py:33-102) and parses them in
input_fn (DIN.py:57-99, DeepCvrMTL.py:63-105). TPU/XLA needs static
shapes, so this reader consumes the SAME sample-line format directly and
emits padded fixed-shape arrays: multi-hot fields are padded/truncated to
``multi_hot_pad`` with padding id 0 (mask convention id>0, DIN.py:157).

Field schema (get_aliccp_tfrecord.py:33-35):
  Common:   11 single-valued fields -> feat_ids int32[B,11]
            (default id = field's 1-based position when absent)
  User MH:  109_14->u_cat, 110_14->u_shop, 127_14->u_brand, 150_14->u_int
            ids+vals, defaults (12..15, val 1.0)
  Ad:       206->a_cat, 207->a_shop, 216->a_brand (scalar; defaults
            16,17,19), 210->a_int (multi-hot; default 18)
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

Batch = Dict[str, np.ndarray]

COMMON_FIELDS = {
    "101": 1, "121": 2, "122": 3, "124": 4, "125": 5, "126": 6,
    "127": 7, "128": 8, "129": 9, "205": 10, "301": 11,
}
UMH_FIELDS = {"109_14": ("u_cat", 12), "110_14": ("u_shop", 13),
              "127_14": ("u_brand", 14), "150_14": ("u_int", 15)}
AD_SCALAR_FIELDS = {"206": ("a_cat", 16), "207": ("a_shop", 17), "216": ("a_brand", 19)}
AD_MH_FIELD = ("210", "a_int", 18)

NUM_COMMON = len(COMMON_FIELDS)

# padded multi-hot (ids, vals) field pairs of this layout — the
# --mh_bucket slicer's contract (data/sparse_batch.MhPadBucketer);
# a_int carries no vals array (binary membership, AD_MH_FIELD)
MH_PAIRS = (
    ("u_catids", "u_catvals"),
    ("u_shopids", "u_shopvals"),
    ("u_brandids", "u_brandvals"),
    ("u_intids", "u_intvals"),
    ("a_intids", None),
)


def parse_aliccp_lines(lines: Sequence[bytes], multi_hot_pad: int = 64) -> Batch:
    n = len(lines)
    p = multi_hot_pad
    out: Batch = {
        "y": np.zeros((n,), np.float32),
        "z": np.zeros((n,), np.float32),
        "feat_ids": np.zeros((n, NUM_COMMON), np.int32),
        "a_catids": np.full((n,), 16, np.int32),
        "a_shopids": np.full((n,), 17, np.int32),
        "a_brandids": np.full((n,), 19, np.int32),
        "a_intids": np.zeros((n, p), np.int32),
        "mask": np.ones((n,), np.float32),
    }
    for _, (fname, _) in UMH_FIELDS.items():
        out[f"{fname}ids"] = np.zeros((n, p), np.int32)
        out[f"{fname}vals"] = np.zeros((n, p), np.float32)

    for r, line in enumerate(lines):
        parts = line.strip().split(b",")
        if len(parts) != 4:
            out["mask"][r] = 0.0
            continue
        out["y"][r] = float(parts[1])
        out["z"][r] = float(parts[2])
        # default common ids when a field is absent
        out["feat_ids"][r] = np.arange(1, NUM_COMMON + 1)
        mh_count = {fname: 0 for _, (fname, _) in UMH_FIELDS.items()}
        mh_defaults_pending = {fn: dv for _, (fn, dv) in UMH_FIELDS.items()}
        a_int_count = 0
        for tok in parts[3].split():
            fv = tok.split(b":")
            if len(fv) != 3:
                continue
            field = fv[0].decode()
            fid = int(fv[1])
            if field in COMMON_FIELDS:
                out["feat_ids"][r, COMMON_FIELDS[field] - 1] = fid
            elif field in UMH_FIELDS:
                fname, _ = UMH_FIELDS[field]
                mh_defaults_pending.pop(fname, None)
                c = mh_count[fname]
                if c < p:
                    out[f"{fname}ids"][r, c] = fid
                    out[f"{fname}vals"][r, c] = float(fv[2])
                    mh_count[fname] = c + 1
            elif field in AD_SCALAR_FIELDS:
                fname, _ = AD_SCALAR_FIELDS[field]
                out[f"{fname}ids"][r] = fid
            elif field == AD_MH_FIELD[0]:
                if a_int_count < p:
                    out["a_intids"][r, a_int_count] = fid
                    a_int_count += 1
        for fname, def_id in mh_defaults_pending.items():
            out[f"{fname}ids"][r, 0] = def_id
            out[f"{fname}vals"][r, 0] = 1.0
        if a_int_count == 0:
            out["a_intids"][r, 0] = AD_MH_FIELD[2]
    out["label"] = out["y"]
    return out


def auto_multi_hot_pad(
    filenames: Sequence[str], sample_lines: int = 2000, pct: float = 99.0
) -> int:
    """Pick the static pad length from the data: the max over fields of
    the PER-FIELD p99 length over a sample, rounded up to a multiple of
    8 (min 8). Configure multi_hot_pad=0 to use this.

    Why per-field p99 (changed from pooled p95 in round 4): the
    published Ali-CCP length regime is wildly skewed per field — the
    largest field averages 250 ids/sample (DeepMTL/README.md:21) while
    others average ~5-40 — so a POOLED percentile is dominated by the
    small fields and silently truncates most of the heavy field's
    history (the reference's VarLen input consumes ALL values,
    DIN.py:65-76; truncation costs AUC — measured curve in
    TRUNCATION.md). A generous pad is cheap when composed with the
    pad-waste levers: --mh_coo makes the device cost proportional to
    LIVE ids and --mh_bucket slices dead columns on the host; without
    them every padding slot costs a real HBM row move (measured ~4x
    step time at pad=64 vs pad=16 when true lengths are ~4-8)."""
    per_field: Dict[str, List[int]] = {
        m: [] for m in set(UMH_FIELDS) | {AD_MH_FIELD[0]}
    }
    seen = 0
    for path in filenames:
        if seen >= sample_lines:
            break
        with open(path, "rb") as f:
            for line in f:
                if seen >= sample_lines:
                    break
                parts = line.strip().split(b",")
                if len(parts) != 4:
                    continue
                counts = {m: 0 for m in per_field}
                for tok in parts[3].split():
                    fv = tok.split(b":")
                    if len(fv) == 3 and fv[0].decode() in counts:
                        counts[fv[0].decode()] += 1
                for m, c in counts.items():
                    per_field[m].append(c)
                seen += 1
    if not seen:
        return 64
    p = max(
        int(np.percentile(np.asarray(v), pct)) for v in per_field.values() if v
    )
    return max(8, ((p + 7) // 8) * 8)


class AliccpDataset:
    """Streaming reader over sample-line files OR reference-format
    *.tfrecord stores (data/tfrecord.py; the container written by
    get_aliccp_tfrecord.py — migration path for existing ~500 GB stores,
    DeepMTL/README.md:33) with the shared window-shuffle / epoch /
    static-batch semantics. ``multi_hot_pad=0`` derives the pad from the
    data (auto_multi_hot_pad). File lists must be format-homogeneous
    (all sample lines or all .tfrecord)."""

    def __init__(
        self,
        filenames: Sequence[str],
        batch_size: int = 32,
        num_epochs: int = 1,
        perform_shuffle: bool = False,
        shuffle_buffer: int = 256,
        multi_hot_pad: int = 64,
        drop_remainder: bool = False,
        seed: Optional[int] = None,
        packed_cache: bool = False,
    ):
        from tf_repos_tpu.data.libsvm import LibsvmDataset

        self._inner = LibsvmDataset(
            filenames,
            field_size=1,
            batch_size=batch_size,
            num_epochs=num_epochs,
            perform_shuffle=perform_shuffle,
            shuffle_buffer=shuffle_buffer,
            drop_remainder=drop_remainder,
            seed=seed,
            use_native=False,
        )
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.packed_cache = packed_cache
        from tf_repos_tpu.data.tfrecord import is_tfrecord_file

        n_rec = sum(is_tfrecord_file(f) for f in self._inner.filenames)
        if 0 < n_rec < len(self._inner.filenames):
            raise ValueError(
                "AliccpDataset: mixed sample-line and .tfrecord inputs; "
                "convert one side (data/tfrecord.py convert_sample_file)"
            )
        self.tfrecord = n_rec > 0
        if multi_hot_pad <= 0:
            if self.tfrecord:
                raise ValueError(
                    "multi_hot_pad=0 (auto) requires sample-line inputs"
                )
            multi_hot_pad = auto_multi_hot_pad(filenames)
        self.multi_hot_pad = multi_hot_pad

    def _native(self):
        try:  # C++ fast path (~15x; data/native_src/aliccp_parser.cpp)
            from tf_repos_tpu.data import native

            if native.available():
                return native
        except Exception:
            pass
        return None

    def __iter__(self) -> Iterator[Batch]:
        if self.packed_cache:
            # parse once -> packed sidecar arrays, memmap on every later
            # epoch/run (data/cache.py); chunk-window shuffle like the
            # libsvm array path (tfrecord inputs cache identically —
            # _parse_file_chunks dispatches per file)
            yield from self._iter_dict_batches(self._iter_cached_chunks())
            return
        if self.tfrecord:
            yield from self._iter_tfrecord_batches()
            return
        native = self._native()
        parse = native.parse_aliccp_lines if native else parse_aliccp_lines
        pending: List[bytes] = []
        for ln in self._inner._iter_shuffled_lines():
            pending.append(ln)
            if len(pending) == self.batch_size:
                yield parse(pending, self.multi_hot_pad)
                pending = []
        if pending and not self.drop_remainder:
            batch = parse(pending, self.multi_hot_pad)
            pad = self.batch_size - len(pending)
            yield {
                k: np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
                for k, v in batch.items()
            }

    # ----------------------------------------------------- tfrecord path
    def _iter_record_payloads(self) -> Iterator[bytes]:
        """Record payloads with the line path's epoch/file-shuffle/window-
        shuffle semantics (same rng stream as the inner reader)."""
        from tf_repos_tpu.data.tfrecord import iter_records

        inner = self._inner

        def raw():
            for _ in range(inner.num_epochs):
                files = list(inner.filenames)
                if inner.perform_shuffle:
                    inner.rng.shuffle(files)
                for path in files:
                    yield from iter_records(path)

        if not inner.perform_shuffle:
            yield from raw()
            return
        buf: List[bytes] = []
        for item in raw():
            buf.append(item)
            if len(buf) >= inner.shuffle_buffer:
                i = inner.rng.randrange(len(buf))
                buf[i], buf[-1] = buf[-1], buf[i]
                yield buf.pop()
        inner.rng.shuffle(buf)
        yield from buf

    def _iter_tfrecord_batches(self) -> Iterator[Batch]:
        from tf_repos_tpu.data.tfrecord import parse_aliccp_examples

        pending: List[bytes] = []
        for payload in self._iter_record_payloads():
            pending.append(payload)
            if len(pending) == self.batch_size:
                yield parse_aliccp_examples(pending, self.multi_hot_pad)
                pending = []
        if pending and not self.drop_remainder:
            batch = parse_aliccp_examples(pending, self.multi_hot_pad)
            pad = self.batch_size - len(pending)
            yield {
                k: np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
                for k, v in batch.items()
            }

    # -------------------------------------------------- packed-cache path
    def _parse_file_chunks(self, path: str, chunk_bytes: int = 16 << 20):
        """In-order parsed dict-chunks of ONE file (native blob parse with
        a small thread pool when available, python lines otherwise; record
        chunks for .tfrecord inputs); the 'label' alias is dropped — it is
        re-established per batch."""
        from tf_repos_tpu.data.tfrecord import is_tfrecord_file

        if is_tfrecord_file(path):
            from tf_repos_tpu.data.tfrecord import (
                iter_records,
                parse_aliccp_examples,
            )

            pend: List[bytes] = []
            for payload in iter_records(path):
                pend.append(payload)
                if len(pend) == 65536:
                    d = dict(parse_aliccp_examples(pend, self.multi_hot_pad))
                    d.pop("label", None)
                    yield d
                    pend = []
            if pend:
                d = dict(parse_aliccp_examples(pend, self.multi_hot_pad))
                d.pop("label", None)
                yield d
            return
        native = self._native()
        if native is None:
            for blob in self._inner._blobs_for_file(path, chunk_bytes):
                lines = [ln for ln in blob.split(b"\n") if ln.strip()]
                d = dict(parse_aliccp_lines(lines, self.multi_hot_pad))
                d.pop("label", None)
                yield d
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        def parse(blob):
            d = dict(native.parse_aliccp_blob(blob, self.multi_hot_pad))
            d.pop("label", None)
            return d

        with ThreadPoolExecutor(2) as ex:
            futs: collections.deque = collections.deque()
            for blob in self._inner._blobs_for_file(path, chunk_bytes):
                futs.append(ex.submit(parse, blob))
                while len(futs) > 2:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()

    def _iter_cached_chunks(self, rows_per_chunk: int = 65536):
        from tf_repos_tpu.data.cache import PackedCache, PackedCacheWriter

        tag = f"p{self.multi_hot_pad}"
        inner = self._inner
        for _ in range(inner.num_epochs):
            files = list(inner.filenames)
            if inner.perform_shuffle:
                inner.rng.shuffle(files)
            for path in files:
                cached = PackedCache.open(path, tag)
                if cached is not None:
                    yield from cached.iter_chunks(rows_per_chunk)
                    continue
                writer = PackedCacheWriter(path, tag)
                try:
                    for d in self._parse_file_chunks(path):
                        writer.append(d)
                        yield d
                except BaseException:
                    writer.abort()
                    raise
                writer.commit()

    def _iter_dict_batches(self, chunks) -> Iterator[Batch]:
        from tf_repos_tpu.data.pipeline import iter_dict_batches

        def emit(d: Batch) -> Batch:
            d = dict(d)
            d["label"] = d["y"]  # alias dropped from the packed cache
            return d

        yield from iter_dict_batches(
            chunks,
            batch_size=self.batch_size,
            row_key="y",
            nprng=self._inner._nprng,
            shuffle=self._inner.perform_shuffle,
            drop_remainder=self.drop_remainder,
            emit=emit,
        )
