"""libsvm text input pipeline -> fixed-shape numpy batches.

Behavioral contract from the reference input_fn
(/root/reference/deep_ctr/Model_pipeline/DeepFM.py:63-98): each line is
``label id:val id:val ...`` with a fixed number of fields per sample
(39 for Criteo); decoding produces ``{feat_ids:int32[B,F],
feat_vals:float32[B,F]}`` and ``label:float32[B]``. The reference pipeline
is TextLineDataset -> parallel map -> prefetch -> shuffle(256) ->
repeat(epochs) -> batch. Here the parse is vectorized NumPy (with an
optional native C++ fast path, see tf_repos_tpu/data/native.py), the
shuffle is a window shuffle of the same size, and batches are fixed-shape
(TPU/XLA requires static shapes, so the final partial batch is padded and
carries an explicit ``mask``).
"""

from __future__ import annotations

import glob
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

Batch = Dict[str, np.ndarray]


def parse_libsvm_lines(
    lines: Sequence[bytes], field_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a list of libsvm lines (bytes) into (ids, vals, labels).

    Fast path: when every line has exactly ``1 + 2*field_size`` tokens
    (the Criteo contract), the whole chunk is parsed with one
    ``np.fromstring``-style C loop. Ragged lines fall back to a per-line
    parse with zero-padding / truncation to ``field_size``.
    """
    n = len(lines)
    if n == 0:
        z = np.zeros((0, field_size))
        return z.astype(np.int32), z.astype(np.float32), np.zeros((0,), np.float32)

    blob = b" ".join(line.strip() for line in lines)
    toks = blob.replace(b":", b" ").split()
    want = n * (1 + 2 * field_size)
    arr = None
    if len(toks) == want:
        try:
            arr = np.array(toks, dtype=np.float64)
        except ValueError:  # pragma: no cover - malformed token
            arr = None
    if arr is not None:
        arr = arr.reshape(n, 1 + 2 * field_size)
        labels = arr[:, 0].astype(np.float32)
        ids = arr[:, 1::2].astype(np.int32)
        vals = arr[:, 2::2].astype(np.float32)
        return ids, vals, labels
    return _parse_ragged(lines, field_size)


def _parse_ragged(
    lines: Sequence[bytes], field_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(lines)
    ids = np.zeros((n, field_size), np.int32)
    vals = np.zeros((n, field_size), np.float32)
    labels = np.zeros((n,), np.float32)
    for r, line in enumerate(lines):
        toks = line.split()
        if not toks:
            continue
        labels[r] = float(toks[0])
        k = min(len(toks) - 1, field_size)
        for c in range(k):
            fid, _, fval = toks[1 + c].partition(b":")
            ids[r, c] = int(fid)
            vals[r, c] = float(fval) if fval else 1.0
    return ids, vals, labels


def parse_libsvm_bytes(
    data: bytes, field_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a whole text blob (e.g. one file) at once."""
    lines = [ln for ln in data.split(b"\n") if ln.strip()]
    return parse_libsvm_lines(lines, field_size)


class LibsvmDataset:
    """Streaming libsvm reader with the reference pipeline's semantics.

    Iterates ``num_epochs`` passes over ``filenames`` yielding fixed-shape
    batches. ``perform_shuffle`` applies a window shuffle of
    ``shuffle_buffer`` samples (reference: shuffle(buffer_size=256),
    DeepFM.py:88) after shuffling the file list itself (the reference
    shuffles the glob result in main(), DeepFM.py:312-316).
    """

    def __init__(
        self,
        filenames: Sequence[str],
        field_size: int,
        batch_size: int = 32,
        num_epochs: int = 1,
        perform_shuffle: bool = False,
        shuffle_buffer: int = 256,
        drop_remainder: bool = False,
        read_chunk_bytes: int = 8 << 20,
        seed: Optional[int] = None,
        use_native: bool = True,
        parse_workers: int = 2,
        packed_cache: bool = False,
    ):
        if isinstance(filenames, (str, bytes)):
            filenames = [filenames]
        self.filenames = list(filenames)
        self.field_size = field_size
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.perform_shuffle = perform_shuffle
        self.shuffle_buffer = max(shuffle_buffer, batch_size)
        self.drop_remainder = drop_remainder
        self.read_chunk_bytes = read_chunk_bytes
        self.parse_workers = parse_workers
        self.packed_cache = packed_cache
        self.rng = random.Random(seed)
        self._nprng = np.random.default_rng(seed)
        self._parse = parse_libsvm_lines
        self._native = None
        if use_native:
            try:  # optional C++ fast path
                from tf_repos_tpu.data import native

                if native.available():
                    self._parse = lambda lines, f: native.parse_libsvm_lines(lines, f)
                    self._native = native
            except Exception:
                pass

    # ------------------------------------------------------------------
    def _iter_lines(self) -> Iterator[bytes]:
        for _ in range(self.num_epochs):
            files = list(self.filenames)
            if self.perform_shuffle:
                self.rng.shuffle(files)
            for path in files:
                with open(path, "rb") as f:
                    tail = b""
                    while True:
                        chunk = f.read(self.read_chunk_bytes)
                        if not chunk:
                            if tail.strip():
                                yield tail
                            break
                        chunk = tail + chunk
                        lines = chunk.split(b"\n")
                        tail = lines.pop()
                        for ln in lines:
                            if ln.strip():
                                yield ln

    def _iter_shuffled_lines(self) -> Iterator[bytes]:
        if not self.perform_shuffle:
            yield from self._iter_lines()
            return
        buf: List[bytes] = []
        for ln in self._iter_lines():
            buf.append(ln)
            if len(buf) >= self.shuffle_buffer:
                i = self.rng.randrange(len(buf))
                buf[i], buf[-1] = buf[-1], buf[i]
                yield buf.pop()
        self.rng.shuffle(buf)
        yield from buf

    def __iter__(self) -> Iterator[Batch]:
        if self.packed_cache:
            # parse once -> packed binary sidecar; memmap on every later
            # epoch/run (data/cache.py). Works with either parser.
            yield from self._iter_array_batches(self._iter_cached_chunks())
            return
        if self._native is not None:
            chunk_bytes = max(self.read_chunk_bytes, 16 << 20)
            yield from self._iter_array_batches(self._iter_parsed_chunks(chunk_bytes))
            return
        pending: List[bytes] = []
        for ln in self._iter_shuffled_lines():
            pending.append(ln)
            if len(pending) == self.batch_size:
                yield self._make_batch(pending, full=True)
                pending = []
        if pending and not self.drop_remainder:
            yield self._make_batch(pending, full=False)

    # --------------------------------------------------- native fast path
    def _blobs_for_file(self, path: str, chunk_bytes: int) -> Iterator[bytes]:
        """Line-aligned byte chunks of one file."""
        with open(path, "rb") as f:
            carry = b""
            while True:
                chunk = f.read(chunk_bytes)
                if not chunk:
                    if carry.strip():
                        yield carry
                    break
                chunk = carry + chunk
                cut = chunk.rfind(b"\n")
                if cut == -1:
                    carry = chunk
                    continue
                yield chunk[: cut + 1]
                carry = chunk[cut + 1 :]

    def _iter_line_aligned_blobs(self, chunk_bytes: Optional[int] = None) -> Iterator[bytes]:
        """Line-aligned byte chunks, files reshuffled per epoch."""
        chunk_bytes = chunk_bytes or self.read_chunk_bytes
        for _ in range(self.num_epochs):
            files = list(self.filenames)
            if self.perform_shuffle:
                self.rng.shuffle(files)
            for path in files:
                yield from self._blobs_for_file(path, chunk_bytes)

    def _iter_parsed_chunks(self, chunk_bytes: int) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Parse chunks on a small thread pool (the C parser releases the
        GIL, so parse overlaps file IO and downstream batching), yielding
        results in order — the analog of the reference's
        num_parallel_calls=10 map (DeepFM.py:84)."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        workers = max(self.parse_workers, 1)
        if workers == 1:
            for blob in self._iter_line_aligned_blobs(chunk_bytes):
                yield self._native.parse_libsvm_blob(blob, self.field_size)
            return
        with ThreadPoolExecutor(workers) as ex:
            futs: collections.deque = collections.deque()
            for blob in self._iter_line_aligned_blobs(chunk_bytes):
                futs.append(
                    ex.submit(self._native.parse_libsvm_blob, blob, self.field_size)
                )
                while len(futs) > workers:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()

    def _parse_file_chunks(
        self, path: str, chunk_bytes: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """In-order parsed chunks of ONE file; thread-pooled when the
        GIL-releasing native parser is present, inline otherwise."""
        if self._native is not None:
            parse = self._native.parse_libsvm_blob
        else:
            parse = parse_libsvm_bytes
        workers = max(self.parse_workers, 1)
        if workers == 1 or self._native is None:
            for blob in self._blobs_for_file(path, chunk_bytes):
                yield parse(blob, self.field_size)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            futs: collections.deque = collections.deque()
            for blob in self._blobs_for_file(path, chunk_bytes):
                futs.append(ex.submit(parse, blob, self.field_size))
                while len(futs) > workers:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()

    def _iter_cached_chunks(
        self, rows_per_chunk: int = 65536
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Chunk source for --packed_cache: memmap slices of the packed
        sidecar when it is valid; otherwise parse the text AND stream the
        sidecar to disk for every later epoch/run (data/cache.py)."""
        from tf_repos_tpu.data.cache import PackedCache, PackedCacheWriter

        tag = f"f{self.field_size}"
        chunk_bytes = max(self.read_chunk_bytes, 16 << 20)
        for _ in range(self.num_epochs):
            files = list(self.filenames)
            if self.perform_shuffle:
                self.rng.shuffle(files)
            for path in files:
                cached = PackedCache.open(path, tag)
                if cached is not None:
                    for c in cached.iter_chunks(rows_per_chunk):
                        yield c["ids"], c["vals"], c["labels"]
                    continue
                writer = PackedCacheWriter(path, tag)
                try:
                    for ids, vals, labels in self._parse_file_chunks(path, chunk_bytes):
                        writer.append({"ids": ids, "vals": vals, "labels": labels})
                        yield ids, vals, labels
                except BaseException:
                    writer.abort()
                    raise
                writer.commit()

    def _iter_array_batches(self, chunks) -> Iterator[Batch]:
        """Array-chunk path: consume (ids, vals, labels) chunks (parsed
        text or packed-cache memmap slices), shuffle by vectorized
        permutation WITHIN each chunk
        (a chunk-sized window — strictly wider than the reference's
        256-sample window shuffle, DeepFM.py:88), and yield zero-copy
        batch VIEWS. Only the per-chunk boundary batch concatenates
        (fresh-allocation page faults on whole-array concats were the
        dominant cost of the naive formulation). ~10x the per-line path."""
        B = self.batch_size
        pend = None  # (ids, vals, labels) remainder rows (< B)
        for ids, vals, labels in chunks:
            if self.perform_shuffle and len(labels) > 1:
                perm = self._nprng.permutation(len(labels))
                # mode="clip" selects numpy's unchecked fast gather —
                # ~200x the default bounds-checked fancy-indexing path here
                ids = np.take(ids, perm, axis=0, mode="clip")
                vals = np.take(vals, perm, axis=0, mode="clip")
                labels = np.take(labels, perm, axis=0, mode="clip")
            start = 0
            if pend is not None and len(pend[2]):
                take = min(B - len(pend[2]), len(labels))
                bidsm = np.concatenate([pend[0], ids[:take]])
                bvals = np.concatenate([pend[1], vals[:take]])
                blabels = np.concatenate([pend[2], labels[:take]])
                start = take
                pend = None
                if len(blabels) == B:
                    yield {
                        "feat_ids": bidsm,
                        "feat_vals": bvals,
                        "label": blabels,
                        "mask": np.ones((B,), np.float32),
                    }
                else:  # chunk smaller than one batch — keep accumulating
                    pend = (bidsm, bvals, blabels)
                    continue
            n_full = (len(labels) - start) // B
            for i in range(n_full):
                s = slice(start + i * B, start + (i + 1) * B)
                yield {
                    "feat_ids": ids[s],
                    "feat_vals": vals[s],
                    "label": labels[s],
                    "mask": np.ones((B,), np.float32),
                }
            rest = slice(start + n_full * B, None)
            pend = (ids[rest], vals[rest], labels[rest])
        if pend is not None and len(pend[2]) and not self.drop_remainder:
            n = len(pend[2])
            pad = B - n
            yield {
                "feat_ids": np.pad(pend[0], ((0, pad), (0, 0))),
                "feat_vals": np.pad(pend[1], ((0, pad), (0, 0))),
                "label": np.pad(pend[2], (0, pad)),
                "mask": np.pad(np.ones((n,), np.float32), (0, pad)),
            }

    def _make_batch(self, lines: List[bytes], full: bool) -> Batch:
        ids, vals, labels = self._parse(lines, self.field_size)
        n = len(lines)
        mask = np.ones((n,), np.float32)
        if not full:  # pad to static batch_size for XLA
            pad = self.batch_size - n
            ids = np.pad(ids, ((0, pad), (0, 0)))
            vals = np.pad(vals, ((0, pad), (0, 0)))
            labels = np.pad(labels, (0, pad))
            mask = np.pad(mask, (0, pad))
        return {"feat_ids": ids, "feat_vals": vals, "label": labels, "mask": mask}


def glob_input_files(data_dir: str, pattern: str, shuffle: bool = False, seed: int = 0) -> List[str]:
    """Reference main() globs tr*/va*/te* files and shuffles the training
    list (DeepFM.py:310-316)."""
    files = sorted(glob.glob(f"{data_dir.rstrip('/')}/{pattern}"))
    if shuffle:
        random.Random(seed).shuffle(files)
    return files
