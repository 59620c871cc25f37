"""Criteo CSV reader for the Wide&Deep path.

Behavioral contract from /root/reference/deep_ctr/Model_pipeline/
wide_n_deep.py:55-89: columns [label, I1..I13, C14..C39]; numeric
defaults 0.0, categorical defaults 0; same TextLineDataset -> map ->
repeat -> batch pipeline. Batch: {"cont": f32[B,13], "cat": int32[B,26],
"label": f32[B], "mask": f32[B]}.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from tf_repos_tpu.data.libsvm import Batch

NUM_CONT = 13
NUM_CAT = 26


def parse_csv_lines(lines: Sequence[bytes]) -> Batch:
    n = len(lines)
    cont = np.zeros((n, NUM_CONT), np.float32)
    cat = np.zeros((n, NUM_CAT), np.int32)
    label = np.zeros((n,), np.float32)
    ncols = 1 + NUM_CONT + NUM_CAT
    for r, line in enumerate(lines):
        toks = line.strip().split(b",")
        for c in range(min(len(toks), ncols)):
            t = toks[c]
            if not t:
                continue
            if c == 0:
                label[r] = float(t)
            elif c <= NUM_CONT:
                cont[r, c - 1] = float(t)
            else:
                cat[r, c - 1 - NUM_CONT] = int(float(t))
    return {"cont": cont, "cat": cat, "label": label, "mask": np.ones((n,), np.float32)}


class CsvDataset:
    """Same windowed-shuffle / epoch / static-batch semantics as
    LibsvmDataset, over the 40-column Criteo CSV layout."""

    def __init__(
        self,
        filenames: Sequence[str],
        batch_size: int = 32,
        num_epochs: int = 1,
        perform_shuffle: bool = False,
        shuffle_buffer: int = 256,
        drop_remainder: bool = False,
        seed: Optional[int] = None,
        packed_cache: bool = False,
    ):
        from tf_repos_tpu.data.libsvm import LibsvmDataset

        # reuse the line streaming/shuffle machinery
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

    def __iter__(self) -> Iterator[Batch]:
        if self.packed_cache:
            # parse once -> packed sidecar, memmap afterwards: the CSV
            # parse is a per-line Python loop, by far the slowest reader
            from tf_repos_tpu.data.pipeline import iter_dict_batches

            yield from iter_dict_batches(
                self._iter_cached_chunks(),
                batch_size=self.batch_size,
                row_key="label",
                nprng=self._inner._nprng,
                shuffle=self._inner.perform_shuffle,
                drop_remainder=self.drop_remainder,
            )
            return
        pending: List[bytes] = []
        for ln in self._inner._iter_shuffled_lines():
            pending.append(ln)
            if len(pending) == self.batch_size:
                yield parse_csv_lines(pending)
                pending = []
        if pending and not self.drop_remainder:
            batch = parse_csv_lines(pending)
            pad = self.batch_size - len(pending)
            yield {
                k: np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1)) for k, v in batch.items()
            }

    def _iter_cached_chunks(self, rows_per_chunk: int = 65536):
        from tf_repos_tpu.data.cache import PackedCache, PackedCacheWriter

        tag = "csv40"
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
                    for blob in inner._blobs_for_file(path, 16 << 20):
                        lines = [ln for ln in blob.split(b"\n") if ln.strip()]
                        d = parse_csv_lines(lines)
                        writer.append(d)
                        yield d
                except BaseException:
                    writer.abort()
                    raise
                writer.commit()
