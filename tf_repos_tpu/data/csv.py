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

    def __iter__(self) -> Iterator[Batch]:
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
