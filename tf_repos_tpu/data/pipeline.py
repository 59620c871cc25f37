"""Host-side input pipeline utilities.

The reference got parallel parsing + prefetch from tf.data
(map(num_parallel_calls=10).prefetch(500000), DeepFM.py:84). Here a
background thread pre-parses batches into a bounded queue while the TPU
computes, and per-host file sharding replaces the reference's
"each async worker reads its own shard" convention.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Sequence, TypeVar

T = TypeVar("T")

_STOP = object()


class Prefetcher(Iterable[T]):
    """Wrap an iterator; a daemon thread keeps ``size`` items ready."""

    def __init__(self, it: Iterable[T], size: int = 8):
        self._it = it
        self._size = size

    def __iter__(self) -> Iterator[T]:
        q: "queue.Queue" = queue.Queue(maxsize=self._size)
        err: List[BaseException] = []

        def worker():
            try:
                for item in self._it:
                    q.put(item)
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(_STOP)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _STOP:
                if err:
                    raise err[0]
                return
            yield item


def shard_files_for_host(
    files: Sequence[str], process_index: int, process_count: int
) -> List[str]:
    """Round-robin file split across hosts (multi-host input sharding).

    With fewer files than hosts every host reads everything (duplicate
    epochs, like the reference's async workers racing one file list) —
    shard your data into >= num_hosts files for a true split."""
    if len(files) < process_count:
        return list(files)
    return [f for i, f in enumerate(files) if i % process_count == process_index]
