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
        stop = threading.Event()

        def worker():
            try:
                for item in self._it:
                    # bounded put that notices consumer abandonment: if
                    # the consumer breaks mid-epoch (graceful shutdown,
                    # synchronized_iterator cut) a plain q.put would
                    # block forever, leaking the thread + open files
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                # same bounded put: _STOP must not be dropped on the
                # normal path (full queue, slow consumer), and must not
                # block forever on the abandoned path
                while not stop.is_set():
                    try:
                        q.put(_STOP, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()


def parallel_mapped_batches(
    it: Iterable[T],
    make_chain,
    workers: int = 2,
    pad_rules=None,
    ahead: int = 2,
) -> Iterator[T]:
    """Ordered thread-pool map over a batch iterator (--map_workers).

    The host map chain (MhPadBucketer → SparseBatchMapper → MhCooPacker,
    train/harness._dataset) is numpy-heavy and releases the GIL, but it
    runs on ONE prefetch thread — measured ~0.5-0.7M examples/s idle and
    ~100-240k on a contended 4-core box (scripts/bench_host_chain.py),
    under the large-vocab device step's 314k ex/s. This is the
    tf.data ``map(num_parallel_calls=N)`` role (reference DeepFM.py:84):
    N workers apply the chain concurrently, results yield in stream
    order.

    State discipline — why this is exact:
      * chain CONTENT is per-batch pure (the mapper's remapped positions
        depend only on that batch's ids); only the pow2 pad WIDTHS are
        stateful (monotonic-growth recompile bounding). Each worker slot
        owns a chain instance (scratch arrays + its own bucket ladder),
        and widths are re-monotonized at the ordered OUTPUT: every
        `pad_rules` key is padded to the running max width with its
        sentinel (vocab for uids — dropped by the device scatter; 0 for
        COO/multi-hot — the dead-slot convention). Run-to-run the bucket
        SIZES may differ from the sequential schedule (a different
        worker saw the widest batch first) but every emitted batch
        computes the identical function.
      * the slim encoder does NOT belong in the chain: its
        droppable-vals contract commits on the FIRST batch and its
        uint16 narrowing keys off the final width — the harness runs it
        sequentially after this (it measures ~10M ex/s, never the
        bound).

    pad_rules: {key: sentinel_value} for last-axis re-pad; keys absent
    from a batch are skipped. Consumer abandonment (graceful shutdown)
    cancels queued work and joins the pool.
    """
    import numpy as np
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    chains: "queue.SimpleQueue" = queue.SimpleQueue()
    for _ in range(workers):
        chains.put(make_chain())

    def apply(b):
        c = chains.get()
        try:
            return c(b)
        finally:
            chains.put(c)

    maxes: dict = {}

    def repad(b):
        if not pad_rules:
            return b
        out = None
        for k, sent in pad_rules.items():
            if k not in b:
                continue
            a = np.asarray(b[k])
            w = a.shape[-1]
            m = maxes[k] = max(maxes.get(k, 0), w)
            if w < m:
                if out is None:
                    out = dict(b)
                out[k] = np.pad(
                    a, [(0, 0)] * (a.ndim - 1) + [(0, m - w)],
                    constant_values=sent,
                )
        return out if out is not None else b

    ex = ThreadPoolExecutor(max_workers=workers)
    try:
        pending: deque = deque()
        for batch in it:
            pending.append(ex.submit(apply, batch))
            if len(pending) > workers + ahead:
                yield repad(pending.popleft().result())
        while pending:
            yield repad(pending.popleft().result())
    finally:
        ex.shutdown(wait=True, cancel_futures=True)


def synchronized_iterator(
    it: Iterable[T], sync_every: int = 16, agree_min=None
) -> Iterator[T]:
    """Multi-host-safe batch iterator: every host yields EXACTLY the same
    number of items, so every host dispatches the same number of
    (collective) train steps.

    Without this, unequal per-host shard sizes deadlock: the host with
    more batches dispatches another psum-carrying step while the others
    have moved on to the final checkpoint barrier. Hosts agree on
    min(items buffered) every ``sync_every`` items via a host-level
    allgather.

    Coverage caveat: the stream stops for ALL hosts when the SHORTEST
    host's entire multi-epoch stream runs out — total coverage is
    nproc x shortest-host stream. Longer hosts silently lose their whole
    surplus (round-robin ``shard_files_for_host`` does no size
    balancing), and the drop happens once over the full run, not per
    epoch. Discarded buffered batches are logged so the loss is visible.
    Single-process: plain passthrough.
    """
    import jax

    if agree_min is None:
        if jax.process_count() == 1:
            yield from it
            return

        from jax.experimental import multihost_utils

        def agree_min(n: int) -> int:
            import numpy as np

            return int(multihost_utils.process_allgather(np.int32(n)).min())

    src = iter(it)
    while True:
        buf: List[T] = []
        exhausted = False
        while len(buf) < sync_every:
            try:
                buf.append(next(src))
            except StopIteration:
                exhausted = True
                break
        # signal encodes BOTH the count and can-continue, so every host
        # performs the same number of agreements (a host that exhausts
        # exactly on a window boundary must still stop everyone):
        #   can continue  -> sync_every + 1
        #   exhausted     -> len(buf)
        signal = len(buf) if exhausted else sync_every + 1
        agreed = agree_min(signal)
        if agreed > sync_every:  # everyone has a full window and more
            yield from buf
            continue
        if len(buf) > agreed:
            print(
                f"INFO: synchronized_iterator: dropping {len(buf) - agreed} "
                f"buffered batch(es) — another host's stream is exhausted "
                f"(coverage = shortest host's stream)"
            )
        yield from buf[:agreed]
        return


def shard_files_for_host(
    files: Sequence[str], process_index: int, process_count: int
) -> List[str]:
    """Round-robin file split across hosts (multi-host input sharding).

    With fewer files than hosts every host reads everything (duplicate
    epochs, like the reference's async workers racing one file list) —
    shard your data into >= num_hosts files for a true split."""
    if len(files) < process_count:
        import warnings

        warnings.warn(
            f"shard_files_for_host: only {len(files)} input file(s) for "
            f"{process_count} hosts — every host will read ALL files, so "
            f"each example is trained on {process_count}x per epoch. Split "
            f"the data into >= {process_count} files for a true shard.",
            stacklevel=2,
        )
        return list(files)
    return [f for i, f in enumerate(files) if i % process_count == process_index]


# full-row shuffle permutation cap: below this chunk size the gather is
# cheap (libsvm [64k,39] chunks are ~20 MB); above it (padded Ali-CCP
# [64k,512]x5 ~ 700 MB) the block-shuffle path avoids materializing
# dead padding — see the branch comment in iter_dict_batches
_FULL_SHUFFLE_CHUNK_BYTES = 128 << 20


def iter_dict_batches(
    chunks,
    *,
    batch_size: int,
    row_key: str,
    nprng=None,
    shuffle: bool = False,
    drop_remainder: bool = False,
    emit=None,
):
    """Assemble fixed-shape dict batches from dict-of-arrays chunks (all
    values share the leading row axis, keyed by ``row_key`` for counting):
    per-chunk shuffle permutation (a chunk-wide window — strictly wider
    than the reference's 256-sample shuffle), remainder carried across
    chunk/file boundaries, final partial batch zero-padded (zero padding
    leaves mask rows 0 — the static-batch contract). ``emit`` optionally
    post-processes each finished batch (e.g. re-adding alias keys dropped
    from a packed cache)."""
    import numpy as np

    B = batch_size
    emit = emit or (lambda d: d)
    pend = None
    for d in chunks:
        n = len(d[row_key])
        row_bytes = sum(
            int(np.asarray(v).dtype.itemsize) * int(np.prod(np.asarray(v).shape[1:], dtype=np.int64))
            for v in d.values()
        )
        if shuffle and n > 1 and n * row_bytes <= _FULL_SHUFFLE_CHUNK_BYTES:
            perm = nprng.permutation(n)
            # mode="clip" selects numpy's unchecked fast gather path
            d = {k: np.take(v, perm, axis=0, mode="clip") for k, v in d.items()}
        elif shuffle and n > B:
            # WIDE rows (padded Ali-CCP multi-hot chunks are ~700 MB): a
            # full row permutation materializes every padded byte and
            # measured 217 ms/batch — the dominant host cost at the
            # published regime. Instead permute batch-aligned row BLOCKS
            # with a fresh random phase per chunk: blocks stay zero-copy
            # memmap views (downstream bucketer/packer only touch live
            # widths), batch COMPOSITION still changes across epochs
            # (phase + block order + file order + chunk boundaries), and
            # within-batch order is irrelevant to the summed gradient.
            # The reference's own window is 256 samples (shuffle(256),
            # DeepFM.py:74) — block mixing at B >= 4096 is no weaker.
            # clamp the phase so at least one full block survives: with
            # B < n < 2B an unclamped phase > n - B gives nb == 0 and
            # the branch below would fall through to `continue`,
            # silently DROPPING the whole chunk (code-review round 5)
            phase = int(nprng.integers(0, min(B, n - B + 1)))
            nb = (n - phase) // B
            if nb > 0:
                order = nprng.permutation(nb)
                head = {k: v[:phase] for k, v in d.items()}
                blocks = [
                    {
                        k: v[phase + i * B : phase + (i + 1) * B]
                        for k, v in d.items()
                    }
                    for i in order
                ]
                tail = {k: v[phase + nb * B :] for k, v in d.items()}
                for piece in [head] + blocks + [tail]:
                    m = len(piece[row_key])
                    if m == 0:
                        continue
                    if pend is not None and len(pend[row_key]):
                        take = min(B - len(pend[row_key]), m)
                        pend = {
                            k: np.concatenate([pend[k], piece[k][:take]])
                            for k in piece
                        }
                        if len(pend[row_key]) == B:
                            yield emit(pend)
                            pend = None
                        piece = {k: v[take:] for k, v in piece.items()}
                        m -= take
                        if m == 0:
                            continue
                    nf = m // B
                    for i in range(nf):
                        yield emit(
                            {k: v[i * B : (i + 1) * B] for k, v in piece.items()}
                        )
                    if m % B:
                        pend = {k: v[nf * B :] for k, v in piece.items()}
                continue
        start = 0
        if pend is not None and len(pend[row_key]):
            take = min(B - len(pend[row_key]), n)
            merged = {k: np.concatenate([pend[k], d[k][:take]]) for k in d}
            start = take
            pend = None
            if len(merged[row_key]) == B:
                yield emit(merged)
            else:  # chunk smaller than one batch — keep accumulating
                pend = merged
                continue
        n_full = (n - start) // B
        for i in range(n_full):
            s = slice(start + i * B, start + (i + 1) * B)
            yield emit({k: v[s] for k, v in d.items()})
        rest = slice(start + n_full * B, None)
        pend = {k: v[rest] for k, v in d.items()}
    if pend is not None and len(pend[row_key]) and not drop_remainder:
        pad = B - len(pend[row_key])
        yield emit(
            {
                k: np.pad(np.asarray(v), [(0, pad)] + [(0, 0)] * (np.asarray(v).ndim - 1))
                for k, v in pend.items()
            }
        )
