"""libsvm parser + dataset semantics (reference contract: DeepFM.py:63-98)."""

import numpy as np
import pytest

from tf_repos_tpu.data.libsvm import LibsvmDataset, parse_libsvm_lines
from tf_repos_tpu.data.pipeline import Prefetcher, shard_files_for_host
from tf_repos_tpu.data.synthetic import write_synthetic_libsvm


def test_parse_fast_path():
    lines = [b"1 1:0.5 7:1 240:1", b"0 2:0.25 9:1 13:1"]
    ids, vals, labels = parse_libsvm_lines(lines, 3)
    np.testing.assert_array_equal(labels, [1.0, 0.0])
    np.testing.assert_array_equal(ids, [[1, 7, 240], [2, 9, 13]])
    np.testing.assert_allclose(vals, [[0.5, 1, 1], [0.25, 1, 1]])


def test_parse_ragged_pads_and_truncates():
    lines = [b"1 1:0.5", b"0 2:1 3:1 4:1 5:1"]
    ids, vals, labels = parse_libsvm_lines(lines, 3)
    np.testing.assert_array_equal(ids, [[1, 0, 0], [2, 3, 4]])
    np.testing.assert_allclose(vals, [[0.5, 0, 0], [1, 1, 1]])


def test_dataset_batching_and_padding(tmp_path):
    path = str(tmp_path / "tr.libsvm")
    write_synthetic_libsvm(path, 25, feature_size=500)
    ds = LibsvmDataset([path], field_size=39, batch_size=10, num_epochs=1)
    batches = list(ds)
    assert len(batches) == 3
    for b in batches:
        assert b["feat_ids"].shape == (10, 39)
        assert b["feat_vals"].shape == (10, 39)
        assert b["label"].shape == (10,)
    # final batch padded with mask
    assert batches[-1]["mask"].sum() == 5
    assert batches[0]["mask"].sum() == 10


def test_dataset_epochs_and_shuffle_preserve_multiset(tmp_path):
    path = str(tmp_path / "tr.libsvm")
    write_synthetic_libsvm(path, 20, feature_size=500)
    ds = LibsvmDataset(
        [path], field_size=39, batch_size=5, num_epochs=2, perform_shuffle=True, seed=1
    )
    seen = []
    for b in ds:
        seen.extend(b["feat_ids"][:, 13].tolist())
    assert len(seen) == 40
    base = LibsvmDataset([path], field_size=39, batch_size=5)
    ref = []
    for b in base:
        ref.extend(b["feat_ids"][:, 13].tolist())
    assert sorted(seen) == sorted(ref * 2)


def test_drop_remainder(tmp_path):
    path = str(tmp_path / "tr.libsvm")
    write_synthetic_libsvm(path, 25, feature_size=500)
    ds = LibsvmDataset([path], field_size=39, batch_size=10, drop_remainder=True)
    assert len(list(ds)) == 2


def test_prefetcher_propagates_and_orders():
    items = list(range(100))
    assert list(Prefetcher(iter(items), size=4)) == items

    def boom():
        yield 1
        raise RuntimeError("kaput")

    with pytest.raises(RuntimeError, match="kaput"):
        list(Prefetcher(boom(), size=2))


def test_shard_files_for_host():
    files = [f"f{i}" for i in range(10)]
    s0 = shard_files_for_host(files, 0, 4)
    s1 = shard_files_for_host(files, 1, 4)
    all_shards = sum((shard_files_for_host(files, i, 4) for i in range(4)), [])
    assert sorted(all_shards) == sorted(files)
    assert not set(s0) & set(s1)


def test_synchronized_iterator_equalizes_hosts():
    """Multi-host batch agreement: with a fake agreement fn simulating a
    shorter peer, the iterator yields exactly the agreed counts and makes
    the same number of agreements regardless of local surplus (the
    deadlock-avoidance contract; data/pipeline.synchronized_iterator)."""
    from tf_repos_tpu.data.pipeline import synchronized_iterator

    # peer has 21 items, we have 40, window 8 -> agreements:
    #   w1: both continue (9) -> 8 items; w2: both continue -> 8;
    #   w3: peer exhausted with 5 -> min(9,5)=5 -> stop. total 21.
    peer = [9, 9, 5]
    calls = []

    def agree(signal):
        calls.append(signal)
        return min(signal, peer[len(calls) - 1])

    got = list(synchronized_iterator(iter(range(40)), sync_every=8, agree_min=agree))
    assert got == list(range(21))
    assert calls == [9, 9, 9]  # we always had a full window + more

    # exact-boundary exhaustion: 16 local items, peer unlimited
    calls2 = []

    def agree2(signal):
        calls2.append(signal)
        return signal  # peer never the limiter

    got2 = list(synchronized_iterator(iter(range(16)), sync_every=8, agree_min=agree2))
    assert got2 == list(range(16))
    # third agreement signals OUR exhaustion (0) so peers stop with us
    assert calls2 == [9, 9, 0]


def test_native_parser_matches_python(tmp_path):
    """C++ libsvm parser == NumPy parser on well-formed, ragged, and
    value-less tokens."""
    from tf_repos_tpu.data import native
    from tf_repos_tpu.data.libsvm import parse_libsvm_lines

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    lines = [
        b"1 1:0.5 2:1 3:0.25",
        b"0 4:1 5:2e-2 6:-1.5",
        b"1 7:1 8:1",  # ragged: fewer than field_size
        b"0 9:1 10:1 11:1 12:1",  # surplus: truncated
        b"1 13 14:",  # no colon -> val 1.0; empty val -> 1.0
    ]
    ids_n, vals_n, labels_n = native.parse_libsvm_lines(lines, 3)
    ids_p, vals_p, labels_p = parse_libsvm_lines(lines, 3)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_allclose(vals_n, vals_p, rtol=1e-6)
    np.testing.assert_array_equal(labels_n, labels_p)


def test_native_blob_parser(tmp_path):
    from tf_repos_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    blob = b"1 1:0.5 2:1\n\n0 3:1 4:0.25\n"
    ids, vals, labels = native.parse_libsvm_blob(blob, 2)
    np.testing.assert_array_equal(ids, [[1, 2], [3, 4]])
    np.testing.assert_allclose(vals, [[0.5, 1.0], [1.0, 0.25]])
    np.testing.assert_array_equal(labels, [1.0, 0.0])


def test_auto_multi_hot_pad(tmp_path):
    """multi_hot_pad=0 derives a data-driven pad (p95 rounded to 8) —
    oversized static pads directly tax TPU gather/scatter throughput."""
    from tf_repos_tpu.data.ragged import AliccpDataset, auto_multi_hot_pad
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp

    p = tmp_path / "s.txt"
    write_synthetic_aliccp(str(p), 200, feature_size=500, multi_hot=5, seed=0)
    pad = auto_multi_hot_pad([str(p)])
    assert pad == 8  # true lengths 1..5 -> p95 rounds up to 8
    ds = AliccpDataset([str(p)], batch_size=16, multi_hot_pad=0)
    assert ds.multi_hot_pad == 8
    b = next(iter(ds))
    assert b["u_catids"].shape == (16, 8)


def test_native_aliccp_parser_matches_python(tmp_path):
    """C++ aliccp parser == Python parser on real-shaped sample lines
    (defaults, multi-hot padding/truncation, malformed rows)."""
    from tf_repos_tpu.data import native
    from tf_repos_tpu.data.ragged import parse_aliccp_lines
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    p = tmp_path / "s.txt"
    write_synthetic_aliccp(str(p), 300, feature_size=5000, multi_hot=6, seed=3)
    lines = open(p, "rb").read().splitlines()
    # add edge cases: absent fields (defaults), malformed, truncation
    lines += [
        b"s_a,1,0,205:77:1.0",                      # only one common field
        b"bad line without commas",                  # malformed -> mask 0
        b"s_b,0,0," + b" ".join(b"109_14:%d:1.0" % i for i in range(100, 120)),  # truncate
        b"s_c,1,1,206:5:1.0 210:9:1.0 150_14:44:0.5 999:1:1.0",  # unknown field ignored
    ]
    for pad in (4, 16):
        want = parse_aliccp_lines(lines, pad)
        got = native.parse_aliccp_lines(lines, pad)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=f"key {k} pad {pad}")


def test_native_parser_malformed_tokens_resync(tmp_path):
    """Malformed tokens must not stall the C++ cursor: one bad token
    cannot mangle the remaining columns of the line."""
    from tf_repos_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    lines = [
        b"1 xx 2:0.5 3:1",       # leading junk token skipped, rest parsed
        b"0 4:1x 5:2",           # trailing junk in token, cursor resyncs
        b"1 6:1e-2 7:2E3",       # scientific notation
    ]
    ids, vals, labels = native.parse_libsvm_lines(lines, 2)
    np.testing.assert_array_equal(ids, [[2, 3], [4, 5], [6, 7]])
    np.testing.assert_allclose(vals, [[0.5, 1.0], [1.0, 2.0], [0.01, 2000.0]], rtol=1e-6)


def test_native_parser_huge_exponent_no_stall():
    """A malformed giant exponent ("1e2000000000") must neither overflow the
    exponent accumulator (signed-int UB) nor spin the scaling loop for
    billions of iterations — it saturates to inf/0 promptly (ADVICE r1)."""
    from tf_repos_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    import time

    lines = [
        b"1 1:1e2000000000 2:0.5",   # saturates to +inf
        b"0 3:1e-2000000000 4:2.0",  # saturates to 0
        b"1 5:2e30 6:1.0",           # large but valid (within float32): exact
    ]
    t0 = time.time()
    ids, vals, labels = native.parse_libsvm_lines(lines, 2)
    assert time.time() - t0 < 2.0  # would be ~minutes if the loop spun
    np.testing.assert_array_equal(ids, [[1, 2], [3, 4], [5, 6]])
    assert np.isinf(vals[0, 0]) and vals[0, 1] == 0.5
    assert vals[1, 0] == 0.0 and vals[1, 1] == 2.0
    np.testing.assert_allclose(vals[2], [2e30, 1.0], rtol=1e-6)


def test_native_aliccp_scinote_and_extra_colons():
    """aliccp C++ parser: e-notation vals parse like Python float();
    tokens with >3 colon-parts are dropped (ragged.py rule)."""
    from tf_repos_tpu.data import native, ragged

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    lines = [b"s0,1,0,205:7:1e-2 109_14:44:2E1 206:5:1.0:junk 207:9:0.5"]
    want = ragged.parse_aliccp_lines(lines, 4)
    got = native.parse_aliccp_lines(lines, 4)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    assert got["feat_ids"][0][9] == 7  # 205 slot
    # 206 dropped (4 parts) -> default 16; 207 kept
    assert got["a_catids"][0] == 16 and got["a_shopids"][0] == 9


def test_aliccp_match_structure(tmp_path):
    """write_synthetic_aliccp(match_prob>0): the ad category (field 206)
    is drawn from the 109_14 history for ~match_prob of lines, and the
    truth sidecar's p_ctr is strictly higher for contained ads (the DIN
    convergence-demo retrieval structure)."""
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp

    path = tmp_path / "s.txt"
    truth = tmp_path / "s.truth"
    write_synthetic_aliccp(
        str(path), 4000, feature_size=3000, multi_hot=10, seed=0,
        ctr=0.15, match_prob=0.3, match_strength=4.0, truth_path=str(truth),
    )
    import numpy as np

    t = np.loadtxt(truth)
    matched, unmatched = [], []
    for line, p_y in zip(open(path), t[:, 2]):
        feats = line.strip().split(",", 3)[3].split(" ")
        hist = {f.split(":")[1] for f in feats if f.startswith("109_14:")}
        ad = [f.split(":")[1] for f in feats if f.startswith("206:")][0]
        (matched if ad in hist else unmatched).append(p_y)
    frac = len(matched) / 4000
    assert 0.25 < frac < 0.40, frac  # match_prob + chance collisions
    assert min(matched) > max(unmatched)  # two-point p_ctr distribution


def test_prefetcher_abandoned_iterator_stops_worker(tmp_path):
    """Breaking out of a Prefetcher mid-stream (graceful shutdown,
    synchronized_iterator cut) must stop the background thread instead
    of leaving it blocked on the full queue holding open files."""
    import threading
    import time as T

    from tf_repos_tpu.data.pipeline import Prefetcher

    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = iter(Prefetcher(gen(), size=2))
    assert next(it) == 0
    it.close()  # abandon
    deadline = T.time() + 5
    while threading.active_count() > before and T.time() < deadline:
        T.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
    assert len(produced) < 100  # it stopped producing, not just detached

    # and the normal path still terminates with all items + error propagation
    assert list(Prefetcher(iter(range(5)), size=2)) == [0, 1, 2, 3, 4]

    def bad():
        yield 1
        raise ValueError("boom")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        list(Prefetcher(bad(), size=2))


def test_packed_cache_builds_hits_and_invalidates(tmp_path):
    """--packed_cache: first pass parses text AND writes the sidecar;
    later passes memmap it and yield identical batches; editing the
    source invalidates the cache."""
    import json
    import os

    path = str(tmp_path / "tr.libsvm")
    write_synthetic_libsvm(path, 25, feature_size=500)

    def collect(**kw):
        ds = LibsvmDataset([path], field_size=39, batch_size=10, num_epochs=1, **kw)
        return list(ds)

    plain = collect()
    built = collect(packed_cache=True)
    meta = tmp_path / ".packed_cache" / "tr.libsvm.f39.meta.json"
    assert meta.exists()
    rows = json.loads(meta.read_text())["rows"]
    assert rows == 25
    cached = collect(packed_cache=True)  # second run: memmap path
    for a, b, c in zip(plain, built, cached):
        for k in ("feat_ids", "feat_vals", "label", "mask"):
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    # no temp leftovers from the build
    assert not [f for f in os.listdir(tmp_path / ".packed_cache") if ".tmp." in f]

    # multi-epoch with shuffle: cache hit preserves the example multiset
    ds2 = LibsvmDataset(
        [path], field_size=39, batch_size=5, num_epochs=2,
        perform_shuffle=True, seed=3, packed_cache=True,
    )
    seen = []
    for b in ds2:
        seen.extend(np.asarray(b["feat_ids"])[b["mask"] > 0, 13].tolist())
    ref = []
    for b in plain:
        ref.extend(np.asarray(b["feat_ids"])[b["mask"] > 0, 13].tolist())
    assert sorted(seen) == sorted(ref * 2)

    # invalidation: rewrite the source with different content
    write_synthetic_libsvm(path, 12, feature_size=500, seed=7)
    os.utime(path, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    after = collect(packed_cache=True)
    assert int(sum(b["mask"].sum() for b in after)) == 12
    assert json.loads(meta.read_text())["rows"] == 12


def test_packed_cache_aliccp_matches_text_path(tmp_path):
    """Ali-CCP packed cache: build + hit yield the same example multiset
    and the same batch contract as the per-line text path."""
    from tf_repos_tpu.data.ragged import AliccpDataset
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp

    path = str(tmp_path / "tr.txt")
    write_synthetic_aliccp(path, 37, 5000)

    def collect(**kw):
        return list(
            AliccpDataset([path], batch_size=10, num_epochs=1, multi_hot_pad=8, **kw)
        )

    plain = collect()
    built = collect(packed_cache=True)
    assert (tmp_path / ".packed_cache" / "tr.txt.p8.meta.json").exists()
    cached = collect(packed_cache=True)
    assert len(plain) == len(built) == len(cached) == 4
    for a, b, c in zip(plain, built, cached):
        assert set(a) == set(b) == set(c)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    assert plain[-1]["mask"].sum() == 7  # partial-batch padding preserved

    # shuffle + 2 epochs on the cache hit preserves the example multiset
    seen = []
    for b in AliccpDataset(
        [path], batch_size=5, num_epochs=2, multi_hot_pad=8,
        perform_shuffle=True, seed=11, packed_cache=True,
    ):
        seen.extend(np.asarray(b["feat_ids"])[b["mask"] > 0, 0].tolist())
    ref = []
    for b in plain:
        ref.extend(np.asarray(b["feat_ids"])[b["mask"] > 0, 0].tolist())
    assert sorted(seen) == sorted(ref * 2)


def test_packed_cache_csv_matches_text_path(tmp_path):
    """CSV packed cache: build + hit == the per-line text path."""
    from tf_repos_tpu.data.csv import CsvDataset
    from tf_repos_tpu.data.synthetic import write_synthetic_csv

    path = str(tmp_path / "tr.csv")
    write_synthetic_csv(path, 23, 400)

    def collect(**kw):
        return list(CsvDataset([path], batch_size=10, num_epochs=1, **kw))

    plain = collect()
    built = collect(packed_cache=True)
    assert (tmp_path / ".packed_cache" / "tr.csv.csv40.meta.json").exists()
    cached = collect(packed_cache=True)
    assert len(plain) == len(built) == len(cached) == 3
    for a, b, c in zip(plain, built, cached):
        for k in ("cont", "cat", "label", "mask"):
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    assert plain[-1]["mask"].sum() == 3


def test_iter_dict_batches_block_shuffle_covers_all_rows():
    """Wide-row chunks take the batch-block shuffle path (round 5): rows
    must be emitted exactly once per epoch, batches full-sized, and the
    stream actually permuted. Narrow chunks keep the full permutation."""
    import numpy as np

    from tf_repos_tpu.data.pipeline import iter_dict_batches

    B = 8
    rng = np.random.default_rng(0)
    # wide rows: 1 MB/row -> any chunk > 128 rows crosses the 128 MB cap
    chunks = [
        {
            "y": np.arange(i * 200, (i + 1) * 200, dtype=np.int64),
            "wide": np.zeros((200, 262144), np.int8),
        }
        for i in range(3)
    ]
    got = []
    for b in iter_dict_batches(
        iter(chunks), batch_size=B, row_key="y", nprng=rng, shuffle=True
    ):
        assert len(b["y"]) == B
        got.append(np.asarray(b["y"]))
    rows = np.concatenate(got)
    live = rows[rows >= 0]  # final batch zero-pads
    # count multiplicity: every original row exactly once (0 may pad)
    ref = np.arange(600)
    cnt = np.bincount(rows, minlength=600)
    assert cnt[1:].max() == 1 and cnt[1:].min() == 1
    assert cnt[0] >= 1  # row 0 plus any zero padding
    assert not np.array_equal(rows[: len(ref)], ref)  # actually shuffled


def test_iter_dict_batches_block_shuffle_nb_zero_phase_keeps_rows():
    """Regression (code-review round 5): a wide chunk with B < n < 2B
    could draw a phase > n - B, making nb == 0 — the branch then fell
    through and silently DROPPED the whole chunk. The phase is now
    clamped so at least one full block survives; every row must be
    emitted for every seed."""
    import numpy as np

    from tf_repos_tpu.data.pipeline import iter_dict_batches

    B, n = 8, 11  # B < n < 2B
    for seed in range(12):
        rng = np.random.default_rng(seed)
        chunks = [
            {
                "y": np.arange(1, n + 1, dtype=np.int64),
                "wide": np.zeros((n, 262144), np.int8),  # forces the path
            }
        ]
        rows = np.concatenate([
            np.asarray(b["y"]) for b in iter_dict_batches(
                iter(chunks), batch_size=B, row_key="y", nprng=rng,
                shuffle=True,
            )
        ])
        cnt = np.bincount(rows, minlength=n + 1)
        assert cnt[1:].min() == 1 and cnt[1:].max() == 1, (seed, rows)
