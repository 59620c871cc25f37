"""Criteo surrogate: operating-point calibration + pipeline round trip.

Full-scale verification (feature_size within 0.1% of the published
117,581 at 1M+ lines, Bayes ceiling ~0.803) runs via
scripts/criteo_parity.py; these tests cover the invariants cheaply.
"""

import numpy as np
import pytest

from tf_repos_tpu.data import criteo_surrogate as CS
from tf_repos_tpu.features.criteo import (
    NUM_CATEGORICAL,
    NUM_CONTINUOUS,
    preprocess,
)


def test_field_targets_sum_to_published_total():
    t = CS.field_targets()
    assert len(t) == NUM_CATEGORICAL
    assert sum(t) == CS.KEPT_TARGET  # 117,581 - 13 cont - 26 unk
    # small fields keep their real raw cardinality
    assert min(t) == 3 and 4 in t and 24 in t


def test_envelope_vanishes_at_cutoff_boundary():
    """Effects decay to 0 at the kept-vocabulary boundary, so the <unk>
    collapse of sub-cutoff ranks is lossless (the ceiling is achievable
    by the post-cutoff representation)."""
    f = 2  # a capped field
    T = CS.fields().targets[f]
    r = np.array([1, T // 2, T, T + 1, 5 * T])
    env = CS._envelope(f, r)
    assert env[0] > env[1] > 0
    assert env[2] <= 1e-3 and env[3] == 0 and env[4] == 0


def test_generate_and_preprocess_roundtrip(tmp_path):
    CS.calibration(probe=50_000)  # small probe: cache before generating
    st = CS.generate_raw(str(tmp_path / "train.txt"), 30_000, seed=0)
    assert st["lines"] == 30_000
    assert 0.15 < st["ctr"] < 0.40
    # raw format: label \t 13 ints \t 26 cat strings
    with open(tmp_path / "train.txt") as f:
        for _, line in zip(range(100), f):
            parts = line.rstrip("\n").split("\t")
            assert len(parts) == 1 + NUM_CONTINUOUS + NUM_CATEGORICAL
            assert parts[0] in ("0", "1")
            int(parts[1])  # integer feature
            int(parts[14], 16)  # hex categorical
    res = preprocess(str(tmp_path), str(tmp_path / "out"), cutoff=2)
    assert res["field_size"] == 39
    assert res["feature_size"] > 1000
    # libsvm output loads through the standard reader
    first = open(tmp_path / "out" / "tr.libsvm").readline().split()
    assert first[0] in ("0", "1") and len(first) == 40


def test_scaled_cutoff_quantile_equivalence():
    assert CS.scaled_cutoff(CS.N_FULL) == 200
    assert CS.scaled_cutoff(1_000_000) == 4
    assert CS.scaled_cutoff(10_000) == 2  # floor


def teardown_module():
    # drop the small-probe calibration so other tests get the default
    CS._CAL = None
    CS._FIELDS = None


def test_generate_raw_sharded_matches_distribution(tmp_path):
    """--shards N: workers draw independent samples of the SAME
    calibrated distribution (configure(total_lines) in each worker);
    the concatenated file has the exact line count, the raw format, and
    a CTR inside the calibrated band."""
    out = str(tmp_path / "train.txt")
    st = CS.generate_raw_sharded(out, 6_000, seed=0, shards=2, total_lines=6_000)
    assert st["lines"] == 6_000
    assert 0.15 < st["ctr"] < 0.40
    lines = open(out).read().splitlines()
    assert len(lines) == 6_000
    for line in lines[:50] + lines[-50:]:
        parts = line.split("\t")
        assert len(parts) == 1 + NUM_CONTINUOUS + NUM_CATEGORICAL
        assert parts[0] in ("0", "1")
    # shard part files were cleaned up after concatenation
    assert not any(p.name.startswith("train.txt.") for p in tmp_path.iterdir())


def test_preprocess_workers_byte_identical(tmp_path):
    """preprocess(workers=3) must produce byte-identical outputs to the
    sequential path: pass-1 counts merge order-independently, and the
    pass-2 emit fast-forwards the split rng to each chunk's starting
    line index so the tr/va assignment is exactly the sequential one."""
    CS.calibration(probe=50_000)
    raw = tmp_path / "raw"
    raw.mkdir()
    CS.generate_raw(str(raw / "train.txt"), 12_000, seed=3)
    CS.generate_raw(str(raw / "test.txt"), 3_000, seed=4)
    out1, out3 = tmp_path / "p1", tmp_path / "p3"
    s1 = preprocess(str(raw), str(out1), cutoff=2)
    s3 = preprocess(str(raw), str(out3), cutoff=2, workers=3)
    assert s1 == s3
    for name in ("feature_map", "tr.libsvm", "va.libsvm", "te.libsvm"):
        a = (out1 / name).read_bytes()
        b = (out3 / name).read_bytes()
        assert a == b, f"{name} differs between workers=1 and workers=3"
    # no stray part files
    assert not any(".libsvm." in p.name for p in out3.iterdir())
