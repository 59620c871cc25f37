"""Feature-pipeline tests: criteo preprocess, frappe fixer, smart CSV
converter, aliccp join/stat/remap — plus round-trips into the data layer."""

import os
import random

import numpy as np
import pytest

from tf_repos_tpu.features import aliccp as A
from tf_repos_tpu.features import criteo as C
from tf_repos_tpu.features import frappe as F
from tf_repos_tpu.features import smart as SM


# ------------------------------------------------------------------ criteo
def _write_criteo_raw(tmp_path, n=200, seed=0):
    rng = random.Random(seed)
    lines = []
    for _ in range(n):
        label = str(rng.randint(0, 1))
        ints = [str(rng.randint(0, 1000)) if rng.random() > 0.1 else "" for _ in range(13)]
        cats = [
            (f"v{rng.randint(0, 3)}" if rng.random() > 0.1 else "")
            for _ in range(26)
        ]
        lines.append("\t".join([label] + ints + cats))
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    test_lines = ["\t".join(line.split("\t")[1:]) for line in lines[:20]]
    (tmp_path / "test.txt").write_text("\n".join(test_lines) + "\n")


def test_criteo_preprocess_end_to_end(tmp_path):
    _write_criteo_raw(tmp_path)
    out = tmp_path / "out"
    info = C.preprocess(str(tmp_path), str(out), cutoff=5)
    assert info["field_size"] == 39

    # every emitted line has 39 features; categorical ids within range
    tr = (out / "tr.libsvm").read_text().strip().split("\n")
    va = (out / "va.libsvm").read_text().strip().split("\n")
    assert len(tr) + len(va) == 200
    for line in tr[:50]:
        parts = line.split(" ")
        assert parts[0] in ("0", "1")
        assert len(parts) == 40
        ids = [int(p.split(":")[0]) for p in parts[1:]]
        assert ids[:13] == list(range(1, 14))
        assert all(13 <= i < info["feature_size"] for i in ids[13:])
        vals = [float(p.split(":")[1]) for p in parts[1:14]]
        assert all(0.0 <= v <= 1.0 for v in vals)

    # feature_map ids must match EMITTED ids (deviation from reference's
    # internal off-by-one, see criteo.py docstring)
    fmap = {}
    for line in (out / "feature_map").read_text().strip().split("\n"):
        k, v = line.rsplit(" ", 1)
        fmap[k] = int(v)
    assert fmap["I1"] == 1
    cat_ids = [v for k, v in fmap.items() if k.startswith("C1|")]
    assert min(cat_ids) == 13  # C1's <unk> sits at offset 13
    assert max(fmap.values()) == info["feature_size"] - 1

    # te.libsvm exists and parses
    te = (out / "te.libsvm").read_text().strip().split("\n")
    assert len(te) == 20


def test_criteo_feeds_libsvm_dataset(tmp_path):
    from tf_repos_tpu.data.libsvm import LibsvmDataset

    _write_criteo_raw(tmp_path, n=64)
    out = tmp_path / "out"
    info = C.preprocess(str(tmp_path), str(out), cutoff=2)
    ds = LibsvmDataset([str(out / "tr.libsvm")], field_size=39, batch_size=16)
    batch = next(iter(ds))
    assert batch["feat_ids"].shape == (16, 39)
    assert batch["feat_vals"].shape == (16, 39)
    assert batch["feat_ids"].max() < info["feature_size"]


def test_criteo_continuous_clipping():
    cont = C.ContinuousFeatureGenerator(num_feature=1, clip=[10])
    cont.accumulate(["5"], 0)
    cont.accumulate(["100"], 0)  # clipped to 10
    assert cont.min[0] == 5 and cont.max[0] == 10
    assert cont.gen(0, "100") == 1.0  # clipped before normalizing
    assert cont.gen(0, "") == 0.0


def test_criteo_category_cutoff_and_order():
    cats = C.CategoryDictGenerator(num_feature=1)
    for v, n in [("a", 5), ("b", 3), ("c", 1)]:
        for _ in range(n):
            cats.accumulate([v], 0)
    cats.build(cutoff=2)
    # c dropped; a (most frequent) -> 1, b -> 2; unknown -> 0
    assert cats.gen(0, "a") == 1
    assert cats.gen(0, "b") == 2
    assert cats.gen(0, "c") == 0


# ------------------------------------------------------------------ frappe
def test_frappe_label_fix(tmp_path):
    p = tmp_path / "tr.libsvm"
    p.write_text("-1 1:1 2:1\n1 3:1\nbad\n")
    out = F.fix_file(str(p))
    lines = open(out).read().strip().split("\n")
    assert lines == ["0 1:1 2:1", "1 3:1"]


# ------------------------------------------------------------------- smart
def test_smart_roundtrip(tmp_path):
    n_cols = len(SM.CSV_COLUMNS)
    rows = []
    for i in range(10):
        row = ["1" if i % 2 else "0"]
        for j in range(1, n_cols):
            row.append(f"{0.01 * j:.4f}" if SM._is_continuous(j) else f"cat{j % 3}")
        rows.append(",".join(row))
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "part-0").write_text("\n".join(rows) + "\n")
    out = tmp_path / "out"
    results = SM.run(str(raw), str(out), task_type="tr", threads=2)
    lines = open(results[0]).read().strip().split("\n")
    assert len(lines) == 10
    parts = lines[0].split(" ")
    assert parts[0] == "0"
    assert len(parts) == n_cols  # label + one feature per value column
    # continuous columns carry their raw value
    fmap = SM.load_feature_map(str(out / "feature_map"))
    u_ctr_fid = fmap["u_ctr"]
    assert any(p.startswith(f"{u_ctr_fid}:0.11") for p in parts[1:])
    # unseen categorical value falls back to UNK at convert time
    (raw / "part-0").write_text(rows[0].replace("cat1", "NEW") + "\n")
    results = SM.run(str(raw), str(out), task_type="te", threads=1)
    te_line = open(results[0]).read().strip().split(" ")
    unk_ids = {v for k, v in fmap.items() if k.endswith("|UNK")}
    assert any(int(p.split(":")[0]) in unk_ids for p in te_line[1:])


# ------------------------------------------------------------------ aliccp
def _aliccp_raw(tmp_path, n=50, seed=0):
    rng = random.Random(seed)
    skel, comm = [], []
    for ci in range(5):
        feats = "\x01".join(
            f"109_14\x02{rng.randint(100, 110)}\x031.0" for _ in range(3)
        )
        comm.append(f"c{ci},3,{feats}")
    for si in range(n):
        y = rng.randint(0, 1)
        z = rng.randint(0, 1)
        feats = "\x01".join(
            [f"205\x02{rng.randint(1, 5)}\x031.0", f"206\x02{rng.randint(6, 9)}\x031.0"]
        )
        skel.append(f"s{si},{y},{z},c{si % 5},2,{feats}")
    (tmp_path / "skeleton.csv").write_text("\n".join(skel) + "\n")
    (tmp_path / "common.csv").write_text("\n".join(comm) + "\n")
    return skel


def test_aliccp_pipeline(tmp_path):
    skel = _aliccp_raw(tmp_path)
    out = tmp_path / "out"
    info = A.run_pipeline(
        str(tmp_path / "skeleton.csv"),
        str(tmp_path / "common.csv"),
        str(out),
        cutoff=1,
        threads=2,
    )
    n_illegal = sum(1 for s in skel if s.split(",")[1] == "0" and s.split(",")[2] == "1")
    assert info["num_samples"] == 50 - n_illegal
    lines = open(out / "samples.txt").read().strip().split("\n")
    assert len(lines) == info["num_samples"]
    # every line: sample_id,y,z,feats with remapped ids >= REMAP_BASE
    for line in lines:
        sid, y, z, feats = line.split(",", 3)
        assert not (y == "0" and z == "1")
        for fstr in feats.split(" "):
            field, fid, val = fstr.split(":")
            assert int(fid) >= A.REMAP_BASE
        # common features were joined on
        assert "109_14:" in feats


def test_aliccp_cutoff_drops_rare_ids():
    counts = ["205:7\t25", "205:8\t3", "109_14:44\t20"]
    remap = A.load_remap(counts, cutoff=20)
    assert "7" in remap and "44" in remap and "8" not in remap
    assert sorted(remap.values()) == [20, 21]


def test_aliccp_feeds_ragged_dataset(tmp_path):
    from tf_repos_tpu.data.ragged import AliccpDataset

    _aliccp_raw(tmp_path)
    out = tmp_path / "out"
    A.run_pipeline(
        str(tmp_path / "skeleton.csv"), str(tmp_path / "common.csv"), str(out), cutoff=1
    )
    ds = AliccpDataset([str(out / "samples.txt")], batch_size=8, multi_hot_pad=8)
    batch = next(iter(ds))
    assert batch["feat_ids"].shape == (8, 11)
    assert batch["u_catids"].shape == (8, 8)
    assert set(batch["y"]) <= {0.0, 1.0}


def test_aliccp_streaming_cli_stage_parity(tmp_path):
    """The --mode streaming stages (stdin->stdout) chain to the same
    output as run_pipeline — so the same code slots into Hadoop-streaming
    mapper/reducer jobs like the reference's (get_join_sample.sh etc.)."""
    import subprocess
    import sys

    skel = _aliccp_raw(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")

    def stage(mode, stdin, extra=()):
        r = subprocess.run(
            [sys.executable, "-m", "tf_repos_tpu.features.aliccp", "--mode", mode, *extra],
            input=stdin, capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        return r.stdout

    raw = (tmp_path / "skeleton.csv").read_text() + (tmp_path / "common.csv").read_text()
    joined = stage("join_reduce", stage("join_map", raw))
    counts = stage("stat_reduce", stage("stat_map", joined))
    cnts_file = tmp_path / "cnts"
    cnts_file.write_text(counts)
    remapped = stage(
        "shuffle_reduce",
        stage("remap_map", joined, extra=["--feat_cnts_file", str(cnts_file), "--cutoff", "1", "--seed", "0"]),
    )
    lines = [l for l in remapped.split("\n") if l]
    # same sample multiset as the local pipeline
    out = tmp_path / "out"
    A.run_pipeline(
        str(tmp_path / "skeleton.csv"), str(tmp_path / "common.csv"), str(out),
        cutoff=1, seed=0, threads=1,
    )
    pipeline_lines = [l for l in open(out / "samples.txt").read().split("\n") if l]
    assert sorted(lines) == sorted(pipeline_lines)
