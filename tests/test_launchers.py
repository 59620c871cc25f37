"""CI smoke for the launcher scripts the README advertises (VERDICT r1
item 9): run.sh in fast mode (one model, tiny data) and run_dist.sh with
two processes — as real subprocesses, the way a user invokes them."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(tmp_path, **extra):
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    env.update(extra)
    return env


def test_run_sh_fast_mode(tmp_path):
    env = _env(
        tmp_path,
        DATA_DIR=str(tmp_path / "criteo"),
        MODEL_ROOT=str(tmp_path / "models"),
        FEATURE_SIZE="2000",
        TRAIN_LINES="400",
        BATCH="64",
        MODELS="DeepFM",
        SKIP_CSV="1",
        SKIP_ALICCP="1",
    )
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run.sh")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "ALL MODELS OK" in r.stdout
    assert "==== DeepFM ====" in r.stdout
    # infer leg wrote predictions
    assert os.path.isfile(tmp_path / "criteo" / "pred.txt")


def test_run_dist_sh_two_processes(tmp_path):
    env = _env(
        tmp_path,
        DATA_DIR=str(tmp_path / "dist_data"),
        MODEL_DIR=str(tmp_path / "dist_model") + "/",
        FEATURE_SIZE="2000",
        NPROC="2",
        PORT="0",  # run_dist picks PORT..PORT+1; 0 is invalid -> use free
    )
    # pick two free ports deterministically
    import socket

    s1, s2 = socket.socket(), socket.socket()
    s1.bind(("127.0.0.1", 0))
    s2.bind(("127.0.0.1", 0))
    port = s1.getsockname()[1]
    env["PORT"] = str(port)
    s1.close(), s2.close()
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_dist.sh")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # SPMD lockstep check: both workers print loss lines
    loss_lines = [l for l in r.stdout.splitlines() if "loss =" in l]
    assert loss_lines, r.stdout[-2000:]


def test_aliccp_mr_launchers_local_mode(tmp_path):
    """The Hadoop-streaming wrappers (scripts/aliccp_mr/, parity with
    DeepMTL/Feature_pipeline/get_*.sh) chain correctly in LOCAL=1 mode:
    map | sort | reduce per stage, same contract as the cluster job."""
    import random

    rng = random.Random(0)
    skel, comm = [], []
    for ci in range(5):
        feats = "\x01".join(
            f"109_14\x02{rng.randint(100, 110)}\x031.0" for _ in range(3)
        )
        comm.append(f"c{ci},3,{feats}")
    for si in range(40):
        y, z = rng.randint(0, 1), rng.randint(0, 1)
        feats = "\x01".join(
            [f"205\x02{rng.randint(1, 5)}\x031.0", f"206\x02{rng.randint(6, 9)}\x031.0"]
        )
        skel.append(f"s{si},{y},{z},c{si % 5},2,{feats}")
    raw = "\n".join(skel + comm) + "\n"

    env = _env(tmp_path, LOCAL="1", CUTOFF="1")
    mr = os.path.join(REPO, "scripts", "aliccp_mr")

    def run_stage(script, stdin, *args):
        r = subprocess.run(
            ["bash", os.path.join(mr, script), *args],
            input=stdin, capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    joined = run_stage("get_join_sample.sh", raw, "tr")
    assert joined and all(
        not (l.split(",")[1] == "0" and l.split(",")[2] == "1")
        for l in joined.splitlines()
    )
    counts = run_stage("get_stat_feat.sh", joined)
    assert counts and all("\t" in l for l in counts.splitlines())
    cnts_file = tmp_path / "feat_cnts.txt"
    cnts_file.write_text(counts)
    remapped = run_stage("get_remap_fid.sh", joined, "tr", str(cnts_file))
    lines = [l for l in remapped.splitlines() if l]
    assert lines
    from tf_repos_tpu.features.aliccp import REMAP_BASE

    for line in lines[:10]:
        _, _, _, feats = line.split(",", 3)
        for fstr in feats.split(" "):
            assert int(fstr.split(":")[1]) >= REMAP_BASE


def test_zoo_csv_view_contract(tmp_path):
    """scripts/zoo_auc.make_csv_view: raw surrogate TSV -> the
    wide_n_deep CSV contract (wide_n_deep.py:55-63): label int, I1..I13
    min-max-normalized floats in [0,1], C14..C39 identity ids in
    [1, 10000); parses through the real CsvDataset."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import numpy as np

    from tf_repos_tpu.data import criteo_surrogate as CS
    from tf_repos_tpu.data.csv import CsvDataset
    from zoo_auc import make_csv_view

    CS.configure(5000)
    raw = tmp_path / "train.txt"
    CS.generate_raw(str(raw), 5000, seed=0)
    make_csv_view(str(raw), str(tmp_path / "csv"))

    n = 0
    for batch in CsvDataset([str(tmp_path / "csv" / "tr.csv")], batch_size=512):
        m = batch["mask"] > 0
        cont, cat = batch["cont"][m], batch["cat"][m]
        assert cont.min() >= 0.0 and cont.max() <= 1.0
        assert cat.min() >= 1 and cat.max() < 10000
        assert set(np.unique(batch["label"][m])) <= {0.0, 1.0}
        n += int(m.sum())
    n_va = sum(1 for _ in open(tmp_path / "csv" / "va.csv"))
    assert n == 4500 and n_va == 500
