"""End-to-end lifecycle: train -> checkpoint -> resume -> eval -> infer ->
export -> load servable (reference task_type dispatch, DeepFM.py:343-366)."""

import json
import os

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
from tf_repos_tpu.serve.export import latest_version_dir, load_servable
from tf_repos_tpu.train.harness import Harness, run_task


@pytest.fixture
def workdir(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_libsvm(str(data_dir / "tr.part0.libsvm"), 200, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data_dir / "va.part0.libsvm"), 100, feature_size=500, seed=1)
    write_synthetic_libsvm(str(data_dir / "te.part0.libsvm"), 50, feature_size=500, seed=2)
    return tmp_path


def make_cfg(workdir, **kw) -> Config:
    base = dict(
        model="DeepFM",
        feature_size=500,
        field_size=39,
        embedding_size=4,
        deep_layers="8,4",
        dropout="1.0,1.0",
        batch_size=32,
        num_epochs=1,
        log_steps=5,
        learning_rate=0.01,
        data_dir=str(workdir / "data"),
        model_dir=str(workdir / "model"),
        dt_dir="20260101",
        servable_model_dir=str(workdir / "servable"),
        eval_throttle_secs=0,
        seed=7,
    )
    base.update(kw)
    return Config(**base)


def test_full_lifecycle(workdir):
    cfg = make_cfg(workdir)
    metrics = run_task(cfg)
    assert metrics["step"] == 200 // 32 + 1  # 6 full + 1 padded batch
    assert "auc" in metrics and 0.0 <= metrics["auc"] <= 1.0
    assert np.isfinite(metrics["loss"])

    # model_dir is date-partitioned (DeepFM.py:286-288)
    assert os.path.isdir(str(workdir / "model20260101"))

    ev = run_task(cfg.replace(task_type="eval"))
    assert abs(ev["auc"] - metrics["auc"]) < 1e-3

    pred_path = run_task(cfg.replace(task_type="infer"))
    preds = [float(x) for x in open(pred_path)]
    assert len(preds) == 50  # padded rows are not written
    assert all(0.0 <= p <= 1.0 for p in preds)

    out_dir = run_task(cfg.replace(task_type="export"))
    assert os.path.isfile(os.path.join(out_dir, "saved_model.json"))
    sig = json.load(open(os.path.join(out_dir, "saved_model.json")))
    assert sig["inputs"]["feat_ids"]["shape"] == [None, 39]

    # servable round-trip scores identically to infer
    model, params, mstate, _ = load_servable(latest_version_dir(cfg.servable_model_dir))
    from tf_repos_tpu.train.loop import build_predict_step

    h = Harness(cfg.replace(task_type="infer"))
    step = build_predict_step(model)
    from tf_repos_tpu.data.libsvm import LibsvmDataset

    ds = LibsvmDataset(
        [str(workdir / "data" / "te.part0.libsvm")], field_size=39, batch_size=32
    )
    got = []
    for b in ds:
        out = step(params, mstate, b)["prob"]
        got.extend(np.asarray(out)[b["mask"] > 0].tolist())
    np.testing.assert_allclose(got, preds, atol=1e-5)


def test_resume_from_checkpoint(workdir):
    cfg = make_cfg(workdir)
    m1 = run_task(cfg)
    # second run restores at step 7 and trains one more epoch
    m2 = run_task(cfg)
    assert m2["step"] == m1["step"] * 2


def test_checkpoint_cadence_decoupled_from_log_cadence(workdir):
    """save_checkpoints_steps < log_steps must be honored exactly, not
    silently degrade to the log boundary (VERDICT r1 §weak 3)."""
    cfg = make_cfg(workdir, save_checkpoints_steps=2, log_steps=5)
    metrics = run_task(cfg)
    total = metrics["step"]  # 7
    model_dir = str(workdir / "model20260101")
    steps = sorted(
        int(d) for d in os.listdir(model_dir) if d.isdigit() and
        os.path.isdir(os.path.join(model_dir, d))
    )
    # Orbax save_interval_steps=2 accepts 2,4,6; the final save is forced
    assert set(steps) >= {2, 4, 6, total}, steps


def test_singleprocess_midtrain_eval_fires(workdir):
    """eval_throttle_secs with a step-boundary decision clock still fires
    mid-train in the single-process path."""
    cfg = make_cfg(
        workdir, num_epochs=3, eval_throttle_secs=-1, eval_decision_steps=2
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_task(cfg)
    evals = [l for l in buf.getvalue().splitlines() if l.startswith("INFO: eval:")]
    assert len(evals) >= 2  # at least one mid-train + the final eval


def test_clear_existing_model(workdir):
    cfg = make_cfg(workdir)
    m1 = run_task(cfg)
    m2 = run_task(cfg.replace(clear_existing_model=True))
    assert m2["step"] == m1["step"]


def test_steps_per_dispatch_matches_single(workdir):
    """K steps per dispatch (lax.scan host-loop amortization) must
    produce the same training trajectory as per-step dispatch (rng only
    feeds dropout, which is off here)."""
    m1 = run_task(make_cfg(workdir, model_dir=str(workdir / "m1")))
    m4 = run_task(
        make_cfg(workdir, model_dir=str(workdir / "m4"), steps_per_dispatch=4)
    )
    assert m1["step"] == m4["step"]
    assert abs(m1["auc"] - m4["auc"]) < 1e-5
    assert abs(m1["loss"] - m4["loss"]) < 1e-5


GRACEFUL_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from tf_repos_tpu.config import Config
from tf_repos_tpu.train.harness import run_task

m = run_task(Config(
    model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
    deep_layers="8,4", dropout="1.0,1.0", batch_size=16,
    num_epochs=int(sys.argv[3]),
    log_steps=20, learning_rate=0.01, data_dir=sys.argv[1],
    model_dir=sys.argv[2], dt_dir="g", eval_throttle_secs=0,
))
print("RESULT_STOPPED", int(m.get("stopped_by_signal", 0)), m["step"])
"""


def test_graceful_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-train -> the loop breaks at a step boundary, saves a
    checkpoint, skips the final eval, exits 0 (GracefulStop — preemption
    handling); a fresh run against the same model_dir resumes from the
    saved step."""
    import signal
    import subprocess
    import sys
    import time as T

    data = tmp_path / "data"
    data.mkdir()
    write_synthetic_libsvm(str(data / "tr.part0.libsvm"), 400, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data / "va.part0.libsvm"), 50, feature_size=500, seed=1)
    script = tmp_path / "worker.py"
    script.write_text(GRACEFUL_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    p = subprocess.Popen(
        [sys.executable, str(script), str(data), str(tmp_path / "model"), "2000"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    # wait for training to actually produce steps, then preempt.
    # model_dir resolves to "<model_dir><dt_dir>" (reference semantics:
    # model_dir += dt_dir, DeepFM.py:286-288) and the first metrics line
    # lands at the first log boundary (step 20 here) — a positive signal
    # that the loop is past compile and producing steps
    metrics = tmp_path / "modelg" / "metrics.jsonl"
    deadline = T.time() + 120
    while T.time() < deadline:
        if metrics.exists() and metrics.stat().st_size > 0:
            break
        T.sleep(0.25)
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=120)
    assert p.returncode == 0, f"not a clean exit:\\n{err[-2000:]}"
    assert "graceful shutdown: checkpointing at step" in out
    line = [l for l in out.splitlines() if l.startswith("RESULT_STOPPED")][0]
    _, stopped, step = line.split()
    assert stopped == "1" and int(step) > 0

    # resume continues from the saved step (short finishing run, same
    # device topology as the preempted process)
    r = subprocess.run(
        [sys.executable, str(script), str(data), str(tmp_path / "model"), "1"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line2 = [l for l in r.stdout.splitlines() if l.startswith("RESULT_STOPPED")][0]
    _, stopped2, step2 = line2.split()
    assert stopped2 == "0" and int(step2) > int(step)
