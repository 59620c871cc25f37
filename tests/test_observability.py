"""Observability + evaluator-process tests (SURVEY §5 auxiliary
subsystems): JSONL metrics, profiler trace capture, eval_loop polling,
feature stats tools."""

import json
import os
import threading
import time

import numpy as np

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
from tf_repos_tpu.features import stats as ST
from tf_repos_tpu.train.harness import Harness, run_task


def _cfg(tmp_path, **kw):
    d = tmp_path / "data"
    if not d.exists():
        d.mkdir()
        write_synthetic_libsvm(str(d / "tr.libsvm"), 160, feature_size=400, seed=0)
        write_synthetic_libsvm(str(d / "va.libsvm"), 64, feature_size=400, seed=1)
    base = dict(
        model="DeepFM", feature_size=400, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=2, data_dir=str(d), model_dir=str(tmp_path / "model"),
        dt_dir="obs", eval_throttle_secs=0, seed=3,
    )
    base.update(kw)
    return Config(**base)


def test_metrics_jsonl_written(tmp_path):
    cfg = _cfg(tmp_path)
    run_task(cfg)
    path = os.path.join(cfg.resolved_model_dir(), "metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    kinds = {r["kind"] for r in recs}
    assert "train" in kinds and "final" in kinds
    train_recs = [r for r in recs if r["kind"] == "train"]
    assert all("loss" in r and "examples_per_sec" in r for r in train_recs)
    assert train_recs[0]["step"] == 2  # log_steps cadence


def test_profile_trace_captured(tmp_path):
    cfg = _cfg(tmp_path, profile_steps=2, profile_start_step=1)
    run_task(cfg)
    prof_dir = os.path.join(cfg.resolved_model_dir(), "profile")
    found = []
    for root, _, files in os.walk(prof_dir):
        found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert found, f"no trace files under {prof_dir}"


def test_eval_loop_follows_checkpoints(tmp_path):
    cfg = _cfg(tmp_path, eval_loop_secs=1, eval_loop_timeout=8)
    run_task(cfg)  # writes a final checkpoint
    res = run_task(cfg.replace(task_type="eval_loop"))
    assert "auc" in res and res["step"] > 0
    # evaluator writes its own metrics stream
    path = os.path.join(cfg.resolved_model_dir(), "eval_metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    assert recs and recs[-1]["kind"] == "eval"


def test_feat_stats_libsvm(tmp_path):
    p = tmp_path / "x.libsvm"
    p.write_text("1 1:0.5 7:1 7:1\n0 7:1 9:1\n")
    cnts = ST.feat_counts_libsvm(open(p))
    assert cnts == {1: 1, 7: 3, 9: 1}
    s = ST.summarize(cnts)
    assert s["distinct_features"] == 3 and s["max_feature_id"] == 9
    h = ST.histogram(cnts, buckets=(2, 5))
    assert h["<2"] == 2 and h["<5"] == 1


def test_feat_stats_aliccp():
    lines = ["s0,1,0,205:7:1.0 205:7:1.0 109_14:44:1.0"]
    cnts = ST.feat_counts_aliccp(lines)
    assert cnts == {"205:7": 2, "109_14:44": 1}


def test_tensorboard_events_readable_by_tensorboard(tmp_path):
    """Hand-rolled event files must be readable by the tensorboard
    package's own reader (VERDICT r1 item 7: parity curves directly
    comparable to deep_ctr/uploads/tensorboard_auc.png)."""
    from tf_repos_tpu.utils.tb_events import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path))
    w.add_scalars(1, {"train/loss": 0.69, "train/examples_per_sec": 1e6})
    w.add_scalars(2, {"train/loss": 0.65})
    w.add_scalars(2, {"eval/auc": 0.801})
    w.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/loss", "train/examples_per_sec", "eval/auc"} <= tags
    loss = acc.Scalars("train/loss")
    assert [e.step for e in loss] == [1, 2]
    assert abs(loss[0].value - 0.69) < 1e-6
    assert abs(acc.Scalars("eval/auc")[0].value - 0.801) < 1e-6


def test_metrics_writer_emits_both_formats(tmp_path):
    from tf_repos_tpu.utils.observability import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write(10, {"loss": 0.5, "auc": 0.8}, kind="eval")
    w.close()
    import glob, json as J

    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))
    rec = [J.loads(l) for l in open(w.path)]
    assert rec[0]["loss"] == 0.5 and rec[0]["kind"] == "eval"
