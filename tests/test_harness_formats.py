"""Harness end-to-end over the non-libsvm input formats: CSV
(wide_n_deep) and Ali-CCP sample lines (DIN, ESMM)."""

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import write_synthetic_aliccp, write_synthetic_csv
from tf_repos_tpu.train.harness import run_task


def _base(workdir, **kw):
    cfg = dict(
        embedding_size=4,
        deep_layers="8,4",
        dropout="1.0,1.0",
        batch_size=16,
        num_epochs=1,
        log_steps=5,
        learning_rate=0.01,
        data_dir=str(workdir / "data"),
        model_dir=str(workdir / "model"),
        dt_dir="20260101",
        eval_throttle_secs=0,
        seed=7,
    )
    cfg.update(kw)
    return Config(**cfg)


def test_wide_n_deep_csv_lifecycle(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_csv(str(d / "tr.csv"), 120, seed=0)
    write_synthetic_csv(str(d / "va.csv"), 60, seed=1)
    write_synthetic_csv(str(d / "te.csv"), 30, seed=2)
    cfg = _base(tmp_path, model="wide_n_deep", feature_size=0, field_size=39)
    metrics = run_task(cfg)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["auc"] <= 1.0
    out = run_task(cfg.replace(task_type="infer"))
    preds = [float(x) for x in open(out).read().split()]
    assert len(preds) == 30
    assert all(0.0 <= p <= 1.0 for p in preds)


@pytest.mark.parametrize("model", ["din", "esmm"])
def test_aliccp_models_lifecycle(model, tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_aliccp(str(d / "tr.samples.txt"), 120, feature_size=800, seed=0)
    write_synthetic_aliccp(str(d / "va.samples.txt"), 60, feature_size=800, seed=1)
    write_synthetic_aliccp(str(d / "te.samples.txt"), 30, feature_size=800, seed=2)
    cfg = _base(
        tmp_path, model=model, feature_size=800, field_size=11, multi_hot_pad=8
    )
    metrics = run_task(cfg)
    assert np.isfinite(metrics["loss"])
    if model == "esmm":
        for k in ("CTR_AUC", "CVR_AUC", "CTCVR_AUC"):
            assert 0.0 <= metrics[k] <= 1.0
    out = run_task(cfg.replace(task_type="infer"))
    preds = open(out).read().split("\n")
    assert len([p for p in preds if p]) == 30
