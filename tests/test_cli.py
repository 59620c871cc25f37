"""CLI contract test: the actual ``python -m tf_repos_tpu.main`` entry
(the reference's per-model-script command line, unified behind --model)."""

import os
import subprocess
import sys

import numpy as np

from tf_repos_tpu.data.synthetic import write_synthetic_libsvm


def _run(args, cwd, env):
    r = subprocess.run(
        [sys.executable, "-m", "tf_repos_tpu.main", *args],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_main_cli_train_infer_export(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env.update(
        PYTHONPATH=repo,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_libsvm(str(d / "tr.libsvm"), 160, feature_size=400, seed=0)
    write_synthetic_libsvm(str(d / "va.libsvm"), 64, feature_size=400, seed=1)
    write_synthetic_libsvm(str(d / "te.libsvm"), 32, feature_size=400, seed=2)
    common = [
        "--model=DeepFM", "--feature_size=400", "--field_size=39",
        "--embedding_size=4", "--deep_layers=8,4", "--dropout=1.0,1.0",
        "--batch_size=32", "--num_epochs=1", "--log_steps=2",
        f"--data_dir={d}", f"--model_dir={tmp_path}/model/", "--dt_dir=cli",
        "--eval_throttle_secs=0", f"--servable_model_dir={tmp_path}/servable",
    ]
    out = _run(["--task_type=train", *common], repo, env)
    assert "INFO: step = " in out and "RESULT:" in out and "auc" in out

    out = _run(["--task_type=eval", *common], repo, env)
    assert "auc" in out

    _run(["--task_type=infer", *common], repo, env)
    preds = [float(x) for x in open(d / "pred.txt").read().split()]
    assert len(preds) == 32 and all(0 <= p <= 1 for p in preds)

    _run(["--task_type=export", *common], repo, env)
    versions = os.listdir(tmp_path / "servable")
    assert versions and versions[0].isdigit()
