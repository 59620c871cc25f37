"""ESMM multi-task convergence demo — the behavioral analog of the
reference's published learn curve (DeepMTL/uploads/learn_curve.png:
CTR_AUC ~0.602, CVR_AUC ~0.61 after ~11k steps on a weak-signal
subsample; DeepMTL/README.md:47).

Generates Ali-CCP-format sample lines with a PLANTED weak logistic
structure for both tasks (data/synthetic.write_synthetic_aliccp with
strength > 0), computes each task's Bayes-ceiling AUC by scoring the
held-out set with the TRUE probabilities, trains ESMM through the real
harness, and reports ctr/cvr/ctcvr AUC as a fraction of its ceiling.

Default sizes are chosen so the ceiling is INFORMATION-THEORETICALLY
reachable (logistic Fisher analysis): per-id coefficient noise is
std = 1/sqrt(n_obs * p(1-p)); with V=3000, 600k lines x ~21 ids/line,
CTR ids get ~4200 observations (estimate/truth correlation ~0.97) while
CVR ids learn only from the ~15% clicked subset (~630 obs, corr ~0.88)
— the same click-gated information bottleneck the reference's CVR task
has (DeepMTL/README.md:47 reports CVR_AUC ~0.61 barely above CTR ~0.602).
Expect CTR >= ~90% of ceiling excess and CVR structurally lower.

    python scripts/convergence_esmm.py [--train_lines 600000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_lines", type=int, default=600_000)
    p.add_argument("--valid_lines", type=int, default=100_000)
    p.add_argument("--feature_size", type=int, default=3000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--ctr", type=float, default=0.15)
    p.add_argument("--strength", type=float, default=6.0)
    p.add_argument("--steps_per_dispatch", type=int, default=8)
    p.add_argument("--work_dir", default="")
    a = p.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp
    from tf_repos_tpu.ops import metrics as M
    from tf_repos_tpu.train.harness import run_task

    work = a.work_dir or tempfile.mkdtemp(prefix="esmm_conv_")
    data = os.path.join(work, "data")
    os.makedirs(data, exist_ok=True)
    print(f"generating {a.train_lines:,} train / {a.valid_lines:,} valid lines ...")
    write_synthetic_aliccp(
        os.path.join(data, "tr.samples.txt"), a.train_lines,
        feature_size=a.feature_size, seed=0, ctr=a.ctr, strength=a.strength,
    )
    write_synthetic_aliccp(
        os.path.join(data, "va.samples.txt"), a.valid_lines,
        feature_size=a.feature_size, seed=1, ctr=a.ctr, strength=a.strength,
        truth_path=os.path.join(work, "va.truth"),
    )

    # Bayes ceilings: score the held-out set with the TRUE probabilities
    truth = np.loadtxt(os.path.join(work, "va.truth"))
    y, z, p_y, p_z = truth[:, 0], truth[:, 1], truth[:, 2], truth[:, 3]
    ceil = {
        # same label/pred pairings as models/esmm.py eval_metrics (CVR is
        # scored against z over ALL samples, the reference's metric shape)
        "ctr": float(M.exact_auc(y, p_y)),
        "cvr": float(M.exact_auc(z, p_z)),
        "ctcvr": float(M.exact_auc(z, p_y * p_z)),
    }
    print("bayes ceilings:", json.dumps({k: round(v, 4) for k, v in ceil.items()}))

    cfg = Config(
        model="ESMM", feature_size=a.feature_size, field_size=11,
        embedding_size=16, deep_layers="256,128,64", dropout="1.0,1.0,1.0",
        batch_size=a.batch_size, num_epochs=a.epochs, log_steps=50,
        learning_rate=a.learning_rate, l2_reg=1e-6, optimizer="Adam",
        ctr_task_wgt=0.5, multi_hot_pad=8,
        data_dir=data, model_dir=os.path.join(work, "model"), dt_dir="x",
        eval_throttle_secs=0, clear_existing_model=True, write_metrics=False,
        steps_per_dispatch=a.steps_per_dispatch,
    )
    m = run_task(cfg)
    out = {"work_dir": work}
    for k, mk in (("ctr", "CTR_AUC"), ("cvr", "CVR_AUC"), ("ctcvr", "CTCVR_AUC")):
        got = float(m.get(mk, float("nan")))
        out[mk] = round(got, 4)
        out[f"{k}_ceiling"] = round(ceil[k], 4)
        excess = (got - 0.5) / max(ceil[k] - 0.5, 1e-9)
        out[f"{k}_pct_of_ceiling_excess"] = round(100 * excess, 1)
    print("ESMM_CONVERGENCE " + json.dumps(out))


if __name__ == "__main__":
    main()
