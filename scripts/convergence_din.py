"""DIN convergence demo — attention vs sum-pooling on a planted
RETRIEVAL structure.

The generator (data/synthetic.write_synthetic_aliccp with match_prob >
0) copies the ad's category id from the line's behavior history with
probability match_prob and adds match_strength to the click logit when
the ad id truly occurs in the history — the "ad relates to past
behavior" signal DIN's attention unit models (DIN.py:152-173: per-item
MLP over [u, u-a, a] -> weight -> masked weighted pool). Plain
sum-pooling (--attention_pooling=false, the reference's else-branch
DIN.py:179-183) blurs containment across the history, so the demo both
(a) shows DIN learning to its Bayes ceiling through the real harness
and (b) quantifies what the attention component is worth on a task
where it should matter.

Measured (defaults, 400k lines x 8 epochs, ceiling 0.8379):
attention AUC 0.8310 = 97.9% of ceiling excess; sum-pool 0.7334 = 69.1%
— a +0.098 AUC win for the attention unit on the retrieval task.
(At match_strength 2.5 x 3 epochs both sit at ~43% and tie: the
multiplicative containment signal needs the stronger gradient to
separate the architectures.)

    python scripts/convergence_din.py [--train_lines 400000]
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
    p.add_argument("--train_lines", type=int, default=400_000)
    p.add_argument("--valid_lines", type=int, default=100_000)
    p.add_argument("--feature_size", type=int, default=3000)
    p.add_argument("--multi_hot", type=int, default=10)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--ctr", type=float, default=0.15)
    p.add_argument("--match_prob", type=float, default=0.3)
    p.add_argument("--match_strength", type=float, default=4.0)
    p.add_argument("--steps_per_dispatch", type=int, default=8)
    p.add_argument("--work_dir", default="")
    a = p.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp
    from tf_repos_tpu.ops import metrics as M
    from tf_repos_tpu.train.harness import run_task

    work = a.work_dir or tempfile.mkdtemp(prefix="din_conv_")
    data = os.path.join(work, "data")
    os.makedirs(data, exist_ok=True)
    gen = dict(
        feature_size=a.feature_size, multi_hot=a.multi_hot, ctr=a.ctr,
        match_prob=a.match_prob, match_strength=a.match_strength,
    )
    print(f"generating {a.train_lines:,} train / {a.valid_lines:,} valid lines ...")
    write_synthetic_aliccp(os.path.join(data, "tr.samples.txt"), a.train_lines,
                           seed=0, **gen)
    write_synthetic_aliccp(os.path.join(data, "va.samples.txt"), a.valid_lines,
                           seed=1, truth_path=os.path.join(work, "va.truth"), **gen)

    truth = np.loadtxt(os.path.join(work, "va.truth"))
    y, p_y = truth[:, 0], truth[:, 2]
    ceiling = float(M.exact_auc(y, p_y))
    print(f"bayes ceiling: {ceiling:.4f}")

    out = {"work_dir": work, "ceiling": round(ceiling, 4)}
    for pooling in (True, False):
        tag = "attention" if pooling else "sum_pool"
        cfg = Config(
            model="DIN", feature_size=a.feature_size, field_size=11,
            embedding_size=16, deep_layers="128,64", dropout="1.0,1.0",
            attention_layers="128", attention_pooling=pooling,
            batch_size=a.batch_size, num_epochs=a.epochs, log_steps=50,
            learning_rate=a.learning_rate, l2_reg=1e-6, optimizer="Adam",
            multi_hot_pad=a.multi_hot + 2,
            data_dir=data, model_dir=os.path.join(work, f"model_{tag}"),
            dt_dir="x", eval_throttle_secs=0, clear_existing_model=True,
            write_metrics=False, steps_per_dispatch=a.steps_per_dispatch,
        )
        m = run_task(cfg)
        auc = float(m.get("auc", float("nan")))
        out[f"{tag}_auc"] = round(auc, 4)
        out[f"{tag}_pct_of_ceiling_excess"] = round(
            100 * (auc - 0.5) / max(ceiling - 0.5, 1e-9), 1
        )
    out["attention_minus_sum_pool"] = round(
        out["attention_auc"] - out["sum_pool_auc"], 4
    )
    print("DIN_CONVERGENCE " + json.dumps(out))


if __name__ == "__main__":
    main()
