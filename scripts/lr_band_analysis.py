"""The LR/wide band: calibration-or-infeasibility analysis (VERDICT r3
item 2, r2 item 3).

Published ladder (real Criteo, deep_ctr/uploads/tensorboard_auc.png):
LR = 0.777 sits ABOVE default-hypers DeepFM = 0.769. On the surrogate
zoo (ZOO_AUC.md) LR ranks LAST at 0.7460 although the plant's
first-order-only Bayes score is calibrated to 0.780. This script
decomposes that gap into its mechanical parts, each measurable from the
generator's closed form:

  s_bayes          the full planted score            (Bayes ceiling)
  s_first          first-order component only        (calibrated 0.780)
  s_first_visible  what an IDEAL wide/LR model over the reference's own
                   feature contract can represent: per-field identity
                   buckets keep ranks 1..9999, every rarer rank falls
                   into bucket 0 (wide_n_deep.py:96-97) whose single
                   weight takes the collapsed ranks' conditional mean
                   effect; continuous effects are linear and fully
                   visible
  measured LR      ZOO_AUC.json (FTRL through the real harness)

The difference (s_first - s_first_visible) is REPRESENTATION loss fixed
by the reference's 10k-bucket contract; (s_first_visible - measured) is
the optimization gap. Together they quantify whether the published
ordering (LR above a CONVERGED deep band) is reachable by signal design
alone — see the ZOO_AUC.md discussion this script's output feeds.

Run: python scripts/lr_band_analysis.py [--lines 2000000 --probe 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.data import criteo_surrogate as CS  # noqa: E402
from tf_repos_tpu.features.criteo import (  # noqa: E402
    NUM_CATEGORICAL,
    NUM_CONTINUOUS,
)

NUM_BUCKETS = 10_000  # wide_n_deep.py:98


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lines", type=int, default=2_000_000)
    p.add_argument("--probe", type=int, default=400_000)
    p.add_argument("--seed", type=int, default=77)
    a = p.parse_args(argv)

    CS.configure(a.lines)
    tau, b0, mean, w_pair = CS.calibration()
    F = CS.fields()
    rng = np.random.default_rng(a.seed)
    n = a.probe
    cat = np.stack([F.sample(rng, f, n) for f in range(NUM_CATEGORICAL)], 1)
    u = CS._draw_cont(rng, n)
    first, pair = CS.logit_components(cat, u)
    logit = first + w_pair * pair
    y = (rng.random(n) < CS.label_probs(logit)).astype(np.float64)

    # the ideal-LR-visible first-order score: recompute the categorical
    # first-order sum keeping only ranks < NUM_BUCKETS per field; the
    # collapsed ranks contribute their bucket-0 CONDITIONAL MEAN effect
    # (that is the single weight bucket 0 can learn). Continuous effects
    # are linear in u (logit_components) -> fully LR-visible.
    vis = np.zeros((n,), np.float32)
    lost_var = 0.0
    total_var = 0.0
    collided_fields = []
    for f in range(NUM_CATEGORICAL):
        r = cat[:, f]
        env = CS._envelope(f, r)
        eff = env * np.sin(r.astype(np.float32) * (0.91 + 0.07 * f) + f)
        visible = r < NUM_BUCKETS
        col = ~visible
        b0_eff = float(eff[col].mean()) if col.any() else 0.0
        vis += np.where(visible, eff, b0_eff)
        total_var += float(np.var(eff))
        if col.any():
            resid = np.where(visible, 0.0, eff - b0_eff)
            lost_var += float(np.var(resid))
            collided_fields.append(
                {
                    "field": f"C{f + 1}",
                    "kept": int(F.targets[f]),
                    "frac_rows_collided": round(float(col.mean()), 4),
                }
            )
    for i in range(NUM_CONTINUOUS):
        vis += (2.0 * u[:, i].astype(np.float32) - 1.0) * (0.6 + 0.05 * i)
    vis *= CS.W_FIRST

    def auc(score):
        order = np.argsort(score, kind="stable")
        rk = np.empty(n)
        rk[order] = np.arange(1, n + 1)
        n_pos = float(y.sum())
        n_neg = n - n_pos
        return (float(np.sum(rk * y)) - n_pos * (n_pos + 1) / 2) / max(
            n_pos * n_neg, 1.0
        )

    zoo = {}
    if os.path.exists("ZOO_AUC.json"):
        zoo = json.load(open("ZOO_AUC.json")).get("runs", {})
    lr_measured = zoo.get("LR", {}).get("auc")
    deepfm_measured = zoo.get("DeepFM", {}).get("auc")

    out = {
        "lines": a.lines,
        "bayes_auc": round(auc(logit), 4),
        "first_order_auc": round(auc(first), 4),
        "lr_visible_first_order_auc": round(auc(vis), 4),
        "lr_measured_auc": lr_measured,
        "deepfm_default_measured_auc": deepfm_measured,
        "first_order_var_lost_to_buckets_pct": round(
            100.0 * lost_var / max(total_var, 1e-12), 2
        ),
        "fields_with_bucket_collisions": collided_fields,
        "published": {"LR": 0.777, "DeepFM_default": 0.769,
                      "source": "deep_ctr/uploads/tensorboard_auc.png"},
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
