"""Truncation policy study: AUC vs --multi_hot_pad at the published
Ali-CCP length regime.

The reference's VarLen input consumes ALL multi-hot values
(/root/reference/deep_ctr/Model_pipeline/DIN.py:65-76,
DeepCvrMTL.py:152-164); this repo's fixed-shape reader truncates each
field at --multi_hot_pad (data/ragged.py). At the published lengths
(largest field avg 250 ids/sample, DeepMTL/README.md:21) a pad sized for
the LIGHT fields silently drops most of the heavy field's history. This
sweep measures what that truncation costs:

  - generate planted data ONCE at full published lengths (the file
    carries every drawn id; truncation is purely the reader's pad),
  - train through the real harness at a ladder of pads with --mh_coo
    (device cost ~ live ids, so the ladder isolates the INFORMATION
    effect, not a speed effect),
  - report each task AUC as a fraction of the Bayes ceiling (scored
    from the generator's truth sidecar, which uses ALL ids).

Models: --model esmm (planted logistic mass spread over all ids — the
sum-pool information case) and --model din (planted retrieval structure:
the ad id is copied from u_cat history; truncation physically drops the
matched evidence the attention unit needs).

CPU (default sizes, ~15 min/model):
  JAX_PLATFORMS=cpu python scripts/truncation_sweep.py --model esmm
Writes TRUNCATION.json cells keyed <model>_pad<P>.
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
    p.add_argument("--model", default="esmm", choices=["esmm", "din"])
    p.add_argument("--train_lines", type=int, default=40_000)
    p.add_argument("--valid_lines", type=int, default=20_000)
    p.add_argument("--feature_size", type=int, default=30_000)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--strength", type=float, default=36.0)
    p.add_argument("--match_strength", type=float, default=4.0)
    p.add_argument("--pads", default="16,64,256,1024,2048")
    p.add_argument("--len_scale", type=float, default=1.0)
    p.add_argument("--din_heavy_len", type=float, default=30.0,
                   help="avg u_cat (evidence field) length for the din "
                        "sweep; 30 IS the published u_cat average — the "
                        "containment signal does not cold-start at "
                        "hundreds of ids/row with no first-order id mass "
                        "(measured: flat ~2%% of ceiling at 254)")
    p.add_argument("--out", default="TRUNCATION.json")
    p.add_argument("--work_dir", default="")
    a = p.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import (
        PUBLISHED_MH_AVG_LENS,
        write_synthetic_aliccp,
    )
    from tf_repos_tpu.ops import metrics as M
    from tf_repos_tpu.train.harness import run_task

    lens = {k: max(v * a.len_scale, 1.0) for k, v in PUBLISHED_MH_AVG_LENS.items()}
    work = a.work_dir or tempfile.mkdtemp(prefix=f"trunc_{a.model}_")
    data = os.path.join(work, "data")
    os.makedirs(data, exist_ok=True)
    gen = dict(
        feature_size=a.feature_size, ctr=0.25, mh_avg_lens=lens,
        strength=a.strength,
    )
    if a.model == "din":
        # retrieval plant: the label hinges on containment of the ad id
        # in the u_cat history — exactly the evidence truncation drops.
        # Make u_cat ITSELF the published heavy field (avg 250): the
        # matched id sits at a uniform position in it, so a pad P keeps
        # ~E[min(P,L)/L] of the evidence and the AUC curve should rise
        # with P up to the length tail. The other fields stay light —
        # at the first attempt (all fields at published lengths) the
        # model never learned: the giant u_shop/u_brand noise fields
        # entering at large pads drowned the u_cat signal and every pad
        # sat at 3-9% of ceiling excess.
        lens = {"u_cat": a.din_heavy_len, "u_shop": 5.0, "u_brand": 5.0,
                "u_int": 5.0, "a_int": 5.0}
        gen.update(mh_avg_lens=lens, strength=a.strength / 3,
                   match_prob=0.5, match_strength=a.match_strength)
    print(f"generating {a.train_lines:,}+{a.valid_lines:,} lines at "
          f"published lengths (scale {a.len_scale}) ...", flush=True)
    write_synthetic_aliccp(os.path.join(data, "tr.samples.txt"),
                           a.train_lines, seed=0, **gen)
    write_synthetic_aliccp(os.path.join(data, "va.samples.txt"),
                           a.valid_lines, seed=1,
                           truth_path=os.path.join(work, "va.truth"), **gen)

    truth = np.loadtxt(os.path.join(work, "va.truth"))
    y, z, p_y, p_z = truth[:, 0], truth[:, 1], truth[:, 2], truth[:, 3]
    ceil = {
        "ctr": float(M.exact_auc(y, p_y)),
        "cvr": float(M.exact_auc(z, p_z)),
        "ctcvr": float(M.exact_auc(z, p_y * p_z)),
    }
    print("bayes ceilings (ALL ids):",
          json.dumps({k: round(v, 4) for k, v in ceil.items()}), flush=True)

    out = {}
    if os.path.exists(a.out):
        out = json.load(open(a.out))
    out.setdefault("_meta", {})[a.model] = {
        "ceilings": ceil, "train_lines": a.train_lines,
        "avg_lens": lens, "strength": gen["strength"],
        "epochs": a.epochs, "batch_size": a.batch_size,
    }
    for pad in [int(x) for x in a.pads.split(",")]:
        tag = f"{a.model}_pad{pad}"
        if tag in out:
            print(f"[skip] {tag}", flush=True)
            continue
        cfg = Config(
            model=a.model.upper(), feature_size=a.feature_size,
            field_size=11, embedding_size=16, deep_layers="128,64",
            attention_layers="128", dropout="1.0,1.0",
            batch_size=a.batch_size, num_epochs=a.epochs, log_steps=200,
            learning_rate=a.learning_rate, l2_reg=1e-6, optimizer="Adam",
            ctr_task_wgt=0.5, multi_hot_pad=pad,
            sparse_table_update=True, mh_coo=True,
            data_dir=data, model_dir=os.path.join(work, f"m{pad}"),
            dt_dir="x", eval_throttle_secs=0, clear_existing_model=True,
            write_metrics=False, seed=7,
        )
        m = run_task(cfg)
        cell = {"pad": pad}
        if a.model == "esmm":
            for k, mk in (("ctr", "CTR_AUC"), ("cvr", "CVR_AUC"),
                          ("ctcvr", "CTCVR_AUC")):
                got = float(m.get(mk, float("nan")))
                cell[mk] = round(got, 4)
                cell[f"{k}_pct_of_excess"] = round(
                    100 * (got - 0.5) / max(ceil[k] - 0.5, 1e-9), 1
                )
        else:
            got = float(m.get("auc", float("nan")))
            cell["auc"] = round(got, 4)
            cell["ctr_pct_of_excess"] = round(
                100 * (got - 0.5) / max(ceil["ctr"] - 0.5, 1e-9), 1
            )
        out[tag] = cell
        json.dump(out, open(a.out, "w"), indent=1)
        print(json.dumps({tag: cell}), flush=True)
    print("RESULT " + json.dumps(
        {k: v for k, v in out.items() if k.startswith(a.model)}), flush=True)


if __name__ == "__main__":
    main()
