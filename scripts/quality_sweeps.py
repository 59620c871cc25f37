"""Quality sweeps for the two round-2 VERDICT quality gaps:

  slim_pairs    (item 6) replicate the --slim_transfer "equal final
                quality" claim: paired seeds, dense-wire vs slim-wire
                final AUC at 2M lines (6 epochs) plus one 10M cell —
                the wire codec is mathematically exact, so the deltas
                bound TRAJECTORY noise (different XLA program, same
                math), not a codec bias.
  sparse_epochs (item 7) bound the lazy-sparse optimizer-semantics
                band: dense vs touched-rows-only Adam final AUC at
                1/2/4/6 epochs of the 2M surrogate (lazy rows ARE
                different Adam semantics — untouched rows keep stale
                moments — and the effect compounds with epochs).
                Round 5 adds a third variant per epoch count:
                sparse + --sparse_catchup (per-row beta^delta moment
                decay on touch, train/sparse.py) — the VERDICT r4
                item-2 fix whose job is |AUC - dense| <= 0.001 at 4
                and 6 epochs.

Operating point = the bench_e2e.py headline cell (DeepFM, B=16384,
lr 2e-3, dropout 0.9, bf16 towers, static_fields=13, packed_cache).
Results append incrementally to QUALITY_SWEEPS.json (a stalled tunnel
loses at most one cell).

    python scripts/quality_sweeps.py --mode slim_pairs --data_dir /tmp/zoo_r3/proc --feature_size <N>
    python scripts/quality_sweeps.py --mode sparse_epochs --data_dir /tmp/zoo_r3/proc --feature_size <N>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JSON_PATH = os.path.join(REPO, "QUALITY_SWEEPS.json")


def run_cell(data_dir, feature_size, model_dir, *, seed, epochs, slim, sparse,
             catchup=False):
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.harness import run_task

    cfg = Config(
        model="DeepFM", feature_size=feature_size, field_size=39,
        embedding_size=16, deep_layers="256,128,64", dropout="0.9,0.9,0.9",
        batch_size=16384, num_epochs=epochs, log_steps=200,
        learning_rate=2e-3, l2_reg=1e-5, optimizer="Adam",
        data_dir=data_dir, model_dir=model_dir, dt_dir="q",
        eval_throttle_secs=0, clear_existing_model=True, seed=seed,
        compute_dtype="bfloat16", static_fields=13, packed_cache=True,
        steps_per_dispatch=8, slim_transfer=slim,
        sparse_table_update=sparse, pallas_expand=sparse,
        sparse_catchup=catchup,
    )
    t0 = time.time()
    m = run_task(cfg)
    return {"auc": round(m["auc"], 5), "loss": round(m["loss"], 5),
            "wall_s": round(time.time() - t0, 1)}


def load():
    if os.path.exists(JSON_PATH):
        return json.load(open(JSON_PATH))
    return {}


def save(res):
    json.dump(res, open(JSON_PATH, "w"), indent=1)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", required=True, choices=["slim_pairs", "sparse_epochs"])
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--feature_size", type=int, required=True)
    ap.add_argument("--tag", default="2m", help="dataset tag in the JSON (2m/10m)")
    ap.add_argument("--seeds", default="7,17,27")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--work_dir", default="/tmp/quality_sweeps")
    a = ap.parse_args(argv)

    res = load()
    section = res.setdefault(a.mode, {})

    if a.mode == "slim_pairs":
        for seed in [int(s) for s in a.seeds.split(",") if s]:
            for slim in (False, True):
                key = f"{a.tag}_seed{seed}_{'slim' if slim else 'dense'}"
                if key in section:
                    print(f"[skip] {key}")
                    continue
                cell = run_cell(
                    a.data_dir, a.feature_size,
                    os.path.join(a.work_dir, key),
                    seed=seed, epochs=a.epochs, slim=slim, sparse=False,
                )
                section[key] = cell
                save(res)
                print(f"[cell] {key}: {cell}")
        # paired deltas
        deltas = []
        for seed in [int(s) for s in a.seeds.split(",") if s]:
            d = section.get(f"{a.tag}_seed{seed}_dense")
            s = section.get(f"{a.tag}_seed{seed}_slim")
            if d and s:
                deltas.append(round(s["auc"] - d["auc"], 5))
        print("SLIM_DELTAS " + json.dumps({a.tag: deltas}))

    else:  # sparse_epochs
        variants = (
            ("dense", dict(sparse=False)),
            ("sparse", dict(sparse=True)),
            ("catchup", dict(sparse=True, catchup=True)),
        )
        for epochs in (1, 2, 4, 6):
            for vname, kw in variants:
                key = f"{a.tag}_ep{epochs}_{vname}"
                if key in section:
                    print(f"[skip] {key}")
                    continue
                cell = run_cell(
                    a.data_dir, a.feature_size,
                    os.path.join(a.work_dir, key),
                    seed=7, epochs=epochs, slim=False, **kw,
                )
                section[key] = cell
                save(res)
                print(f"[cell] {key}: {cell}")
        band = {}
        for epochs in (1, 2, 4, 6):
            d = section.get(f"{a.tag}_ep{epochs}_dense")
            s = section.get(f"{a.tag}_ep{epochs}_sparse")
            c = section.get(f"{a.tag}_ep{epochs}_catchup")
            if d and s:
                band[epochs] = {
                    "sparse": round(s["auc"] - d["auc"], 5),
                    **(
                        {"catchup": round(c["auc"] - d["auc"], 5)}
                        if c
                        else {}
                    ),
                }
        print("SPARSE_BAND " + json.dumps(band))


if __name__ == "__main__":
    main()
