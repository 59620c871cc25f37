"""Criteo-surrogate AUC parity protocol (VERDICT r1 item 1).

Runs the full reference flow on the statistics-faithful surrogate
(data/criteo_surrogate.py) and writes CRITEO_PARITY.md + .json:

  1. generate raw train.txt/test.txt at --train_lines (default 2M);
  2. preprocess with the quantile-equivalent cutoff (features/criteo.py,
     the reference's get_criteo_feature.py flow) and check the resulting
     feature_size against the published 117,581;
  3. compute the surrogate's Bayes ceiling (achievable by construction);
  4. train DeepFM and DCN with the reference's PUBLISHED hyperparameters
     (lr=5e-4, Adam, 1 epoch, deep 400,400,400, dropout 0.5 —
     deep_ctr/README.md:51) and with the TPU operating point, sweeping
     the LR x batch grid — the async-PS -> sync-SPMD convergence-delta
     study promised in SURVEY §7;
  5. acceptance: best AUC >= 99% of the Bayes ceiling, and the
     published-hyper run lands in the same band the reference reports
     for real Criteo (AUC = 0.8 +- 0.003 against a ~0.803 ceiling).

    python scripts/criteo_parity.py [--train_lines 2000000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(a) -> dict:
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data import criteo_surrogate as CS
    from tf_repos_tpu.features.criteo import preprocess
    from tf_repos_tpu.train.harness import run_task

    work = a.work_dir
    data = os.path.join(work, "raw")
    out = os.path.join(work, "proc")
    os.makedirs(data, exist_ok=True)
    results: dict = {"train_lines": a.train_lines}

    CS.configure(a.train_lines)

    t0 = time.time()
    raw_train = os.path.join(data, "train.txt")
    # done-markers, not file existence: a retry after a timeout/stall kill
    # must not accept a partially written train.txt or proc dir
    gen_done = os.path.join(data, ".gen_done")
    if not os.path.exists(gen_done):
        st = CS.generate_raw_sharded(
            raw_train, a.train_lines, seed=0, shards=a.shards,
            total_lines=a.train_lines,
        )
        CS.generate_raw_sharded(
            os.path.join(data, "test.txt"), a.test_lines, seed=1,
            shards=a.shards, total_lines=a.train_lines,
        )
        results["ctr"] = st["ctr"]
        with open(gen_done, "w") as f:
            f.write(json.dumps(st))
    print(f"[gen] {time.time() - t0:.0f}s")

    cutoff = CS.scaled_cutoff(a.train_lines)
    t0 = time.time()
    proc_done = os.path.join(out, ".proc_done")
    if not os.path.exists(proc_done):
        stats = preprocess(data, out, cutoff=cutoff, workers=a.workers)
        with open(proc_done, "w") as f:
            f.write(json.dumps({k: v for k, v in stats.items()
                                if isinstance(v, (int, float, str))}))
    else:
        fm = sum(1 for _ in open(os.path.join(out, "feature_map")))
        stats = {"feature_size": fm, "field_size": 39}
    feature_size = stats["feature_size"]
    results["cutoff"] = cutoff
    results["feature_size"] = feature_size
    results["feature_size_target"] = CS.FEATURE_SIZE_TARGET
    results["feature_size_delta_pct"] = round(
        100.0 * (feature_size - CS.FEATURE_SIZE_TARGET) / CS.FEATURE_SIZE_TARGET, 2
    )
    print(
        f"[preprocess] {time.time() - t0:.0f}s cutoff={cutoff} "
        f"feature_size={feature_size} ({results['feature_size_delta_pct']:+.1f}% vs 117,581)"
    )

    ceiling = CS.bayes_ceiling()
    results["bayes_ceiling"] = round(ceiling, 4)
    print(f"[ceiling] {ceiling:.4f}")

    # ---- training grid
    def train_once(model: str, lr: float, batch: int, epochs: int, tag: str,
                   sparse: bool = False):
        # per-cell memo: a tunnel-stall retry of a multi-cell invocation
        # must skip cells that already finished — re-entering a completed
        # cell with --resume would restore its final checkpoint and run
        # ANOTHER full data pass (wrong epoch count for published-hyper
        # cells, and hours wasted)
        memo = os.path.join(work, f"result_{tag}.json")
        if os.path.exists(memo):
            with open(memo) as f:
                rec = json.load(f)
            print(f"[train] memo hit: {rec}")
            return rec
        cfg = Config(
            model=model, feature_size=feature_size, field_size=39,
            embedding_size=a.embedding_size, deep_layers=a.deep_layers,
            dropout=a.dropout, batch_size=batch, num_epochs=epochs,
            log_steps=1000 if batch <= 512 else 200, learning_rate=lr,
            l2_reg=a.l2_reg, optimizer="Adam", data_dir=out,
            model_dir=os.path.join(work, f"model_{tag}"), dt_dir="p",
            eval_throttle_secs=0, clear_existing_model=not a.resume,
            # periodic saves let a tunnel-stall retry resume mid-epoch
            # instead of redoing the whole published-size cell
            save_checkpoints_steps=20_000 if a.resume else 0,
            cross_layers=3,
            # the axon tunnel costs ~0.4-0.6s fixed per dispatch; scan
            # K steps per dispatch so small-batch runs aren't RPC-bound
            steps_per_dispatch=256 if batch <= 512 else 8,
            # parse the multi-million-line surrogate once per work_dir
            packed_cache=True,
            # b16384 cell: lazy sparse Adam + Pallas VMEM kernels + bf16
            # towers (the 2.27M ex/s device configuration)
            sparse_table_update=sparse, pallas_expand=sparse,
            compute_dtype="bfloat16" if sparse else "float32",
        )
        t0 = time.time()
        m = run_task(cfg)
        wall = time.time() - t0
        rec = {
            "model": model, "lr": lr, "batch": batch, "epochs": epochs,
            "auc": round(m["auc"], 4), "loss": round(m["loss"], 5),
            "pct_of_ceiling": round(100.0 * m["auc"] / ceiling, 2),
            "wall_s": round(wall, 1), "tag": tag,
        }
        print(f"[train] {rec}")
        with open(memo, "w") as f:
            json.dump(rec, f)
        return rec

    cells = [c for c in a.cells.split(",") if c] if a.cells else None
    runs = []
    # the reference's published command line (deep_ctr/README.md:51)
    if cells is None or "ref_deepfm" in cells:
        runs.append(train_once("DeepFM", 5e-4, 256, 1, "ref_deepfm"))
    if cells is not None:
        if "ref_dcn" in cells:
            runs.append(train_once("DCN", 5e-4, 256, 1, "ref_dcn"))
        if "b4096" in cells:
            # the sync big-batch recipe that matched ref256 at 10M lines
            # (CRITEO_PARITY.md): scaled LR + heavier dropout, 2 epochs
            a.dropout = "0.8,0.8,0.8"
            runs.append(train_once("DeepFM", 2e-3, 4096, a.sweep_epochs, "b4096"))
        if "b16384" in cells:
            # the recipe that first crossed 99% of ceiling (found by
            # scripts/bench_e2e.py --sparse): B=16384, scaled LR, LIGHT
            # dropout, 1 epoch, lazy sparse Adam + Pallas VMEM kernels
            # (the reference's async-PS update semantics, accelerated)
            a.dropout = "0.9,0.9,0.9"
            runs.append(train_once(
                "DeepFM", 2e-3, 16384, 1, "b16384",
                sparse=True,
            ))
        # residual-root-cause diagnostics (published-size point plateaus
        # at ~98.85% of ceiling): e6 tests undertraining (3x the epochs),
        # emb32 tests capacity (2x the embedding width)
        if "b4096e6" in cells:
            a.dropout = "0.8,0.8,0.8"
            runs.append(train_once("DeepFM", 2e-3, 4096, 6, "b4096e6"))
        if "emb32" in cells:
            a.dropout = "0.8,0.8,0.8"
            a.embedding_size = 32
            runs.append(train_once("DeepFM", 2e-3, 4096, 2, "emb32"))
    elif not a.quick:
        runs.append(train_once("DCN", 5e-4, 256, 1, "ref_dcn"))
        # async-PS -> sync-SPMD delta study: LR x batch sweep
        for batch in (4096, 16384):
            for lr in (5e-4, 1e-3, 2e-3):
                runs.append(
                    train_once("DeepFM", lr, batch, a.sweep_epochs, f"s{batch}_{lr}")
                )
    results["runs"] = runs
    best = max(r["auc"] for r in runs)
    results["best_auc"] = best
    results["best_pct_of_ceiling"] = round(100.0 * best / ceiling, 2)
    results["pass_99pct"] = bool(best >= 0.99 * ceiling)

    # streaming-AUC (tf.metrics.auc 200-threshold semantics, what the
    # harness reports) vs exact Mann-Whitney AUC agreement on the last
    # trained model — the metric-fidelity leg of the protocol
    try:
        import jax
        import numpy as np_

        from tf_repos_tpu.data.libsvm import LibsvmDataset, glob_input_files
        from tf_repos_tpu.ops.metrics import exact_auc
        from tf_repos_tpu.train.harness import Harness

        last = runs[-1]
        cfg = Config(
            model=last["model"], feature_size=feature_size, field_size=39,
            embedding_size=a.embedding_size, deep_layers=a.deep_layers,
            dropout=a.dropout, batch_size=4096, optimizer="Adam",
            data_dir=out, model_dir=os.path.join(work, f"model_{last['tag']}"),
            dt_dir="p", cross_layers=3,
            # the checkpoint's opt-state layout must match the template
            # for Orbax restore (lazy sparse Adam != dense optax Adam)
            sparse_table_update=last["tag"] == "b16384",
        )
        h = Harness(cfg)
        from tf_repos_tpu.train.checkpoint import CheckpointManager

        ck = CheckpointManager(h.model_dir)
        ts = h.restore_or_init(ck)
        ck.close()
        from tf_repos_tpu.train.loop import build_predict_step

        pstep = build_predict_step(h.model)
        files = glob_input_files(out, "va*libsvm", shuffle=False, seed=0)
        preds, labels = [], []
        for batch in LibsvmDataset(files, field_size=39, batch_size=4096):
            p = np_.asarray(
                pstep(ts["params"], ts["mstate"], batch)["prob"]
            )
            m = batch["mask"] > 0
            preds.append(p[m])
            labels.append(np_.asarray(batch["label"])[m])
        pr = np_.concatenate(preds)
        lb = np_.concatenate(labels)
        ex = float(exact_auc(jax.numpy.asarray(lb), jax.numpy.asarray(pr)))
        results["exact_auc_last_run"] = round(ex, 5)
        results["streaming_auc_last_run"] = last["auc"]
        results["streaming_vs_exact_delta"] = round(abs(ex - last["auc"]), 5)
        print(
            f"[metric] streaming={last['auc']:.4f} exact={ex:.4f} "
            f"delta={abs(ex - last['auc']):.5f}"
        )
    except Exception as e:  # non-fatal leg
        results["metric_agreement_error"] = str(e)
    return results


def write_report(results: dict, path: str) -> None:
    lines = [
        "# Criteo-surrogate AUC parity (protocol: scripts/criteo_parity.py)",
        "",
        f"- surrogate: {results['train_lines']:,} lines, cutoff "
        f"{results['cutoff']} (quantile-equivalent to the reference's "
        f"cutoff=200 at 45.84M lines)",
        f"- feature_size: **{results['feature_size']:,}** vs published "
        f"117,581 ({results['feature_size_delta_pct']:+.1f}%)",
        f"- Bayes ceiling (achievable by construction): "
        f"**{results['bayes_ceiling']:.4f}** — calibrated to the "
        f"reference's published band (AUC=0.8±0.003, deep_ctr/README.md:38-45)",
        f"- best trained AUC: **{results['best_auc']:.4f}** = "
        f"{results['best_pct_of_ceiling']:.1f}% of ceiling "
        f"({'PASS' if results['pass_99pct'] else 'FAIL'} >=99% criterion)",
        "",
        "| model | lr | batch | epochs | AUC | % of ceiling | wall s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results["runs"]:
        lines.append(
            f"| {r['model']} | {r['lr']} | {r['batch']} | {r['epochs']} "
            f"| {r['auc']:.4f} | {r['pct_of_ceiling']:.1f}% | {r['wall_s']} |"
        )
    lines += [
        "",
        "The LR x batch sweep is the async-PS -> sync-SPMD convergence-delta",
        "study (SURVEY §7): the reference trained asynchronously at batch 256;",
        "the sync data-parallel path trains at large batch with scaled LR.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_lines", type=int, default=2_000_000)
    ap.add_argument("--test_lines", type=int, default=200_000)
    ap.add_argument("--work_dir", default="/tmp/criteo_parity")
    ap.add_argument("--deep_layers", default="400,400,400")
    ap.add_argument("--dropout", default="0.5,0.5,0.5")
    ap.add_argument("--embedding_size", type=int, default=16)
    ap.add_argument("--l2_reg", type=float, default=1e-5)
    ap.add_argument("--sweep_epochs", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shards", type=int, default=1, help="gen worker processes")
    ap.add_argument("--workers", type=int, default=1, help="preprocess workers")
    ap.add_argument(
        "--resume", action="store_true",
        help="keep model_dir + periodic checkpoints so a retry after a "
        "tunnel stall resumes the cell instead of restarting it. NOTE: "
        "the data stream restarts from the top on resume (reference "
        "Estimator semantics), so a resumed cell sees more than "
        "num_epochs passes — don't use it for published-hyper cells "
        "unless the deviation is documented",
    )
    ap.add_argument(
        "--cells", default="",
        help="comma list from {ref_deepfm,ref_dcn,b4096}: run only these "
        "training cells (the full sweep is too expensive at 45.84M lines)",
    )
    a = ap.parse_args(argv)
    results = run(a)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if a.cells:
        # cell-mode (e.g. the 45.84M published-size run) appends evidence
        # without clobbering the curated CRITEO_PARITY.md sweep report
        tag = f"{a.train_lines // 1_000_000}M"
        with open(os.path.join(repo, f"CRITEO_PARITY_{tag}.json"), "w") as f:
            json.dump(results, f, indent=1)
    else:
        with open(os.path.join(repo, "CRITEO_PARITY.json"), "w") as f:
            json.dump(results, f, indent=1)
        write_report(results, os.path.join(repo, "CRITEO_PARITY.md"))
    print(json.dumps({k: v for k, v in results.items() if k != "runs"}))


if __name__ == "__main__":
    main()
