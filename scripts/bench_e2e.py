"""End-to-end headline measurement: the FULL CLI harness at the headline
operating point (DeepFM, B=16384, --packed_cache, bf16 towers,
static_fields=13) over a multi-million-line surrogate — loader + host
batching + device step + logging + checkpointing, not just the device
step (bench.py measures that at ~1.6M ex/s).

Two numbers come out, matching PERF.md's input-pipeline story:
  - cold epoch (cache build): parse-bound
  - warm epoch (memmap cache hit): device-bound
Sustained rate = median of the per-log-window examples_per_sec entries
in metrics.jsonl (the first windows carry compile + cache-build cost).

    python scripts/bench_e2e.py --data_dir /tmp/criteo45m/proc \
        --feature_size <N> [--epochs 1]

Writes one JSON line; reference analog: the reference never publishes a
training throughput (its only per-example number is the 0.5256
ms/example serving forward, deep_ctr/README.md:78-81).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--feature_size", type=int, required=True)
    ap.add_argument("--model_dir", default="/tmp/bench_e2e_model")
    ap.add_argument("--batch_size", type=int, default=0, help="0 = per-model default")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps_per_dispatch", type=int, default=8)
    ap.add_argument(
        "--model", default="deepfm", choices=["deepfm", "esmm", "din"],
        help="esmm = the large-vocab Ali-CCP cell (expects tr.samples.txt "
        "in --data_dir; DeepMTL's '20 GB, very slow' pain point); "
        "din = the attention-pooling counterpart (round 5: the "
        "sorted-window segment kernels ride --pallas_expand + --mh_coo)",
    )
    ap.add_argument("--multi_hot_pad", type=int, default=16)
    ap.add_argument(
        "--sparse", action="store_true",
        help="sparse_table_update + pallas_expand (the 2.27M ex/s "
        "device-step configuration; bench.py measures its device side)",
    )
    ap.add_argument(
        "--no_pallas", action="store_true",
        help="with --sparse: keep the XLA inner lookup (the round-2 "
        "ESMM baseline configuration)",
    )
    ap.add_argument(
        "--mh_coo", action="store_true",
        help="COO multi-hot pack (--mh_coo): device pooling cost "
        "proportional to live ids, not multi_hot_pad",
    )
    ap.add_argument(
        "--mh_bucket", default="off",
        help="host pow2 live-width slicing of the padded multi-hot "
        "fields (--mh_bucket): pad-independent step for the padded "
        "paths; composes with --mh_coo (smaller host pack input)",
    )
    ap.add_argument(
        "--map_workers", type=int, default=1,
        help="host map-chain thread pool size (--map_workers)",
    )
    ap.add_argument(
        "--fused_table", action="store_true",
        help="[V,3K] w|m|v fused storage (--fused_table; Adam only)",
    )
    ap.add_argument(
        "--dma", action="store_true",
        help="--dma_scatter: lane-padded f32 w|m|v + per-row DMA "
        "write-back (implies --fused_table, forces f32 tables)",
    )
    ap.add_argument(
        "--catchup", action="store_true",
        help="--sparse_catchup per-row Adam moment catch-up",
    )
    ap.add_argument(
        "--sparse_pad_mode", default="pow2",
        help="uids bucket sizing (pow2 / pow2:<floor> / max) — floors "
        "skip the recompile ladder",
    )
    ap.add_argument(
        "--mh_coo_floor", type=int, default=0,
        help="pre-size the COO M bucket (skips its quarter-pow2 ladder; "
        "each ladder step recompiles the scan program)",
    )
    ap.add_argument(
        "--no_combine", action="store_true",
        help="disable --mh_coo_combine (A/B: the host duplicate-(row,id) "
        "weight combine is default-on for sum-combiner models)",
    )
    ap.add_argument(
        "--slim", action="store_true",
        help="--slim_transfer wire format (data/slim_wire.py): halves "
        "host->device input bytes; the lever when the input link (PCIe "
        "or the dev tunnel) is the end-to-end bound",
    )
    a = ap.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.harness import run_task

    if a.model in ("esmm", "din"):
        cfg = Config(
            model="ESMM" if a.model == "esmm" else "DIN",
            attention_layers="256",
            attention_pooling=a.model == "din",
            feature_size=a.feature_size, field_size=11,
            embedding_size=16, deep_layers="256,128,64", dropout="0.9,0.9,0.9",
            batch_size=a.batch_size or 4096, num_epochs=a.epochs, log_steps=50,
            learning_rate=5e-4, l2_reg=1e-5, optimizer="Adam",
            data_dir=a.data_dir, model_dir=a.model_dir, dt_dir="e2e",
            eval_throttle_secs=0, clear_existing_model=True,
            compute_dtype="bfloat16", multi_hot_pad=a.multi_hot_pad,
            steps_per_dispatch=a.steps_per_dispatch, packed_cache=True,
            sparse_table_update=a.sparse,
            pallas_expand=a.sparse and not a.no_pallas,
            fused_moments=a.sparse and not (a.fused_table or a.dma),
            fused_table=a.fused_table or a.dma, dma_scatter=a.dma,
            sparse_catchup=a.catchup,
            mh_coo=a.mh_coo, slim_transfer=a.slim,
            mh_coo_combine=not a.no_combine,
            mh_coo_floor=a.mh_coo_floor, sparse_pad_mode=a.sparse_pad_mode,
            mh_bucket=a.mh_bucket, map_workers=a.map_workers,
            param_dtype=(
                "float32" if a.dma
                else ("bfloat16" if a.sparse else "float32")
            ),
        )
    else:
        cfg = Config(
            model="DeepFM", feature_size=a.feature_size, field_size=39,
            embedding_size=16, deep_layers="256,128,64", dropout="0.9,0.9,0.9",
            batch_size=a.batch_size or 16384, num_epochs=a.epochs, log_steps=50,
            learning_rate=2e-3, l2_reg=1e-5, optimizer="Adam",
            data_dir=a.data_dir, model_dir=a.model_dir, dt_dir="e2e",
            eval_throttle_secs=0, clear_existing_model=True,
            compute_dtype="bfloat16", static_fields=13,
            steps_per_dispatch=a.steps_per_dispatch, packed_cache=True,
            sparse_table_update=a.sparse, pallas_expand=a.sparse,
            slim_transfer=a.slim,
        )
    t0 = time.time()
    m = run_task(cfg)
    wall = time.time() - t0

    rates = []
    mdir = cfg.resolved_model_dir if hasattr(cfg, "resolved_model_dir") else None
    # metrics.jsonl lives in the resolved model dir (model_dir + dt_dir)
    import glob as g

    for path in g.glob(os.path.join(a.model_dir + "*", "metrics.jsonl")) + g.glob(
        os.path.join(a.model_dir, "**", "metrics.jsonl"), recursive=True
    ):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "examples_per_sec" in rec:
                    rates.append(rec["examples_per_sec"])
    # steady-state: drop the first half of the windows (compile + cache
    # build dominate them; short runs have ~5 windows total, so a plain
    # median under-reports the sustained rate by up to 2x)
    steady = rates[len(rates) // 2 :]
    out = {
        "metric": f"{a.model}_e2e_cli_examples_per_sec",
        "value": round(statistics.median(rates), 1) if rates else None,
        "steady": round(statistics.median(steady), 1) if steady else None,
        "unit": "examples/sec",
        "windows": len(rates),
        "p90": round(sorted(rates)[int(0.9 * (len(rates) - 1))], 1) if rates else None,
        "wall_s": round(wall, 1),
        "auc": round(m.get("auc", m.get("CTCVR_AUC", float("nan"))), 4),
        "batch": cfg.batch_size,
        "epochs": a.epochs,
        "flags": {k: getattr(a, k) for k in
                  ("sparse", "no_pallas", "mh_coo", "slim", "multi_hot_pad",
                   "mh_bucket", "map_workers", "fused_table", "dma",
                   "catchup")},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
