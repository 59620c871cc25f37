"""Serving latency benchmark — the reference's headline serving numbers
are ~15 ms fixed overhead + ~0.5 ms/example (TF Serving on CPU,
deep_ctr/README.md:78-81, fit latency = 0.5256*ads + 15.449). This
script measures the same quantity against a live PredictionServer over
HTTP (end-to-end: request parse + micro-batch + TPU forward + reply) and
fits latency = a*batch + b.

    python scripts/bench_serving.py [--servable_model_dir D] [--port P]

With no serving dir, it trains/export a small DeepFM first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_servable(tmp: str) -> str:
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data = os.path.join(tmp, "data")
    os.makedirs(data, exist_ok=True)
    write_synthetic_libsvm(os.path.join(data, "tr.libsvm"), 2000, 117_581, seed=0)
    write_synthetic_libsvm(os.path.join(data, "va.libsvm"), 500, 117_581, seed=1)
    cfg = Config(
        model="DeepFM", feature_size=117_581, field_size=39, embedding_size=16,
        deep_layers="256,128,64", dropout="1.0,1.0,1.0", batch_size=256,
        num_epochs=1, log_steps=5, data_dir=data,
        model_dir=os.path.join(tmp, "model"), dt_dir="bench",
        eval_throttle_secs=0, servable_model_dir=os.path.join(tmp, "servable"),
    )
    run_task(cfg)
    run_task(cfg.replace(task_type="export"))
    return cfg.servable_model_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--servable_model_dir", default="")
    p.add_argument("--repeats", type=int, default=30)
    a = p.parse_args(argv)

    from tf_repos_tpu.serve.server import PredictionServer

    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    servable = a.servable_model_dir or _ensure_servable(tmp)
    srv = PredictionServer(servable, port=0, reload_secs=0, max_wait_ms=0.5)
    srv.start()
    model = srv.model_name
    url = f"http://127.0.0.1:{srv.port}/v1/models/{model}:predict"

    rng = np.random.default_rng(0)
    results = {}
    for n in (1, 4, 16, 64, 256):
        insts = [
            {
                "feat_ids": [int(x) for x in rng.integers(1, 117_581, 39)],
                "feat_vals": [1.0] * 39,
            }
            for _ in range(n)
        ]
        body = json.dumps({"instances": insts}).encode()
        lat = []
        for _ in range(a.repeats + 3):
            t0 = time.perf_counter()
            req = urllib.request.Request(url, data=body, headers={"Content-Type": "application/json"})
            resp = json.loads(urllib.request.urlopen(req, timeout=60).read())
            lat.append((time.perf_counter() - t0) * 1e3)
        assert len(resp["predictions"]) == n
        lat = np.asarray(lat[3:])  # drop warmups
        results[n] = (float(np.median(lat)), float(np.percentile(lat, 99)))
        print(f"batch={n:4d}  p50={results[n][0]:7.2f} ms  p99={results[n][1]:7.2f} ms")

    ns = np.asarray(sorted(results))
    p50s = np.asarray([results[n][0] for n in ns])
    slope, intercept = np.polyfit(ns, p50s, 1)
    print(
        f"fit: latency = {slope:.4f}*batch + {intercept:.3f} ms "
        f"(reference: 0.5256*batch + 15.449 ms, deep_ctr/README.md:78-81)"
    )

    # ---- server-side decomposition (VERDICT r1 item 10): where does the
    # fixed cost live? batchify (host array assembly) vs the device leg
    # (dispatch + execute + sync — includes the axon tunnel round trip on
    # this rig). colocated_fixed_est removes the tunnel: it is what the
    # fixed cost would be with the server on the TPU host.
    stats = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=10
        ).read()
    )
    device_p50 = stats.get("device_ms", {}).get("p50", 0.0)
    batchify_p50 = stats.get("batchify_ms", {}).get("p50", 0.0)
    http_overhead = max(float(intercept) - device_p50 - batchify_p50, 0.0)
    # measure the bare device round trip (empty sync) to isolate the tunnel
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(())
    float(x)
    t = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(x + 1.0)
        t.append((time.perf_counter() - t0) * 1e3)
    tunnel_ms = float(np.median(t))
    colocated_fixed = max(float(intercept) - tunnel_ms, 0.0)
    print(
        f"decomposition: batchify={batchify_p50:.2f} device={device_p50:.2f} "
        f"http~={http_overhead:.2f} bare_device_sync={tunnel_ms:.2f} ms\n"
        f"colocated fixed estimate = {colocated_fixed:.2f} ms "
        f"(total fixed {intercept:.2f} minus the measured tunnel round trip)"
    )
    print(
        json.dumps(
            {
                "metric": "serving_latency_fit",
                "ms_per_example": round(float(slope), 4),
                "ms_fixed": round(float(intercept), 3),
                "ms_fixed_colocated_est": round(colocated_fixed, 3),
                "server_device_ms_p50": round(device_p50, 3),
                "server_batchify_ms_p50": round(batchify_p50, 3),
                "bare_device_sync_ms": round(tunnel_ms, 3),
                "vs_baseline_per_example": round(0.5256 / max(float(slope), 1e-6), 1),
                "vs_baseline_fixed": round(15.449 / max(float(intercept), 1e-6), 1),
                "vs_baseline_fixed_colocated": round(
                    15.449 / max(colocated_fixed, 1e-6), 1
                ),
            }
        )
    )
    srv.stop()


if __name__ == "__main__":
    main()
