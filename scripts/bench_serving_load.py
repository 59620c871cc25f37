"""Serving under CONCURRENT load (VERDICT r3 item 5).

scripts/bench_serving.py measures single-client latency vs batch size;
this bench drives the micro-batcher to saturation: C closed-loop clients
(each sends one request, waits, sends the next) per protocol

  rest     POST /v1/models/M:predict, columnar JSON instances
  grpc     native tensorflow.serving PredictionService/Predict
  example  POST with {"b64": <serialized tf.Example>} instances
           (the TF-Serving REST binary convention the C++ WDL client uses)

and reports, per offered concurrency: throughput (req/s), client p50/p99
latency, and the server-side micro-batch occupancy (mean instances per
scored batch, from /stats) — the knee is where occupancy growth stops
hiding queueing delay and p99 lifts off.

The reference's production curve is latency = 0.5256*ads + 15.449 ms
(deep_ctr/README.md:74-81) — a fit of its CPU TF-Serving under offered
ad-batch load; compare its shape against the `rest` rows (per-request
batch ~ `--per_req`).

Run: timeout 1200 python scripts/bench_serving_load.py [--duration 5]
CPU rig: JAX_PLATFORMS=cpu python scripts/bench_serving_load.py --small
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _ensure_servable(tmp: str, vocab: int, small: bool) -> str:
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data = os.path.join(tmp, "data")
    os.makedirs(data, exist_ok=True)
    write_synthetic_libsvm(os.path.join(data, "tr.libsvm"), 2000, vocab, seed=0)
    write_synthetic_libsvm(os.path.join(data, "va.libsvm"), 500, vocab, seed=1)
    cfg = Config(
        model="DeepFM", feature_size=vocab, field_size=39,
        embedding_size=4 if small else 16,
        deep_layers="8,4" if small else "256,128,64",
        dropout="1.0,1.0", batch_size=256, num_epochs=1, log_steps=5,
        data_dir=data, model_dir=os.path.join(tmp, "model"), dt_dir="bench",
        eval_throttle_secs=0, servable_model_dir=os.path.join(tmp, "servable"),
    )
    run_task(cfg)
    run_task(cfg.replace(task_type="export"))
    return cfg.servable_model_dir


def _client_loop(send, stop_at, lats, errs, sheds):
    while time.perf_counter() < stop_at:
        t0 = time.perf_counter()
        try:
            send()
            lats.append((time.perf_counter() - t0) * 1e3)
        except Exception as e:
            msg = str(e)
            if "429" in msg or "RESOURCE_EXHAUSTED" in msg or "backlog" in msg:
                sheds.append(1)  # shed: client should back off + retry
            else:
                errs.append(1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--servable_model_dir", default="")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--per_req", type=int, default=4,
                   help="instances per request (the reference's 'ads per "
                        "query' axis)")
    p.add_argument("--concurrency", default="1,2,4,8,16,32,64")
    p.add_argument("--protocols", default="rest,grpc,example")
    p.add_argument("--small", action="store_true")
    a = p.parse_args(argv)

    if a.small:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tf_repos_tpu.serve.grpc_server import GrpcPredictClient
    from tf_repos_tpu.serve.example_proto import encode_example
    from tf_repos_tpu.serve.server import PredictionServer

    vocab = 10_000 if a.small else 117_581
    tmp = tempfile.mkdtemp(prefix="bench_srv_load_")
    servable = a.servable_model_dir or _ensure_servable(tmp, vocab, a.small)
    srv = PredictionServer(servable, port=0, reload_secs=0, grpc_port=0)
    srv.start()
    model = srv.model_name
    url = f"http://127.0.0.1:{srv.port}/v1/models/{model}:predict"

    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab, (a.per_req, 39))
    vals = np.ones((a.per_req, 39), np.float32)

    insts = [
        {"feat_ids": [int(x) for x in ids[i]], "feat_vals": [1.0] * 39}
        for i in range(a.per_req)
    ]
    rest_body = json.dumps({"instances": insts}).encode()

    ex_insts = [
        {"b64": base64.b64encode(encode_example({
            "feat_ids": [int(x) for x in ids[i]], "feat_vals": [1.0] * 39,
        })).decode()}
        for i in range(a.per_req)
    ]
    ex_body = json.dumps({"instances": ex_insts}).encode()

    grpc_inputs = {"feat_ids": ids.astype(np.int64), "feat_vals": vals}

    def send_rest(body=rest_body):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert len(resp["predictions"]) == a.per_req

    def send_example():
        send_rest(ex_body)

    # ONE persistent channel per client thread (round-5 fix: the round-4
    # curve drove a fresh channel per request and measured the TCP+HTTP/2
    # handshake, ~113 req/s, not the server)
    _tls = threading.local()

    def send_grpc():
        c = getattr(_tls, "grpc", None)
        if c is None:
            c = _tls.grpc = GrpcPredictClient(
                "127.0.0.1", srv.grpc_port, model
            )
        out, _, _ = c.predict(grpc_inputs)
        assert out["prob"].shape[0] == a.per_req

    senders = {"rest": send_rest, "grpc": send_grpc, "example": send_example}
    protos = [s for s in a.protocols.split(",") if s]
    levels = [int(c) for c in a.concurrency.split(",")]
    results = {}
    for proto in protos:
        send = senders[proto]
        send()  # warm the compile/bucket caches outside timing
        for c in levels:
            lats, errs, sheds = [], [], []
            stop_at = time.perf_counter() + a.duration
            threads = [
                threading.Thread(
                    target=_client_loop, args=(send, stop_at, lats, errs, sheds)
                )
                for _ in range(c)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            stats = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stats", timeout=10
            ).read())
            lat = np.asarray(lats) if lats else np.asarray([float("nan")])
            cell = {
                "requests": len(lats),
                "errors": len(errs),
                "shed": len(sheds),
                "req_per_s": round(len(lats) / wall, 1),
                "examples_per_s": round(len(lats) * a.per_req / wall, 1),
                "p50_ms": round(float(np.median(lat)), 2),
                "p99_ms": round(float(np.percentile(lat, 99)), 2),
                "batch_occupancy_mean": stats.get("n", {}).get("mean", 1.0),
                "device_ms_p50": stats.get("device_ms", {}).get("p50"),
                "shed_total": stats.get("shed", 0),
            }
            results[f"{proto}_c{c}"] = cell
            print(json.dumps({f"{proto}_c{c}": cell}), flush=True)

    srv.stop()
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
