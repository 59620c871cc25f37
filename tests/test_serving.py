"""Serving tests: export -> scorer buckets -> hot reload -> HTTP server
micro-batching -> C++ client end-to-end (SURVEY §2.4 parity)."""

import json
import os
import shutil
import subprocess
import threading
import time
import urllib.request

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
from tf_repos_tpu.serve.scorer import Scorer
from tf_repos_tpu.serve.server import MicroBatcher, PredictionServer
from tf_repos_tpu.train.harness import Harness, run_task

CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tf_repos_tpu", "serve", "cpp",
)


@pytest.fixture(scope="module")
def servable(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving")
    data = tmp / "data"
    data.mkdir()
    write_synthetic_libsvm(str(data / "tr.libsvm"), 96, feature_size=300, seed=0)
    write_synthetic_libsvm(str(data / "va.libsvm"), 48, feature_size=300, seed=1)
    cfg = Config(
        model="DeepFM", feature_size=300, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, data_dir=str(data), model_dir=str(tmp / "model"),
        dt_dir="20260101", eval_throttle_secs=0,
        servable_model_dir=str(tmp / "servable"),
    )
    run_task(cfg)
    run_task(cfg.replace(task_type="export"))
    return cfg


def _instances(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "feat_ids": rng.integers(1, cfg.feature_size, size=(cfg.field_size,)).astype(np.int32),
            "feat_vals": np.ones((cfg.field_size,), np.float32),
        }
        for _ in range(n)
    ]


def test_scorer_buckets_and_padding(servable):
    s = Scorer(servable.servable_model_dir, batch_buckets=(1, 8, 64), warmup=False)
    for n in (1, 3, 8, 20, 64, 100):
        out = s.score(_instances(servable, n))
        assert out["prob"].shape == (n,)
        assert np.all((out["prob"] >= 0) & (out["prob"] <= 1))
    # padding must not affect real rows: same instance alone vs in a batch
    one = s.score(_instances(servable, 1, seed=7))["prob"]
    many = s.score(_instances(servable, 1, seed=7) + _instances(servable, 5))["prob"]
    np.testing.assert_allclose(one[0], many[0], rtol=1e-6)


def test_scorer_hot_reload(servable):
    s = Scorer(servable.servable_model_dir, batch_buckets=(8,), warmup=False)
    assert not s.maybe_reload()
    v0 = s.version
    time.sleep(1.1)  # version dirs are unix-timestamp named
    h = Harness(servable.replace(task_type="export"))
    h.export()
    assert s.maybe_reload()
    assert s.version != v0
    assert s.score(_instances(servable, 2))["prob"].shape == (2,)


def test_micro_batcher_coalesces(servable):
    s = Scorer(servable.servable_model_dir, batch_buckets=(64,), warmup=False)
    mb = MicroBatcher(s, max_batch=64, max_wait_ms=20)
    results = {}

    def call(i):
        results[i] = mb.submit(_instances(servable, 2, seed=i))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.stop()
    for i in range(8):
        assert results[i]["prob"].shape == (2,)


@pytest.fixture(scope="module")
def server(servable):
    srv = PredictionServer(servable.servable_model_dir, port=0, reload_secs=0)
    srv.start()
    yield srv
    srv.stop()


def test_http_predict_roundtrip(servable, server):
    inst = [
        {
            "feat_ids": [int(x) for x in i["feat_ids"]],
            "feat_vals": [float(x) for x in i["feat_vals"]],
        }
        for i in _instances(servable, 3)
    ]
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/models/DeepFM:predict",
        data=json.dumps({"instances": inst}).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=30).read())
    assert len(resp["predictions"]) == 3
    assert all(0.0 <= p <= 1.0 for p in resp["predictions"])
    status = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v1/models/DeepFM", timeout=10
        ).read()
    )
    assert status["model_version_status"][0]["state"] == "AVAILABLE"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_cpp_client_end_to_end(servable, server, tmp_path):
    build = tmp_path / "cppbuild"
    shutil.copytree(CPP_DIR, build)
    subprocess.run(["make", "-s"], cwd=build, check=True, timeout=120)
    out = subprocess.run(
        [str(build / "ctr_client"), "127.0.0.1", str(server.port), "DeepFM", "39"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "AVAILABLE" in out.stdout
    pline = [l for l in out.stdout.splitlines() if l.startswith("pctr = ")]
    assert len(pline) == 1
    p = float(pline[0].split("=")[1])
    assert 0.0 <= p <= 1.0


def test_scorer_matches_harness_infer(servable, tmp_path):
    """The servable path (export -> scorer) must score identically to the
    checkpoint path (harness infer) — the export/serving parity the
    reference gets from SavedModel."""
    import glob as _g

    from tf_repos_tpu.data.libsvm import LibsvmDataset

    if not _g.glob(servable.data_dir + "/te*"):
        shutil.copy(servable.data_dir + "/va.libsvm", servable.data_dir + "/te.libsvm")
    h = Harness(servable)
    out_path = h.infer(out_path=str(tmp_path / "pred.txt"))
    infer_preds = np.asarray([float(x) for x in open(out_path).read().split()])

    s = Scorer(servable.servable_model_dir, batch_buckets=(64,), warmup=False)
    ds = LibsvmDataset(
        sorted(_g.glob(servable.data_dir + "/te*")), field_size=39, batch_size=64
    )
    scored = []
    for b in ds:
        inst = [
            {"feat_ids": b["feat_ids"][i], "feat_vals": b["feat_vals"][i]}
            for i in range(len(b["label"]))
            if b["mask"][i] > 0
        ]
        scored.append(s.score(inst)["prob"])
    scored = np.concatenate(scored)
    assert len(scored) == len(infer_preds)
    np.testing.assert_allclose(scored, infer_preds, rtol=1e-4, atol=1e-5)


def test_esmm_export_and_scoring(tmp_path):
    """Aliccp-signature export + scoring end-to-end (the reference's ESMM
    export branch is 'Not Implemented', DeepCvrMTL.py:383-384 — ours works)."""
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch, write_synthetic_aliccp

    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_aliccp(str(d / "tr.samples.txt"), 96, feature_size=600, seed=0)
    write_synthetic_aliccp(str(d / "va.samples.txt"), 48, feature_size=600, seed=1)
    cfg = Config(
        model="esmm", feature_size=600, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=16, num_epochs=1,
        log_steps=5, data_dir=str(d), model_dir=str(tmp_path / "m"),
        dt_dir="e", eval_throttle_secs=0, multi_hot_pad=8,
        servable_model_dir=str(tmp_path / "servable"),
    )
    run_task(cfg)
    run_task(cfg.replace(task_type="export"))
    s = Scorer(str(tmp_path / "servable"), batch_buckets=(8,), warmup=True)
    batch = synthetic_aliccp_batch(np.random.default_rng(3), 5, 600, 11, 8)
    inst = [
        {k: v[i] for k, v in batch.items() if k not in ("y", "z", "label", "mask")}
        for i in range(5)
    ]
    out = s.score(inst)
    assert set(out) == {"pctcvr", "pctr", "pcvr"}
    np.testing.assert_allclose(
        out["pctcvr"], out["pctr"] * out["pcvr"], rtol=1e-5
    )


# ------------------------------------------------- example-proto signature
@pytest.fixture(scope="module")
def wd_servable(tmp_path_factory):
    """WideDeep servable — the model behind the reference's parsing
    (tf.Example) serving signature."""
    from tf_repos_tpu.data.synthetic import write_synthetic_csv

    tmp = tmp_path_factory.mktemp("wd_serving")
    data = tmp / "data"
    data.mkdir()
    write_synthetic_csv(str(data / "tr.csv"), 96, seed=0)
    write_synthetic_csv(str(data / "va.csv"), 48, seed=1)
    cfg = Config(
        model="WideDeep", feature_size=0, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, data_dir=str(data), model_dir=str(tmp / "model"),
        dt_dir="20260101", eval_throttle_secs=0,
        servable_model_dir=str(tmp / "servable"),
    )
    run_task(cfg)
    run_task(cfg.replace(task_type="export"))
    return cfg


def test_example_proto_roundtrip():
    from tf_repos_tpu.serve.example_proto import decode_example, encode_example

    feats = {
        "I1": [0.5], "I2": [1.25, -3.5],
        "C1": [123], "C2": [0, -1, 2**40],
        "raw": [b"ab", b""],
    }
    out = decode_example(encode_example(feats))
    np.testing.assert_allclose(out["I1"], [0.5])
    np.testing.assert_allclose(out["I2"], [1.25, -3.5])
    np.testing.assert_array_equal(out["C1"], [123])
    np.testing.assert_array_equal(out["C2"], [0, -1, 2**40])
    assert list(out["raw"]) == [b"ab", b""]


def test_example_signature_server_and_cpp_client(wd_servable, tmp_path):
    """The parsing-signature path end-to-end: serialized tf.Example rows
    through {"b64": ...} REST instances score identically to raw
    cont/cat instances — from Python and from the compiled C++ client."""
    import base64

    from tf_repos_tpu.serve.example_proto import encode_example

    srv = PredictionServer(wd_servable.servable_model_dir, port=0, reload_secs=0)
    srv.start()
    try:
        rng = np.random.default_rng(0)
        cont = rng.random((3, 13)).astype(np.float32)
        cat = rng.integers(0, 100, size=(3, 26)).astype(np.int64)
        url = f"http://127.0.0.1:{srv.port}/v1/models/wide_n_deep:predict"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            return json.loads(urllib.request.urlopen(req, timeout=30).read())

        raw = post({
            "instances": [
                {"cont": cont[i].tolist(), "cat": cat[i].tolist()}
                for i in range(3)
            ]
        })
        ex_instances = []
        for i in range(3):
            feats = {f"I{j+1}": [float(cont[i, j])] for j in range(13)}
            feats.update({f"C{j+1}": [int(cat[i, j])] for j in range(26)})
            ex_instances.append(
                {"b64": base64.b64encode(encode_example(feats)).decode()}
            )
        via_example = post({"instances": ex_instances})
        np.testing.assert_allclose(
            via_example["predictions"], raw["predictions"], rtol=1e-5
        )

        if shutil.which("g++"):
            build = tmp_path / "cppbuild_ex"
            shutil.copytree(CPP_DIR, build)
            subprocess.run(["make", "-s"], cwd=build, check=True, timeout=120)
            out = subprocess.run(
                [str(build / "ctr_client"), "127.0.0.1", str(srv.port),
                 "wide_n_deep", "example"],
                capture_output=True, text=True, timeout=60,
            )
            assert out.returncode == 0, out.stderr
            pline = [l for l in out.stdout.splitlines() if l.startswith("pctr = ")]
            assert len(pline) == 1
            # must equal the same probe scored through the raw columnar path
            probe = post({
                "instances": [{"cont": [0.5] * 13,
                               "cat": list(range(1, 27))}]
            })
            assert abs(float(pline[0].split("=")[1]) - probe["predictions"][0]) < 1e-4
    finally:
        srv.stop()


# ------------------------------------------------------------ gRPC transport
def test_predict_proto_codec_roundtrip():
    """Hand-rolled TF-Serving Predict proto codec (serve/predict_proto.py):
    request and response survive encode->decode bit-exactly in values."""
    from tf_repos_tpu.serve import predict_proto as PP

    ids = np.arange(78, dtype=np.int64).reshape(2, 39)
    vals = np.linspace(0, 1, 78, dtype=np.float32).reshape(2, 39)
    req = PP.encode_predict_request(
        {"feat_ids": ids, "feat_vals": vals}, "DeepFM", "serving_default"
    )
    inputs, name, sig = PP.decode_predict_request(req)
    assert name == "DeepFM" and sig == "serving_default"
    np.testing.assert_array_equal(inputs["feat_ids"], ids)
    np.testing.assert_allclose(inputs["feat_vals"], vals)

    out = {"prob": np.asarray([0.25, 0.75], np.float32)}
    resp = PP.encode_predict_response(out, "DeepFM", version=1700000000)
    outputs, name2, version = PP.decode_predict_response(resp)
    assert name2 == "DeepFM" and version == 1700000000
    np.testing.assert_allclose(outputs["prob"], out["prob"])

    # negative int64 round-trips (proto two's-complement varint)
    neg = PP.decode_tensor(PP.encode_tensor(np.asarray([[-5, 3]], np.int64)))
    np.testing.assert_array_equal(neg, [[-5, 3]])


@pytest.fixture(scope="module")
def grpc_server(servable):
    srv = PredictionServer(
        servable.servable_model_dir, port=0, reload_secs=0, grpc_port=0
    )
    srv.start()
    yield srv
    srv.stop()


def test_grpc_predict_roundtrip(servable, grpc_server):
    """Native gRPC PredictionService/Predict (the reference's transport,
    deep_fm_serving_client.cpp:69) against a stock grpcio channel with
    raw-bytes (de)serializers — wire format is the real TF-Serving one."""
    from tf_repos_tpu.serve.grpc_server import grpc_predict

    inst = _instances(servable, 3, seed=11)
    inputs = {
        "feat_ids": np.stack([i["feat_ids"] for i in inst]).astype(np.int64),
        "feat_vals": np.stack([i["feat_vals"] for i in inst]),
    }
    outputs, name, version = grpc_predict(
        "127.0.0.1", grpc_server.grpc_port, inputs, "DeepFM"
    )
    assert name == "DeepFM" and version == int(grpc_server.scorer.version)
    assert outputs["prob"].shape == (3,)
    # transport parity: same instances through HTTP REST
    rest = grpc_server.batcher.submit(inst)
    np.testing.assert_allclose(outputs["prob"], rest["prob"], rtol=1e-6)


def test_grpc_predict_wrong_model_name(servable, grpc_server):
    import grpc

    from tf_repos_tpu.serve.grpc_server import grpc_predict

    with pytest.raises(grpc.RpcError) as e:
        grpc_predict(
            "127.0.0.1", grpc_server.grpc_port,
            {"feat_ids": np.zeros((1, 39), np.int64),
             "feat_vals": np.zeros((1, 39), np.float32)},
            "NoSuchModel",
        )
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_grpc_example_string_tensor(wd_servable):
    """The wide_n_deep parsing signature over gRPC: a DT_STRING tensor of
    serialized tf.Examples (wide_n_deep_serving_client.cpp:52-62)."""
    from tf_repos_tpu.serve.example_proto import encode_example
    from tf_repos_tpu.serve.grpc_server import grpc_predict

    srv = PredictionServer(
        wd_servable.servable_model_dir, port=0, reload_secs=0, grpc_port=0
    )
    srv.start()
    try:
        feats = {f"I{i}": [0.5] for i in range(1, 14)}
        feats.update({f"C{i}": [i] for i in range(1, 27)})
        ex = encode_example(feats)
        outputs, _, _ = grpc_predict(
            "127.0.0.1", srv.grpc_port,
            {"inputs": np.asarray([ex], object)},
            srv.model_name,
        )
        assert outputs["prob"].shape == (1,)
        assert 0.0 <= float(outputs["prob"][0]) <= 1.0
    finally:
        srv.stop()


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_cpp_client_grpc_web_end_to_end(servable, server, tmp_path):
    """C++ client 'grpc' mode: hand-encoded PredictRequest over grpc-web
    framing against the HTTP server's PredictionService route — the
    reference's request shape (deep_fm_serving_client.cpp:42-69) with no
    grpc++/protobuf dependency."""
    build = tmp_path / "cppbuild_grpc"
    shutil.copytree(CPP_DIR, build)
    subprocess.run(["make", "-s"], cwd=build, check=True, timeout=120)
    out = subprocess.run(
        [str(build / "ctr_client"), "127.0.0.1", str(server.port), "DeepFM",
         "grpc", "39"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    pline = [l for l in out.stdout.splitlines() if l.startswith("pctr = ")]
    assert len(pline) == 1
    p = float(pline[0].split("=")[1])
    assert 0.0 <= p <= 1.0
    # transport parity: REST mode on the same sample gives the same pctr
    out2 = subprocess.run(
        [str(build / "ctr_client"), "127.0.0.1", str(server.port), "DeepFM", "39"],
        capture_output=True, text=True, timeout=60,
    )
    p2 = float(
        [l for l in out2.stdout.splitlines() if l.startswith("pctr = ")][0]
        .split("=")[1]
    )
    assert abs(p - p2) < 1e-5


def test_overload_shed_http_and_grpc(servable):
    """Round 5 (VERDICT r4 item 5): a bounded micro-batcher backlog
    fast-fails with HTTP 429 / gRPC RESOURCE_EXHAUSTED instead of
    queueing unboundedly. A scorer stalled behind a slow request plus a
    tiny max_queued forces the admission path deterministically."""
    import threading
    import urllib.error

    from tf_repos_tpu.serve.grpc_server import GrpcPredictClient
    from tf_repos_tpu.serve.server import OverloadedError

    srv = PredictionServer(
        servable.servable_model_dir, port=0, reload_secs=0, grpc_port=0,
        max_queued=2, max_batch=1,
    )
    srv.start()
    try:
        inst = _instances(servable, 2)
        # stall the scorer so the backlog builds deterministically: the
        # worker sits inside score() while the fillers queue up
        orig_score = srv.scorer.score

        def slow_score(insts):
            time.sleep(1.0)
            return orig_score(insts)

        srv.scorer.score = slow_score
        fillers = [
            threading.Thread(
                target=lambda: srv.batcher.submit([inst[0]]), daemon=True
            )
            for _ in range(3)  # 1 in-flight (slow) + 2 queued = cap
        ]
        for f in fillers:
            f.start()
            time.sleep(0.05)
        with pytest.raises(OverloadedError):
            srv.batcher.submit(inst)

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/models/DeepFM:predict",
            data=json.dumps({"instances": [
                {"feat_ids": [int(x) for x in i["feat_ids"]],
                 "feat_vals": [float(x) for x in i["feat_vals"]]}
                for i in inst
            ]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 429

        import grpc as _grpc

        inputs = {
            "feat_ids": np.stack([i["feat_ids"] for i in inst]).astype(np.int64),
            "feat_vals": np.stack([i["feat_vals"] for i in inst]),
        }
        with GrpcPredictClient("127.0.0.1", srv.grpc_port, "DeepFM") as c:
            with pytest.raises(_grpc.RpcError) as gi:
                c.predict(inputs)
            assert gi.value.code() == _grpc.StatusCode.RESOURCE_EXHAUSTED
        for f in fillers:
            f.join(timeout=5)
        # stats surface the shed count
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=10
        ).read())
        assert stats["shed"] >= 3
    finally:
        srv.stop()


def test_grpc_persistent_client_roundtrip(servable):
    """GrpcPredictClient (one channel, many calls) matches the one-shot
    probe client."""
    from tf_repos_tpu.serve.grpc_server import GrpcPredictClient

    srv = PredictionServer(
        servable.servable_model_dir, port=0, reload_secs=0, grpc_port=0
    )
    srv.start()
    try:
        inst = _instances(servable, 3, seed=5)
        inputs = {
            "feat_ids": np.stack([i["feat_ids"] for i in inst]).astype(np.int64),
            "feat_vals": np.stack([i["feat_vals"] for i in inst]),
        }
        with GrpcPredictClient("127.0.0.1", srv.grpc_port, "DeepFM") as c:
            o1, _, _ = c.predict(inputs)
            o2, _, _ = c.predict(inputs)
        np.testing.assert_allclose(o1["prob"], o2["prob"], rtol=1e-6)
        ref = srv.batcher.submit(inst)
        np.testing.assert_allclose(o1["prob"], ref["prob"], rtol=1e-6)
    finally:
        srv.stop()
