"""True multi-process distributed training test — the analog of the
reference's localhost cluster simulation (run_dist.sh spawns 1 ps + 3
workers on localhost; SURVEY.md §4 item 3).

Spawns 2 OS processes, each with 2 virtual CPU devices, wired by
jax.distributed into one 4-device mesh (data=2 × model=2); each runs the
SAME SPMD train step (no ps/worker roles). Asserts both processes compute
identical losses and that the run matches a single-process 4-device run.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.device_count() == 4, jax.device_count()

    import numpy as np
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel import step as S
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="GD", learning_rate=0.1, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2)
    ss = S.ShardedState(model, tx, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = S.build_sharded_train_step(model, tx, mesh, specs)

    losses = []
    for i in range(3):
        full = synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)
        # this host's slice of the global batch (data axis is 2-way over hosts)
        lo = pid * (cfg.batch_size // 2); hi = lo + cfg.batch_size // 2
        local = {k: v[lo:hi] for k, v in full.items()}
        state, loss = train(state, ss.place_batch(local), jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    print("LOSSES", json.dumps(losses))
    """
)


HARNESS_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    hosts, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    sparse = len(sys.argv) > 4 and sys.argv[4] == "1"
    spd = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    epochs = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    cache = len(sys.argv) > 7 and sys.argv[7] == "1"

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.harness import run_task

    cfg = Config(
        model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=epochs,
        log_steps=5, learning_rate=0.01, seed=7,
        data_dir=os.path.join(workdir, "data"),
        model_dir=os.path.join(workdir, "model"), dt_dir="dist",
        dist_mode=2, worker_hosts=hosts, job_name="worker", task_index=pid,
        mesh_model=2, sparse_table_update=sparse, steps_per_dispatch=spd,
        # mid-train periodic eval: the decision clock is consulted every
        # 2 steps and host 0's verdict is broadcast (-1 = fire at every
        # boundary, clock-free determinism for the test)
        eval_throttle_secs=-1, eval_decision_steps=2,
        packed_cache=cache,
    )
    metrics = run_task(cfg)
    print("DONE", metrics["step"])
    """
)


SPARSE_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    import numpy as np
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import GlobalUidsUnion, SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import ShardedSparseState, build_sharded_sparse_train_step
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2)
    sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
    ss = ShardedSparseState(model, tx, sopt, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = build_sharded_sparse_train_step(model, tx, sopt, mesh, specs)
    mapper = SparseBatchMapper(model.sparse_slots())
    union = GlobalUidsUnion(model.sparse_slots())

    losses = []
    for i in range(3):
        full = synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)
        lo = pid * (cfg.batch_size // 2); hi = lo + cfg.batch_size // 2
        local = {k: v[lo:hi] for k, v in full.items()}
        placed = ss.place_batch(union(mapper(local)))
        state, loss = train(state, placed, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    print("LOSSES", json.dumps(losses))
    """
)


MULTIK_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid, sparse = sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1"
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    import numpy as np
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train import loop as L
    from tf_repos_tpu.train.optimizers import make_optimizer

    K = 2
    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2)

    def local(i):
        full = synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)
        lo = pid * (cfg.batch_size // 2); hi = lo + cfg.batch_size // 2
        return {k: v[lo:hi] for k, v in full.items()}

    losses = []
    if sparse:
        from tf_repos_tpu.data.sparse_batch import GlobalUidsUnion, SparseBatchMapper
        from tf_repos_tpu.parallel.sparse_step import (
            ShardedSparseState, build_sharded_sparse_multi_train_step)
        from tf_repos_tpu.train.sparse import UIDS_PREFIX, make_sparse_row_optimizer

        slots = model.sparse_slots()
        sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
        ss = ShardedSparseState(model, tx, sopt, mesh)
        state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
        multi = build_sharded_sparse_multi_train_step(model, tx, sopt, mesh, specs, K)
        mapper, union = SparseBatchMapper(slots), GlobalUidsUnion(slots)
        sentinels = {UIDS_PREFIX + t: s.vocab for t, s in slots.items()}
        for g in range(2):
            group = [union(mapper(local(g * K + j))) for j in range(K)]
            stacked = ss.place_stacked(L.stack_batches(group, sentinels))
            p, o, m, lk = multi(state["params"], state["opt_state"], state["mstate"],
                                stacked, jax.random.PRNGKey(100 + g))
            state = {"params": p, "opt_state": o, "mstate": m}
            losses += [float(x) for x in lk]
    else:
        from tf_repos_tpu.parallel import step as S

        ss = S.ShardedState(model, tx, mesh)
        state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
        multi = S.build_sharded_multi_train_step(model, tx, mesh, specs, K)
        for g in range(2):
            group = [local(g * K + j) for j in range(K)]
            stacked = ss.place_stacked(L.stack_batches(group))
            p, o, m, lk = multi(state["params"], state["opt_state"], state["mstate"],
                                stacked, jax.random.PRNGKey(100 + g))
            state = {"params": p, "opt_state": o, "mstate": m}
            losses += [float(x) for x in lk]
    print("LOSSES", json.dumps(losses))
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        losses.append(json.loads(line[len("LOSSES "):]))
    # both processes observe the identical (psum'd) global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # and it matches the same schedule on a single-process 4-device mesh
    import jax

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel import step as S
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="GD", learning_rate=0.1, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    ss = S.ShardedState(model, tx, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = S.build_sharded_train_step(model, tx, mesh, specs)
    ref = []
    for i in range(3):
        batch = synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)
        state, loss = train(state, ss.place_batch(batch), jax.random.PRNGKey(100 + i))
        ref.append(float(loss))
    np.testing.assert_allclose(ref, losses[0], rtol=1e-5)


@pytest.mark.parametrize(
    "sparse,spd,cache",
    [("0", 1, "0"), ("1", 1, "0"), ("1", 2, "0"), ("0", 1, "1")],
)
def test_two_process_midtrain_eval_no_deadlock(tmp_path, sparse, spd, cache):
    """Periodic eval fires MID-TRAIN under multi-process without deadlock:
    the throttle decision is taken at step boundaries and host 0's verdict
    is broadcast, so both hosts enter the collective eval program at the
    same step (VERDICT r1 item 5). sparse=1 additionally routes every
    train batch through the GlobalUidsUnion host collective in _place —
    its ordering must interleave safely with the step/eval collectives.
    spd=2 exercises the multi-host steps_per_dispatch group path (per-batch
    uid unions in group order, host-local stack, place_stacked)."""
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # two tr shards -> a true per-host split
    write_synthetic_libsvm(str(data_dir / "tr.part0.libsvm"), 200, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data_dir / "tr.part1.libsvm"), 200, feature_size=500, seed=3)
    write_synthetic_libsvm(str(data_dir / "va.part0.libsvm"), 100, feature_size=500, seed=1)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "hworker.py"
    script.write_text(HARNESS_WORKER)
    port = _free_port()
    hosts = f"127.0.0.1:{port},127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), hosts, str(pid), str(tmp_path), sparse, str(spd), "3", cache],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker {pid} failed:\n{err[-3000:]}"
        evals = [l for l in out.splitlines() if l.startswith("INFO: eval:")]
        # >= 2: at least one mid-train eval plus the final one
        assert len(evals) >= 2, f"worker {pid}: no mid-train eval fired:\n{out[-2000:]}"
        assert any(l.startswith("DONE") for l in out.splitlines())


def test_two_process_sparse_matches_single(tmp_path):
    """Multi-host sharded-SPARSE training: per-host local dedup + cross-
    host uid union (GlobalUidsUnion) must reproduce the single-process
    sharded-sparse trajectory on the same global batches."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "sworker.py"
    script.write_text(SPARSE_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    losses = []
    for p in procs:
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        losses.append(json.loads(line[len("LOSSES "):]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process reference: same mesh topology, global batch through
    # one mapper (no union needed)
    import jax

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState,
        build_sharded_sparse_train_step,
    )
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
    ss = ShardedSparseState(model, tx, sopt, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = build_sharded_sparse_train_step(model, tx, sopt, mesh, specs)
    mapper = SparseBatchMapper(model.sparse_slots())
    ref = []
    for i in range(3):
        batch = synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)
        state, loss = train(state, ss.place_batch(mapper(batch)), jax.random.PRNGKey(100 + i))
        ref.append(float(loss))
    np.testing.assert_allclose(ref, losses[0], rtol=1e-5)


@pytest.mark.parametrize("sparse", ["0", "1"])
def test_two_process_steps_per_dispatch_matches_single(tmp_path, sparse):
    """steps_per_dispatch>1 across OS processes: each host stacks its
    LOCAL [K, B/2] slice (sparse: after the per-batch GlobalUidsUnion),
    place_stacked assembles the global [K, B] scan batch, and the scanned
    trajectory must equal the same multi-step run single-process on the
    full batches."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "mkworker.py"
    script.write_text(MULTIK_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), sparse],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    losses = []
    for p in procs:
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        losses.append(json.loads(line[len("LOSSES "):]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process reference: identical mesh/K/rng schedule, full batches
    import jax

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train import loop as L
    from tf_repos_tpu.train.optimizers import make_optimizer

    K = 2
    cfg = Config(model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])

    def full(i):
        return synthetic_criteo_batch(np.random.default_rng(i), cfg.batch_size, cfg.feature_size)

    ref = []
    if sparse == "1":
        from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
        from tf_repos_tpu.parallel.sparse_step import (
            ShardedSparseState, build_sharded_sparse_multi_train_step)
        from tf_repos_tpu.train.sparse import UIDS_PREFIX, make_sparse_row_optimizer

        slots = model.sparse_slots()
        sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
        ss = ShardedSparseState(model, tx, sopt, mesh)
        state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
        multi = build_sharded_sparse_multi_train_step(model, tx, sopt, mesh, specs, K)
        mapper = SparseBatchMapper(slots)
        sentinels = {UIDS_PREFIX + t: s.vocab for t, s in slots.items()}
        for g in range(2):
            group = [mapper(full(g * K + j)) for j in range(K)]
            stacked = ss.place_stacked(L.stack_batches(group, sentinels))
            p, o, m, lk = multi(state["params"], state["opt_state"], state["mstate"],
                                stacked, jax.random.PRNGKey(100 + g))
            state = {"params": p, "opt_state": o, "mstate": m}
            ref += [float(x) for x in lk]
    else:
        from tf_repos_tpu.parallel import step as S

        ss = S.ShardedState(model, tx, mesh)
        state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
        multi = S.build_sharded_multi_train_step(model, tx, mesh, specs, K)
        for g in range(2):
            group = [full(g * K + j) for j in range(K)]
            stacked = ss.place_stacked(L.stack_batches(group))
            p, o, m, lk = multi(state["params"], state["opt_state"], state["mstate"],
                                stacked, jax.random.PRNGKey(100 + g))
            state = {"params": p, "opt_state": o, "mstate": m}
            ref += [float(x) for x in lk]
    np.testing.assert_allclose(ref, losses[0], rtol=1e-5)


def test_two_process_sigterm_one_host_stops_both(tmp_path):
    """Graceful preemption under multi-process: SIGTERM lands on ONE
    worker; its local flag is OR-reduced across hosts at eval-decision
    boundaries (GracefulStop), so BOTH workers break at the same step
    and exit 0 instead of deadlocking the mesh."""
    import signal
    import time as T

    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_libsvm(str(data_dir / "tr.part0.libsvm"), 300, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data_dir / "tr.part1.libsvm"), 300, feature_size=500, seed=3)
    write_synthetic_libsvm(str(data_dir / "va.part0.libsvm"), 50, feature_size=500, seed=1)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "hworker.py"
    script.write_text(HARNESS_WORKER)
    hosts = f"127.0.0.1:{_free_port()},127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    # many epochs so training outlives the signal; eval_decision_steps=2
    # (set in HARNESS_WORKER) keeps the stop-coordination cadence tight
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), hosts, str(pid), str(tmp_path), "0", "1", "2000"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    # wait until training is demonstrably under way: process 0 writes its
    # first metrics.jsonl line at the first log/eval boundary (model_dir
    # resolves to "<model_dir><dt_dir>" — reference += semantics)
    metrics = tmp_path / "modeldist" / "metrics.jsonl"
    deadline = T.time() + 150
    while T.time() < deadline:
        if metrics.exists() and metrics.stat().st_size > 0:
            break
        T.sleep(0.25)
    procs[1].send_signal(signal.SIGTERM)
    outs = []
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker {pid} died uncleanly:\n{err[-3000:]}"
        assert any(l.startswith("DONE") for l in out.splitlines()), out[-1500:]
        outs.append(out)
    # the signalled worker logged the graceful path; both stopped at the
    # same step (the DONE line carries the final step count)
    assert "graceful shutdown" in outs[1]
    done = [l for o in outs for l in o.splitlines() if l.startswith("DONE")]
    assert len(done) == 2 and done[0] == done[1], done


MHCOO_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    import numpy as np
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import (
        GlobalUidsUnion, MhCooPacker, SparseBatchMapper)
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState, build_sharded_sparse_train_step)
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

    cfg = Config(model="ESMM", feature_size=400, field_size=11, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001, multi_hot_pad=4)
    model = create_model(cfg)
    tx = make_optimizer("Adam", 0.05)
    mesh = make_mesh(data=2, model=2)
    sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
    ss = ShardedSparseState(model, tx, sopt, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = build_sharded_sparse_train_step(model, tx, sopt, mesh, specs)
    mapper = SparseBatchMapper(model.sparse_slots())
    # 1 LOCAL data shard per host (data axis 2 split over 2 processes)
    packer = MhCooPacker(model.mh_coo_groups(), n_data=1, floor=8)
    union = GlobalUidsUnion(model.sparse_slots())
    losses = []
    for i in range(3):
        full = synthetic_aliccp_batch(np.random.default_rng(i), cfg.batch_size,
                                      cfg.feature_size, multi_hot_pad=4)
        lo = pid * 16; hi = lo + 16
        local = {k: v[lo:hi] for k, v in full.items()}
        placed = ss.place_batch(union(packer(mapper(local))))
        state, loss = train(state, placed, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    print("LOSSES", json.dumps(losses))
    """
)


def test_two_process_mh_coo_matches_single(tmp_path):
    """Multi-host --mh_coo: per-host COO pack of the local batch slice +
    GlobalUidsUnion's cross-host pow2 bucket consensus must reproduce the
    single-process trajectory (one packer over the global batch with
    n_data=2) on the same global batches."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "mhcoo_worker.py"
    script.write_text(MHCOO_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    losses = []
    for p in procs:
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        losses.append(json.loads(line[len("LOSSES "):]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    import jax

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import MhCooPacker, SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState,
        build_sharded_sparse_train_step,
    )
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

    cfg = Config(model="ESMM", feature_size=400, field_size=11, embedding_size=4,
                 deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
                 optimizer="Adam", learning_rate=0.05, l2_reg=0.001, multi_hot_pad=4)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sopt = make_sparse_row_optimizer("Adam", 0.05, sorted_indices=False)
    ss = ShardedSparseState(model, tx, sopt, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    train = build_sharded_sparse_train_step(model, tx, sopt, mesh, specs)
    mapper = SparseBatchMapper(model.sparse_slots())
    packer = MhCooPacker(model.mh_coo_groups(), n_data=2, floor=8)
    ref = []
    for i in range(3):
        batch = synthetic_aliccp_batch(np.random.default_rng(i), cfg.batch_size,
                                       cfg.feature_size, multi_hot_pad=4)
        state, loss = train(state, ss.place_batch(packer(mapper(batch))),
                            jax.random.PRNGKey(100 + i))
        ref.append(float(loss))
    np.testing.assert_allclose(ref, losses[0], rtol=1e-5)


TASK_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    cfg_path = sys.argv[1]
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.harness import run_task

    cfg = Config(**json.load(open(cfg_path)))
    out = run_task(cfg)
    if isinstance(out, str):
        print("PATH", out)
    else:
        print("METRICS", json.dumps({k: float(v) for k, v in out.items()}))
    """
)


def _run_two_process_task(tmp_path, base_cfg, task_type, tag):
    """Launch TASK_WORKER twice (2 hosts x 2 devices) for one task_type;
    return both stdouts."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "task_worker.py"
    script.write_text(TASK_WORKER)
    hosts = f"127.0.0.1:{_free_port()},127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        cfgf = tmp_path / f"{tag}_cfg{pid}.json"
        cfgf.write_text(json.dumps(dict(
            base_cfg, task_type=task_type, dist_mode=2, worker_hosts=hosts,
            job_name="worker", task_index=pid,
        )))
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(cfgf)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        ))
    outs = []
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"{tag} worker {pid} failed:\n{err[-3000:]}"
        outs.append(out)
    return outs


def test_two_process_infer_merges_to_single_process_pred(tmp_path):
    """Multi-process infer (VERDICT r4 item 6): te files shard across
    hosts, hosts dispatch in lockstep (idle hosts feed a template batch),
    per-file pred parts merge on host 0 — and the result matches the
    single-process pred.txt line for line. Uneven per-host batch counts
    (90 vs 40 rows at batch 32) force the idle-dispatch path."""
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_libsvm(str(data_dir / "tr.libsvm"), 128, feature_size=400, seed=0)
    write_synthetic_libsvm(str(data_dir / "va.libsvm"), 64, feature_size=400, seed=1)
    write_synthetic_libsvm(str(data_dir / "te.part0.libsvm"), 90, feature_size=400, seed=2)
    write_synthetic_libsvm(str(data_dir / "te.part1.libsvm"), 40, feature_size=400, seed=3)

    base = dict(
        model="DeepFM", feature_size=400, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, learning_rate=0.01, seed=7, data_dir=str(data_dir),
        model_dir=str(tmp_path / "model"), dt_dir="i", eval_throttle_secs=0,
        mesh_model=2,
    )
    # checkpoint + reference prediction, single-process (8-device mesh)
    run_task(Config(**base))
    single = run_task(Config(**dict(base, task_type="infer")))
    ref_lines = open(single).read().splitlines()
    os.rename(single, str(data_dir / "pred_single.txt"))
    assert len(ref_lines) == 130

    outs = _run_two_process_task(tmp_path, base, "infer", "infer")
    assert any("PATH" in o for o in outs)
    got = open(str(data_dir / "pred.txt")).read().splitlines()
    assert len(got) == len(ref_lines)
    np.testing.assert_allclose(
        [float(x) for x in got], [float(x) for x in ref_lines],
        rtol=1e-5, atol=1e-7,
    )


def test_two_process_eval_with_mh_bucket_matches_single(tmp_path):
    """Multi-host eval with --mh_bucket (VERDICT r4 item 6): va streams
    are identical on every host, so per-batch width decisions agree with
    no consensus channel. A 2-process train (mid-train evals fire) then a
    2-process eval must produce the same metrics as a single-process eval
    of the same checkpoint."""
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp
    from tf_repos_tpu.train.harness import run_task

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_aliccp(str(data_dir / "tr.part0"), 96, feature_size=400, seed=0)
    write_synthetic_aliccp(str(data_dir / "tr.part1"), 96, feature_size=400, seed=3)
    write_synthetic_aliccp(str(data_dir / "va.part0"), 64, feature_size=400, seed=1)

    base = dict(
        model="ESMM", feature_size=400, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=2,
        log_steps=4, learning_rate=0.05, seed=7, data_dir=str(data_dir),
        model_dir=str(tmp_path / "model"), dt_dir="e", multi_hot_pad=8,
        mesh_model=2, sparse_table_update=True, mh_bucket="pow2",
        eval_throttle_secs=-1, eval_decision_steps=4,
    )
    outs = _run_two_process_task(tmp_path, base, "train", "train")
    for pid, out in enumerate(outs):
        evals = [l for l in out.splitlines() if l.startswith("INFO: eval:")]
        assert evals, f"worker {pid}: no eval fired:\n{out[-2000:]}"
    # both hosts computed identical eval lines (same global batches)
    e0 = [l for l in outs[0].splitlines() if l.startswith("INFO: eval:")]
    e1 = [l for l in outs[1].splitlines() if l.startswith("INFO: eval:")]
    assert e0 == e1

    ref = run_task(Config(**dict(base, task_type="eval")))
    outs = _run_two_process_task(tmp_path, base, "eval", "eval")
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("METRICS")][0]
        got = json.loads(line[len("METRICS "):])
        for k, v in ref.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)
