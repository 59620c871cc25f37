"""Scaling-efficiency benchmark: examples/s of the sharded train step at
mesh sizes 1..N devices, with efficiency relative to linear scaling from
1 device (BASELINE.json north-star: >=80% efficiency 1 host -> 2+ hosts).

Runs on whatever devices are visible:
  * a real TPU slice: run as-is (one process per host via
    scripts/run_dist.sh semantics, or single-process on one host)
  * the CPU simulation rig:
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/bench_scaling.py
    (CPU numbers validate the harness + sharding mechanics, not TPU perf)

Per-device batch is held constant (weak scaling — the production regime:
a bigger slice trains a bigger global batch).
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--per_device_batch", type=int, default=2048)
    p.add_argument("--feature_size", type=int, default=117_581)
    p.add_argument("--mesh_model", type=int, default=1, help="model-axis size (table sharding)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--sparse", action="store_true",
                   help="bench the sharded-SPARSE step (lazy touched-rows "
                        "updates, parallel/sparse_step.py) instead of dense")
    a = p.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel import step as S
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train.optimizers import make_optimizer

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    results = {}
    for nd in sizes:
        model_ax = min(a.mesh_model, nd)
        data_ax = nd // model_ax
        nd = data_ax * model_ax  # devices actually used (mesh truncates)
        if nd in results:
            continue
        B = a.per_device_batch * data_ax
        cfg = Config(
            model="DeepFM", feature_size=a.feature_size, field_size=39,
            embedding_size=16, deep_layers="256,128,64", dropout="1.0,1.0,1.0",
            batch_size=B, optimizer="Adam", l2_reg=0.0001,
        )
        model = create_model(cfg)
        tx = make_optimizer("Adam", cfg.learning_rate)
        mesh = make_mesh(data=data_ax, model=model_ax, devices=jax.devices()[:nd])
        raw = synthetic_criteo_batch(np.random.default_rng(0), B, a.feature_size)
        if a.sparse:
            from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
            from tf_repos_tpu.parallel.sparse_step import (
                ShardedSparseState,
                build_sharded_sparse_train_step,
            )
            from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

            sopt = make_sparse_row_optimizer(
                "Adam", cfg.learning_rate, fused_moments=True, sorted_indices=False
            )
            ss = ShardedSparseState(model, tx, sopt, mesh)
            state, specs = ss.init(jax.random.PRNGKey(0))
            step = build_sharded_sparse_train_step(model, tx, sopt, mesh, specs)
            raw = SparseBatchMapper(model.sparse_slots())(raw)
        else:
            ss = S.ShardedState(model, tx, mesh)
            state, specs = ss.init(jax.random.PRNGKey(0))
            step = S.build_sharded_train_step(model, tx, mesh, specs)
        batch = ss.place_batch(raw)
        key = jax.random.PRNGKey(1)
        state, loss = step(state, batch, key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(a.steps):
            state, loss = step(state, batch, key)
        float(loss)
        dt = time.perf_counter() - t0
        eps = a.steps * B / dt
        results[nd] = eps
        smallest = min(results)
        eff = eps / (results[smallest] * nd / smallest)
        print(
            f"devices={nd:3d} (data={data_ax} x model={model_ax})  global_batch={B:6d}  "
            f"{eps:>12,.0f} ex/s  efficiency={eff:6.1%}",
            flush=True,
        )
    lo, hi = min(results), max(results)
    print(
        json.dumps(
            {
                "metric": "weak_scaling_examples_per_sec",
                "per_device_batch": a.per_device_batch,
                "results": {str(k): round(v, 1) for k, v in results.items()},
                "efficiency_at_max": round(results[hi] / (results[lo] * hi / lo), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
