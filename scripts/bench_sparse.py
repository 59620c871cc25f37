"""Dense vs lazy-sparse table updates at Ali-CCP scale (VERDICT r1 items
2+4 acceptance): ESMM @ 4.5M vocab — step time, step-time STABILITY (the
dense path's XLA scatter was measured erratic 39-435 ms at this vocab),
and the host-side dedup cost (pipelined with TPU compute in production).

Run on the real chip:  timeout 600 python scripts/bench_sparse.py
CPU sanity:            JAX_PLATFORMS=cpu python scripts/bench_sparse.py --small
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipfify_ids(batches, vocab: int, a: float = 1.2, seed: int = 0):
    """Rewrite the id fields with a Zipf(a) draw, id = popularity rank —
    matching the real pipelines (the preprocessors emit frequency-sorted
    ids: features/criteo.py, features/aliccp.py remap stage), where hot
    rows are low and ADJACENT. Uniform ids are the lazy path's worst
    case: almost no batch-level duplication, so dedup buys nothing."""
    import numpy as np

    rng = np.random.default_rng(seed)
    for b in batches:
        for k, arr in b.items():
            if k.endswith("ids") or k == "feat_ids":
                z = np.minimum(rng.zipf(a, size=arr.shape), vocab - 1)
                b[k] = np.where(arr > 0, z.astype(np.int32), 0)
    return batches


def bench(model_name: str, vocab: int, batch_size: int, pad: int, n_steps: int = 30,
          id_dist: str = "uniform"):
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch, synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.train import sparse as SP
    from tf_repos_tpu.train.loop import build_train_step
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(
        model=model_name, feature_size=vocab, field_size=11 if model_name == "ESMM" else 39,
        embedding_size=16, deep_layers="256,128,64", dropout="1.0,1.0,1.0",
        batch_size=batch_size, learning_rate=0.0005, l2_reg=0.0001,
        optimizer="Adam", multi_hot_pad=pad,
    )
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)

    rng = np.random.default_rng(0)
    if model_name == "ESMM":
        raw = [
            synthetic_aliccp_batch(rng, batch_size, vocab, multi_hot_pad=pad)
            for _ in range(4)
        ]
    else:
        raw = [synthetic_criteo_batch(rng, batch_size, vocab) for _ in range(4)]
    if id_dist == "zipf":
        raw = zipfify_ids(raw, vocab)

    def run(step, params, opt_state, mstate, batches):
        key = jax.random.PRNGKey(1)
        # warm up every batch: pow2-bucketed uids can differ in shape
        # across batches, and each shape is its own compile
        for i in range(len(batches)):
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, batches[i % 4], key
            )
        float(loss)  # axon sync
        times = []
        for i in range(n_steps):
            t0 = time.perf_counter()
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, batches[i % 4], key
            )
            float(loss)  # per-step sync to expose variance
            times.append(time.perf_counter() - t0)
        return np.array(times) * 1e3  # ms

    out = {}

    # ---- dense path
    params, mstate = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    step = build_train_step(model, tx)
    dev = [jax.tree.map(jnp.asarray, b) for b in raw]
    t = run(step, params, opt_state, mstate, dev)
    out["dense_ms_med"] = float(np.median(t))
    out["dense_ms_min"] = float(t.min())
    out["dense_ms_max"] = float(t.max())
    del params, opt_state, dev

    # ---- sparse path
    mapper = SparseBatchMapper(model.sparse_slots())
    th0 = time.perf_counter()
    mapped = [mapper(b) for b in raw]
    out["mapper_host_ms_per_batch"] = float(
        (time.perf_counter() - th0) / len(raw) * 1e3
    )
    # dedup ratio: id slots per batch vs unique rows actually touched
    from tf_repos_tpu.train.sparse import UIDS_PREFIX
    for name, slot in model.sparse_slots().items():
        uids = mapped[0][UIDS_PREFIX + name]
        uniq = int((uids < slot.vocab).sum())
        out[f"uniq_rows_{name}"] = uniq
        out[f"s_pad_{name}"] = len(uids)
        nslots = sum(int(np.asarray(mapped[0][f]).size) for f in slot.fields)
        out[f"dedup_ratio_{name}"] = round(nslots / max(uniq, 1), 2)
    dev = [jax.tree.map(jnp.asarray, b) for b in mapped]
    cells = [("sparse", False, None), ("sparse_fused", True, None),
             ("sparse_fused_bf16", True, jnp.bfloat16)]
    for tag, fused, dt in cells:
        sopt = SP.make_sparse_row_optimizer(
            cfg.optimizer, cfg.learning_rate, fused_moments=fused
        )
        params, mstate = model.init(jax.random.PRNGKey(0))
        if dt is not None:
            # bf16 table+moment storage with stochastic-rounding writes —
            # halves the gather/scatter bytes of every touched row
            params = SP.cast_tables(model, params, dt)
        opt_state = SP.init_opt_state(model, tx, sopt, params)
        sstep = SP.build_sparse_train_step(model, tx, sopt)
        t = run(sstep, params, opt_state, mstate, dev)
        out[f"{tag}_ms_med"] = float(np.median(t))
        out[f"{tag}_ms_min"] = float(t.min())
        out[f"{tag}_ms_max"] = float(t.max())
        del params, opt_state
    out["speedup_med"] = out["dense_ms_med"] / out["sparse_ms_med"]
    out["examples_per_sec_sparse"] = batch_size / (out["sparse_ms_med"] / 1e3)
    return out


def headline(id_dist: str = "zipf", n_steps: int = 30):
    """The bench.py operating point (DeepFM, 117,581 vocab, B=16384,
    bf16 towers), timed bench.py-style (async dispatches, one final
    sync): dense+static_fields (the current headline) vs the lazy sparse
    path without and with the static_fields composition. Zipf ids are
    the realistic case — the preprocessors emit frequency-sorted ids."""
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.train import sparse as SP
    from tf_repos_tpu.train.loop import build_train_step
    from tf_repos_tpu.train.optimizers import make_optimizer

    B, V = 16384, 117_581
    rng = np.random.default_rng(0)
    raw = [synthetic_criteo_batch(rng, B, V) for _ in range(4)]
    if id_dist == "zipf":
        raw = zipfify_ids(raw, V)
        for b in raw:  # keep the static contract: fields 0..12 ids 1..13
            b["feat_ids"][:, :13] = np.arange(1, 14)

    def time_steps(step, params, opt_state, mstate, batches):
        key = jax.random.PRNGKey(1)
        for i in range(len(batches)):
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, batches[i % 4], key
            )
        float(loss)
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, batches[i % 4], key
            )
        float(loss)
        return (time.perf_counter() - t0) / n_steps * 1e3

    out = {"id_dist": id_dist}
    for tag, static, sparse in (
        ("dense_static", 13, False),
        ("sparse", 0, True),
        ("sparse_static", 13, True),
        ("sparse_static_pallas", 13, "pallas"),
    ):
        cfg = Config(
            model="DeepFM", feature_size=V, field_size=39, embedding_size=16,
            deep_layers="256,128,64", dropout="1.0,1.0,1.0", batch_size=B,
            learning_rate=0.0005, l2_reg=0.0001, optimizer="Adam",
            static_fields=static, compute_dtype="bfloat16",
        )
        model = create_model(cfg)
        tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
        params, mstate = model.init(jax.random.PRNGKey(0))
        if sparse:
            sopt = SP.make_sparse_row_optimizer(cfg.optimizer, cfg.learning_rate)
            opt_state = SP.init_opt_state(model, tx, sopt, params)
            lookup = None
            if sparse == "pallas":
                from tf_repos_tpu.ops.pallas_sparse import make_vmem_expand_lookup

                lookup = make_vmem_expand_lookup()
            step = SP.build_sparse_train_step(model, tx, sopt, lookup=lookup)
            mapper = SparseBatchMapper(model.sparse_slots())
            dev = [jax.tree.map(jnp.asarray, mapper(b)) for b in raw]
        else:
            opt_state = tx.init(params)
            step = build_train_step(model, tx)
            dev = [jax.tree.map(jnp.asarray, b) for b in raw]
        ms = time_steps(step, params, opt_state, mstate, dev)
        out[f"{tag}_ms"] = round(ms, 3)
        out[f"{tag}_examples_per_sec"] = round(B / (ms / 1e3), 1)
        del params, opt_state, dev
    print(json.dumps(out), flush=True)


def main():
    small = "--small" in sys.argv
    if small:
        import jax

        jax.config.update("jax_platforms", "cpu")
        for dist in ("uniform", "zipf"):
            res = bench("ESMM", vocab=50_000, batch_size=256, pad=8, n_steps=10,
                        id_dist=dist)
            print(json.dumps({"bench": f"esmm_sparse_vs_dense_{dist}",
                              **{k: round(v, 3) for k, v in res.items()}}))
    elif "--headline" in sys.argv:
        for dist in ("zipf", "uniform"):
            headline(dist)
    elif "--criteo" in sys.argv:
        # the headline-bench operating point (bench.py: DeepFM, 117k
        # vocab, B=16384) with realistic frequency-sorted Zipf ids: does
        # the lazy path beat the dense scatter at SMALL vocab too?
        res = bench("DeepFM", vocab=117_581, batch_size=16384, pad=0,
                    id_dist="zipf")
        print(json.dumps({"bench": "deepfm_criteo_sparse_vs_dense_zipf",
                          **{k: round(v, 3) for k, v in res.items()}}), flush=True)
    else:
        for dist in ("zipf", "uniform"):
            res = bench("ESMM", vocab=4_500_000, batch_size=4096, pad=16,
                        id_dist=dist)
            print(json.dumps({"bench": f"esmm_sparse_vs_dense_{dist}",
                              **{k: round(v, 3) for k, v in res.items()}}), flush=True)


if __name__ == "__main__":
    main()
