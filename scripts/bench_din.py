"""DIN large-vocab step bench: the --mh_bucket lever (VERDICT r2 item 4,
the non-sum-pool leg).

DIN's attention unit runs an MLP over [B, pad, 3K] per behavior field
(reference DIN.py:152-173) — cost proportional to the PADDED width while
true Ali-CCP lengths are ~4-8 of pad 64, and the COO sum-pool form
(--mh_coo) cannot express per-slot attention. --mh_bucket slices the
padded fields to the batch's pow2 live width on the host, shrinking the
attention leg and every multi-hot expand by pad/bucket.

Cells (DIN @ 4.5M vocab, B=4096, Zipf ids — the frequency-sorted
distribution every real remap emits; sparse lazy Adam + Pallas VMEM
kernels, bf16 towers — the large-vocab recipe):

  pad64          static multi_hot_pad=64, no slicing (round-2 behavior)
  pad64_bucket   same input, MhPadBucketer slices to the live pow2 width
  pad16 /
  pad16_bucket   the tighter-reader counterpoint

Run on the real chip:  timeout 900 python scripts/bench_din.py
CPU sanity:            JAX_PLATFORMS=cpu python scripts/bench_din.py --small
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_sparse import zipfify_ids  # noqa: E402  (same Zipf id rewrite)


def bench(vocab: int, batch_size: int, pad: int, bucket: bool, n_steps: int = 30,
          avg_hot: int = 4):
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.ragged import MH_PAIRS
    from tf_repos_tpu.data.sparse_batch import MhPadBucketer, SparseBatchMapper
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.ops.pallas_sparse import make_vmem_expand_lookup
    from tf_repos_tpu.train import sparse as SP
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(
        model="DIN", feature_size=vocab, field_size=11, embedding_size=16,
        deep_layers="256,128,64", attention_layers="256", dropout="1.0,1.0,1.0",
        batch_size=batch_size, learning_rate=0.0005, l2_reg=0.0001,
        optimizer="Adam", multi_hot_pad=pad, compute_dtype="bfloat16",
    )
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    rng = np.random.default_rng(0)
    raw = [
        synthetic_aliccp_batch(rng, batch_size, vocab, multi_hot_pad=pad, avg_hot=avg_hot)
        for _ in range(4)
    ]
    raw = zipfify_ids(raw, vocab)

    host = []
    bucketer = MhPadBucketer(MH_PAIRS) if bucket else None
    mapper = SparseBatchMapper(model.sparse_slots())
    t0 = time.perf_counter()
    for b in raw:
        if bucketer is not None:
            b = bucketer(b)
        host.append(mapper(b))
    host_ms = (time.perf_counter() - t0) / len(raw) * 1e3
    widths = {f: int(host[0][f].shape[-1]) for f, _ in MH_PAIRS}

    params, mstate = model.init(jax.random.PRNGKey(0))
    sopt = SP.make_sparse_row_optimizer(cfg.optimizer, cfg.learning_rate)
    opt_state = SP.init_opt_state(model, tx, sopt, params)
    step = SP.build_sparse_train_step(
        model, tx, sopt, lookup=make_vmem_expand_lookup()
    )
    dev = [jax.tree.map(jnp.asarray, b) for b in host]

    key = jax.random.PRNGKey(1)
    for i in range(len(dev)):  # compile every bucket shape
        params, opt_state, mstate, loss = step(params, opt_state, mstate, dev[i], key)
    float(loss)  # axon sync
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, mstate, loss = step(
            params, opt_state, mstate, dev[i % 4], key
        )
    float(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    return {
        "pad": pad, "bucket": bucket, "widths": widths,
        "step_ms": round(ms, 2),
        "examples_per_sec": round(batch_size / (ms / 1e3), 1),
        "host_ms_per_batch": round(host_ms, 2),
        "final_loss": round(float(loss), 5),
    }


def main():
    small = "--small" in sys.argv
    memo_path = "/tmp/bench_din_memo.json"
    if small:
        import jax

        jax.config.update("jax_platforms", "cpu")
        cells = [(50_000, 256, 8, False), (50_000, 256, 8, True)]
        n = 5
        memo_path = None
    else:
        cells = [
            (4_500_000, 4096, 64, False),
            (4_500_000, 4096, 64, True),
            (4_500_000, 4096, 16, False),
            (4_500_000, 4096, 16, True),
        ]
        n = 30
    # per-cell memo: a tunnel stall loses at most one cell per retry
    out = {}
    if memo_path and os.path.exists(memo_path):
        out = json.load(open(memo_path))
    for vocab, b, pad, bucket in cells:
        tag = f"pad{pad}{'_bucket' if bucket else ''}"
        if tag in out:
            print(f"[skip] {tag}", flush=True)
            continue
        out[tag] = bench(vocab, b, pad, bucket, n_steps=n)
        if memo_path:
            json.dump(out, open(memo_path, "w"))
        print(json.dumps({tag: out[tag]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
