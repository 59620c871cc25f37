"""Device bench at the PUBLISHED Ali-CCP multi-hot length regime.

The reference's real data averages 250 ids/sample on the largest
user-behavior field (/root/reference/DeepMTL/README.md:21) and its
VarLen input consumes ALL of them (DIN.py:65-76, DeepCvrMTL.py:152-164).
Round-3's --mh_coo/--mh_bucket wins were demonstrated at synthetic true
lengths ~4-8 (pad 16/64) — a regime ~30-60x lighter. This bench runs the
SAME levers at the published point:

  ESMM 4.5M vocab, B=4096, per-field lognormal lengths
  (PUBLISHED_MH_AVG_LENS: u_shop achieves avg 250), pad 512,
  Zipf ids (frequency-sorted remap analog).

Measured host-side facts at this point (zipf 1.2): ~1.20M live multi-hot
slots/batch (~293/row), ~108k unique ids/batch (dedup 11x, uids pow2
bucket 131072) — the compact-rows working set is ABOVE the Pallas
VMEM_ROW_CAP (49,152), so the VMEM expand/accumulate and COO-pool
kernels fall back to XLA at trace time; at zipf 1.5 (16k unique) the
Pallas path engages. Cells cover both sides of that boundary plus the
padded baseline and DIN's attention/bucket leg.

Run on the real chip:  timeout 1800 python scripts/bench_published.py
CPU sanity:            JAX_PLATFORMS=cpu python scripts/bench_published.py --small
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batches(model_name, vocab, batch_size, pad, zipf, n=3, scale=1.0):
    from tf_repos_tpu.data.synthetic import (
        PUBLISHED_MH_AVG_LENS,
        synthetic_aliccp_batch,
    )

    lens = {k: max(v * scale, 1.0) for k, v in PUBLISHED_MH_AVG_LENS.items()}
    rng = np.random.default_rng(0)
    return [
        synthetic_aliccp_batch(
            rng, batch_size, vocab, multi_hot_pad=pad,
            avg_lens=lens, zipf_a=zipf,
        )
        for _ in range(n)
    ]


def bench(model_name, vocab, batch_size, pad, zipf, coo, bucket,
          n_steps=12, scale=1.0, attention=True, fused_bf16=False,
          fused_table=False, dma_scatter=False, combine=False):
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.ragged import MH_PAIRS
    from tf_repos_tpu.data.sparse_batch import (
        MhCooPacker,
        MhPadBucketer,
        SparseBatchMapper,
    )
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.ops.pallas_sparse import (
        VMEM_ROW_CAP,
        fits_vmem_packed,
        make_vmem_expand_lookup,
    )
    from tf_repos_tpu.train import sparse as SP
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(
        model=model_name, feature_size=vocab, field_size=11,
        embedding_size=16, deep_layers="256,128", attention_layers="256",
        dropout="1.0,1.0", batch_size=batch_size, learning_rate=0.0005,
        l2_reg=0.0001, optimizer="Adam", multi_hot_pad=pad,
        compute_dtype="bfloat16", attention_pooling=attention,
    )
    model = create_model(cfg)
    raw = make_batches(model_name, vocab, batch_size, pad, zipf, scale=scale)

    # live-slot / dedup stats of the first batch
    mh_keys = ("u_catids", "u_shopids", "u_brandids", "u_intids", "a_intids")
    all_keys = ("feat_ids", "a_catids", "a_shopids", "a_brandids") + mh_keys
    mh_ids = np.concatenate([raw[0][k].ravel() for k in mh_keys])
    live = int((mh_ids > 0).sum())
    uniq = int(
        np.unique(
            np.concatenate([raw[0][k].ravel() for k in all_keys])
        ).size
    )

    bucketer = MhPadBucketer(MH_PAIRS) if bucket else None
    mapper = SparseBatchMapper(model.sparse_slots())
    # --mh_coo_combine (round 6): host-side duplicate-(row,id) weight
    # combine — exact for sum combiners; 1.85x fewer live slots here
    packer = (
        MhCooPacker(model.mh_coo_groups(), combine=combine)
        if coo else None
    )
    host, t0 = [], time.perf_counter()
    for b in raw:
        if bucketer is not None:
            b = bucketer(b)
        # packer-first ordering (round 5): dedup scans live COO ids
        if packer is not None:
            b = packer(b)
        b = mapper(b)
        host.append(b)
    host_ms = (time.perf_counter() - t0) / len(raw) * 1e3
    s_pad = int(host[0]["__uids_emb"].shape[0])
    wire_bytes = sum(
        a.nbytes for a in host[0].values() if isinstance(a, np.ndarray)
    )

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    # fused_bf16: the large-vocab storage levers (--fused_moments +
    # --param_dtype=bfloat16 with stochastic rounding) — halves the
    # moment row-ops and all table/moment bytes
    sopt = SP.make_sparse_row_optimizer(
        cfg.optimizer, cfg.learning_rate,
        fused_moments=fused_bf16 and not fused_table,
        fused_table=fused_table, dma_scatter=dma_scatter,
    )
    params, mstate = model.init(jax.random.PRNGKey(0))
    if (fused_bf16 or fused_table) and not dma_scatter:
        # dma_scatter is f32-only: its lane-padded 512B rows already
        # beat the unpadded bf16 row ops (train/sparse.py docstring)
        params = SP.cast_tables(model, params, jnp.bfloat16)
    opt_state = SP.init_opt_state(model, tx, sopt, params)
    step = SP.build_sparse_train_step(
        model, tx, sopt, lookup=make_vmem_expand_lookup()
    )
    dev = [jax.tree.map(jnp.asarray, b) for b in host]
    key = jax.random.PRNGKey(1)
    for d in dev:  # compile every bucket shape
        params, opt_state, mstate, loss = step(params, opt_state, mstate, d, key)
    float(loss)  # axon sync
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, mstate, loss = step(
            params, opt_state, mstate, dev[i % len(dev)], key
        )
    float(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    out = {
        "model": model_name, "pad": pad, "zipf": zipf,
        "coo": coo, "bucket": bucket,
        "live_mh_slots": live, "unique_ids": uniq, "uids_bucket": s_pad,
        # "full": both directions VMEM-pinned; "packed_bwd": XLA gather
        # fwd + lane-packed Pallas accumulate bwd (tier 2); False: XLA
        "pallas_engaged": (
            "full" if s_pad <= VMEM_ROW_CAP
            else ("packed_bwd" if fits_vmem_packed(s_pad, cfg.embedding_size)
                  else False)
        ),
        "wire_bytes_per_batch": wire_bytes,
        "host_ms_per_batch": round(host_ms, 2),
        "step_ms": round(ms, 2),
        "examples_per_sec": round(batch_size / (ms / 1e3), 1),
        "final_loss": round(float(loss), 5),
    }
    if coo:
        out["coo_m_bucket"] = int(host[0]["__mhc_idx"].shape[-1])
    if bucket:
        out["widths"] = {f: int(host[0][f].shape[-1])
                         for f, _ in MH_PAIRS if f in host[0]}
    return out


CELLS = {
    # name: (model, pad, zipf, coo, bucket, attention[, fused_bf16])
    "esmm_padded": ("ESMM", 512, 1.2, False, False, True),
    "esmm_coo": ("ESMM", 512, 1.2, True, False, True),
    "esmm_coo_bucket": ("ESMM", 512, 1.2, True, True, True),
    # + the large-vocab storage levers (fused m|v moments, bf16+SR
    # tables): halves moment row-ops and table/moment bytes
    "esmm_coo_fused_bf16": ("ESMM", 512, 1.2, True, False, True, True),
    # + --fused_table ([V,3K] w|m|v): ONE row gather + ONE row scatter
    # per step — the vocab scatter is the biggest single op (15-19 ms)
    "esmm_coo_fused_table": ("ESMM", 512, 1.2, True, False, True, False, True),
    "din_att_coo_fused_table": ("DIN", 512, 1.2, True, True, True, False, True),
    # + --dma_scatter (round 5): lane-padded f32 [V,L] w|m|v + per-row
    # DMA write-back — padded 512B rows take the gather 7.99 -> 2.29 ms
    # and the scatter 23.1 -> 10.96 (microbench); these cells measure
    # the full step
    "esmm_coo_dma": ("ESMM", 512, 1.2, True, False, True, False, True, True),
    # + --mh_coo_combine (round 6): duplicate (row,id) weights summed on
    # the host (C++ per-row hash) — exact for ESMM's sum combiners,
    # 1.85x fewer live COO slots at this regime
    "esmm_coo_dma_combine": ("ESMM", 512, 1.2, True, False, True, False, True, True, True),
    "din_att_coo_dma": ("DIN", 512, 1.2, True, True, True, False, True, True),
    # zipf 1.5: 16k unique -> the Pallas VMEM path ENGAGES (cap boundary)
    "esmm_coo_z15": ("ESMM", 512, 1.5, True, False, True),
    "din_att_bucket": ("DIN", 512, 1.2, False, True, True),
    "din_att_coo_bucket": ("DIN", 512, 1.2, True, True, True),
    "din_att_coo_fused_bf16": ("DIN", 512, 1.2, True, True, True, True),
}


def main():
    small = "--small" in sys.argv
    vocab, b, n = 4_500_000, 4096, 12
    scale = 1.0
    memo_path = "/tmp/bench_published_memo.json"
    if small:
        import jax

        jax.config.update("jax_platforms", "cpu")
        vocab, b, n, scale = 50_000, 64, 3, 0.05
        memo_path = None
    out = {}
    if memo_path and os.path.exists(memo_path):
        out = json.load(open(memo_path))
    for tag, cell in CELLS.items():
        (model_name, pad, zipf, coo, bucket, att), extra = cell[:6], cell[6:]
        if tag in out:
            print(f"[skip] {tag}", flush=True)
            continue
        out[tag] = bench(model_name, vocab, b, pad, zipf, coo, bucket,
                         n_steps=n, scale=scale, attention=att,
                         fused_bf16=bool(extra[0:1] and extra[0]),
                         fused_table=bool(extra[1:2] and extra[1]),
                         dma_scatter=bool(extra[2:3] and extra[2]),
                         combine=bool(extra[3:4] and extra[3]))
        if memo_path:
            json.dump(out, open(memo_path, "w"))
        print(json.dumps({tag: out[tag]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
