"""Standalone decomposition of the Ali-CCP host input chain at the
large-vocab operating point (ESMM 4.5M, B=4096): loader (packed cache) →
SparseBatchMapper (dedup+remap) → MhCooPacker (COO pack) → slim encoder,
plus the encoded wire bytes/example.

Written to replace PERF.md's estimated host-chain bound with a
measurement: the per-stage rates here, combined with the tunnel's
measured ~40-53 MB/s h2d and ~0.4-0.6 s fixed per-dispatch cost,
reconstruct the observed e2e rate — which attributes the e2e bound to
the LINK, not the host chain (the chain sustains ~0.5-0.7M ex/s on one
core of this box).

    python scripts/bench_host_chain.py [--lines 200000] [--pad 16]
Prints one JSON line per stage + a chain total + wire bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lines", type=int, default=200_000)
    ap.add_argument("--pad", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--feature_size", type=int, default=4_500_000)
    ap.add_argument("--zipf_a", type=float, default=1.3)
    ap.add_argument("--work_dir", default="/tmp/bench_host_chain")
    a = ap.parse_args(argv)

    from tf_repos_tpu.data.ragged import AliccpDataset
    from tf_repos_tpu.data.slim_wire import aliccp_encoding_batches
    from tf_repos_tpu.data.sparse_batch import MhCooPacker, SparseBatchMapper
    from tf_repos_tpu.data.synthetic import write_synthetic_aliccp
    from tf_repos_tpu.models.base import SparseSlot

    os.makedirs(a.work_dir, exist_ok=True)
    path = os.path.join(a.work_dir, f"tr_{a.lines}_{a.pad}.samples.txt")
    if not os.path.exists(path):
        write_synthetic_aliccp(
            path, a.lines, feature_size=a.feature_size, zipf_a=a.zipf_a, seed=3
        )

    slots = {
        "emb": SparseSlot(
            ("feat_ids", "u_catids", "u_shopids", "u_brandids", "u_intids",
             "a_catids", "a_shopids", "a_brandids", "a_intids"),
            a.feature_size,
        )
    }
    # DIN's 4 user groups since round 5 (a_int stays padded); ESMM still
    # packs 5 — this bench uses the DIN set
    groups = (("u_cat", True), ("u_shop", True), ("u_brand", True),
              ("u_int", True))

    def dataset():
        return AliccpDataset(
            [path], multi_hot_pad=a.pad, batch_size=a.batch_size,
            num_epochs=1, perform_shuffle=True, shuffle_buffer=256, seed=7,
            packed_cache=True,
        )

    out = {"lines": a.lines, "pad": a.pad, "batch_size": a.batch_size}
    # warm the packed cache (cold build = the text-parse rate, measured
    # separately in bench_loader.py)
    n = sum(1 for _ in dataset())

    t0 = time.perf_counter()
    batches = list(dataset())
    out["loader_ex_s"] = round(n * a.batch_size / (time.perf_counter() - t0))

    mapper = SparseBatchMapper(slots)
    t0 = time.perf_counter()
    mapped = [mapper(b) for b in batches]
    out["mapper_ex_s"] = round(n * a.batch_size / (time.perf_counter() - t0))

    packer = MhCooPacker(groups)
    t0 = time.perf_counter()
    packed = [packer(b) for b in mapped]
    out["packer_ex_s"] = round(n * a.batch_size / (time.perf_counter() - t0))

    t0 = time.perf_counter()
    encoded = list(aliccp_encoding_batches(iter(packed), a.feature_size))
    out["encoder_ex_s"] = round(n * a.batch_size / (time.perf_counter() - t0))

    # full generator chain as the harness composes it (one pass, one thread)
    gen = aliccp_encoding_batches(
        (packer(mapper(b)) for b in dataset()), a.feature_size
    )
    t0 = time.perf_counter()
    n2 = sum(1 for _ in gen)
    out["chain_ex_s"] = round(n2 * a.batch_size / (time.perf_counter() - t0))

    # the --map_workers pool (data/pipeline.parallel_mapped_batches)
    from tf_repos_tpu.data.pipeline import parallel_mapped_batches
    from tf_repos_tpu.train.sparse import UIDS_PREFIX
    from tf_repos_tpu.data.sparse_batch import MHC_DEST, MHC_IDX, MHC_W

    def make_chain():
        m = SparseBatchMapper(slots)
        p = MhCooPacker(groups)
        return lambda b: p(m(b))

    for w in (2, 3):
        gen = aliccp_encoding_batches(
            parallel_mapped_batches(
                dataset(), make_chain, workers=w,
                pad_rules={UIDS_PREFIX + "emb": a.feature_size,
                           MHC_IDX: 0, MHC_DEST: 0, MHC_W: 0.0},
            ),
            a.feature_size,
        )
        t0 = time.perf_counter()
        n3 = sum(1 for _ in gen)
        out[f"chain_workers{w}_ex_s"] = round(
            n3 * a.batch_size / (time.perf_counter() - t0)
        )

    last = encoded[len(encoded) // 2]
    wire = sum(np.asarray(v).nbytes for v in last.values())
    out["wire_bytes_per_example"] = round(wire / a.batch_size, 1)
    out["wire_fields"] = {
        k: [str(np.asarray(v).dtype), list(np.asarray(v).shape)]
        for k, v in sorted(last.items(), key=lambda kv: -np.asarray(kv[1]).nbytes)
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
