"""Input-pipeline throughput bench: text parse vs --packed_cache.

Measures lines/s through the REAL dataset iterators (window shuffle,
static batches, mask) for the libsvm reader in three states:

  text        native C++ chunk-parallel parse, every epoch
  cache build first pass: parse + write-behind sidecar (data/cache.py)
  cache hit   memmap the packed sidecar

Pure host-side (no device); run anywhere. PERF.md records the measured
numbers on the dev box (0.71M text / 6.7M warm at 500k lines).

  python scripts/bench_loader.py [--lines 500000] [--batch 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lines", type=int, default=500_000)
    ap.add_argument("--batch", type=int, default=16_384)
    ap.add_argument("--feature_size", type=int, default=117_581)
    ap.add_argument("--workers", type=int, default=3)
    a = ap.parse_args()

    from tf_repos_tpu.data.libsvm import LibsvmDataset
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm

    work = tempfile.mkdtemp(prefix="bench_loader_")
    path = os.path.join(work, "tr.libsvm")
    print(f"generating {a.lines:,} lines ...", file=sys.stderr)
    write_synthetic_libsvm(path, a.lines, feature_size=a.feature_size)

    def run(**kw) -> float:
        t0 = time.perf_counter()
        n = 0
        ds = LibsvmDataset(
            [path], field_size=39, batch_size=a.batch, num_epochs=1,
            perform_shuffle=True, seed=1, parse_workers=a.workers, **kw
        )
        for b in ds:
            n += int(b["mask"].sum())
        dt = time.perf_counter() - t0
        assert n == a.lines, (n, a.lines)
        return n / dt

    out = {
        "lines": a.lines,
        "text_lines_per_sec": round(run()),
        "cache_build_lines_per_sec": round(run(packed_cache=True)),
        "cache_hit_lines_per_sec": round(run(packed_cache=True)),
        "cache_hit_warm_lines_per_sec": round(run(packed_cache=True)),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
