"""Microbench: segment-accumulate formulations above the VMEM row cap.

At the published Ali-CCP operating point (B=4096, ~1.2M live multi-hot
slots -> COO bucket M=2,097,152; ~108k-260k unique ids -> compact rows
S above VMEM_ROW_CAP=49,152) every COO pool and lookup backward falls
back to XLA scatter-add, which bench_published.py shows dominating the
step. Candidates measured here:

  xla_scatter_S    zeros([S,K]).at[idx].add(rows)   (current fallback)
  packed_S         accumulate_rows_packed: lane-packed [S*K/128, 128]
                   f32 VMEM accumulator (S*K*4B <= 24MB at K=16 covers
                   S <= ~390k)
  xla_scatter_G    scatter into the SMALL pooled output [20480, K]
  streamed_G       accumulate_rows (existing kernel; out fits the cap)
                   fed by an XLA gather — the cap-free fwd pool form
  xla_gather       table[idx] at S (the fwd cost floor)

Run on the real chip: timeout 900 python scripts/bench_scatter_cap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.ops import pallas_sparse as PS

    M, S, G, K = 2_097_152, 131_072, 20_480, 16
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, S, size=(M,)), jnp.int32)
    dest = jnp.asarray(rng.integers(0, G, size=(M,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((M,)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((S, K)), jnp.float32)

    @jax.jit
    def xla_scatter_S(rows, idx):
        return jnp.zeros((S, K), jnp.float32).at[idx].add(rows)

    @jax.jit
    def xla_scatter_G(rows, dest):
        return jnp.zeros((G, K), jnp.float32).at[dest].add(rows)

    @jax.jit
    def xla_gather(table, idx, w):
        return table[idx] * w[:, None]

    def packed_S(rows, idx):
        return PS.accumulate_rows_packed(rows, idx, S)

    def streamed_G(rows, dest):
        return PS.accumulate_rows(rows, dest, G)

    def fused_pool_G(table, idx, dest, w):
        # the cap-free fwd pool: XLA gather feeds the streamed accumulate
        return PS.accumulate_rows(table[idx] * w[:, None], dest, G)

    cells = {
        "xla_scatter_S": lambda: xla_scatter_S(rows, idx),
        "packed_S": lambda: packed_S(rows, idx),
        "xla_scatter_G": lambda: xla_scatter_G(rows, dest),
        "streamed_G": lambda: streamed_G(rows, dest),
        "xla_gather": lambda: xla_gather(table, idx, w),
        "fused_pool_G": lambda: fused_pool_G(table, idx, dest, w),
        "xla_pool_G": lambda: xla_scatter_G(xla_gather(table, idx, w), dest),
    }
    out = {}
    for name, fn in cells.items():
        try:
            r = fn()
            float(r.sum())  # axon sync
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                r = fn()
            float(r.sum())
            ms = (time.perf_counter() - t0) / n * 1e3
            out[name] = round(ms, 2)
        except Exception as e:  # Mosaic rejection is a result, not a crash
            out[name] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({name: out[name]}), flush=True)
    # correctness cross-checks on-device
    ok_packed = bool(
        jnp.allclose(
            PS.accumulate_rows_packed(rows[:65536], idx[:65536], S),
            jnp.zeros((S, K), jnp.float32).at[idx[:65536]].add(rows[:65536]),
            rtol=1e-4, atol=1e-4,
        )
    ) if not isinstance(out.get("packed_S"), str) else False
    out["packed_matches_xla"] = ok_packed
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
