"""Component-level decomposition of the headline DeepFM step (bench.py
operating point: B=16384, 117,581-row fused [V,17] table, 26 gathered
fields, bf16 towers) — measures each hot op in isolation on the real
chip so PERF.md's roofline/speed-of-light accounting is measurement, not
estimate:

  gather      [B*26] random rows from [V,17]           (forward lookup)
  scatter     scatter-add [B*26, 17] cotangents         (backward table grad)
  seg_gather  same gather at the deduped row count      (sparse-path read)
  adam        dense Adam moment update on [V,17]        (optimizer traffic)
  towers      256,128,64 MLP fwd+bwd at bf16            (MXU leg)
  fm          FM second-order + first-order              (vector leg)

    timeout 600 python scripts/bench_components.py [--n 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(body, n=50):
    """Time `body(i) -> scalar` repeated n times INSIDE one jitted
    fori_loop (accumulating the scalar so iterations are data-dependent
    and can't be CSE'd/cached away). One dispatch per measurement: the
    dev tunnel's per-dispatch overhead and its dispatch-level caching of
    repeated identical calls both corrupt loop-in-Python timing (the
    same gather measured 17/31/81 ms across runs that way)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n_):
        def step(i, acc):
            return acc + body(i)
        return jax.lax.fori_loop(0, n_, step, jnp.float32(0))

    float(run(2))  # compile + axon sync
    t0 = time.perf_counter()
    float(run(n))
    base = time.perf_counter() - t0
    return base / n * 1e3


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=50)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, V, K, F = 16384, 117_581, 17, 26
    R = B * F  # gathered rows per step
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    table = jnp.asarray(rng.standard_normal((V, K)), jnp.float32)
    ids = jnp.asarray(np.minimum(rng.zipf(1.2, size=(R,)), V - 1), jnp.int32)
    cots = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)
    uniq = int(np.unique(np.asarray(ids)).size)
    s_pad = 1 << (uniq - 1).bit_length()
    uids = jnp.asarray(
        np.pad(np.unique(np.asarray(ids)), (0, s_pad - uniq), constant_values=V),
        jnp.int32,
    )

    out = {"B": B, "V": V, "K": K, "fields": F, "rows_per_step": R,
           "uniq_rows": uniq, "n": a.n}

    # each body depends on i (rotated ids / scaled inputs) so no two
    # iterations compute the same thing
    out["gather_ms"] = round(
        timed(lambda i: jnp.sum(jnp.take(table, ids + (i % 2), axis=0)), a.n), 3
    )

    out["scatter_add_ms"] = round(
        timed(lambda i: jnp.sum(table.at[ids + (i % 2)].add(cots)[0]), a.n), 3
    )

    out["seg_gather_ms"] = round(
        timed(lambda i: jnp.sum(jnp.take(table, uids - (i % 2), axis=0)), a.n), 3
    )

    grad = jnp.asarray(rng.standard_normal((V, K)), jnp.float32)

    def adam_cell(i):
        gr = grad * (1.0 + 0.001 * i)
        m = 0.9 * table + 0.1 * gr
        v = 0.999 * jnp.abs(table) + 0.001 * jnp.square(gr)
        return jnp.sum((table - 5e-4 * m / (jnp.sqrt(v) + 1e-8))[0])

    out["adam_dense_ms"] = round(timed(adam_cell, a.n), 3)

    from tf_repos_tpu.ops import towers as T

    mlp, mlp_state = T.init_mlp(key, 624, [256, 128, 64])
    x = jnp.asarray(rng.standard_normal((B, 624)), jnp.float32)

    def tower_cell(i):
        def f(p):
            h, _ = T.apply_mlp(p, mlp_state, x * (1.0 + 0.001 * i),
                               keep_probs=[1.0, 1.0, 1.0], train=True,
                               rng=key, compute_dtype=jnp.bfloat16)
            return jnp.sum(h)
        l, gr = jax.value_and_grad(f)(mlp)
        return l + jnp.sum(gr["layers"][0]["dense"]["b"])

    out["towers_fwd_bwd_ms"] = round(timed(tower_cell, a.n), 3)

    from tf_repos_tpu.ops.interactions import fm_second_order

    emb = jnp.asarray(rng.standard_normal((B, 39, 16)), jnp.float32)

    def fm_cell(i):
        l, g = jax.value_and_grad(lambda e: jnp.sum(fm_second_order(e)))(
            emb * (1.0 + 0.001 * i)
        )
        return l + jnp.sum(g[0])

    out["fm_fwd_bwd_ms"] = round(timed(fm_cell, a.n), 3)

    # HBM-traffic speed-of-light for the two transaction-bound ops:
    # rows are 68B (17 f32) but HBM serves ~512B granules on random rows
    hbm_gbs = 819.0  # v5e spec
    out["gather_sol_ms_512B_granule"] = round(R * 512 / (hbm_gbs * 1e6), 3)
    out["gather_bytes_mb"] = round(R * K * 4 / 1e6, 1)
    out["gather_ns_per_row"] = round(out["gather_ms"] * 1e6 / R, 2)
    out["scatter_ns_per_row"] = round(out["scatter_add_ms"] * 1e6 / R, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
