"""Standalone benchmark of the VMEM expand/accumulate kernels
(ops/pallas_sparse.py) vs the XLA ops they replace, at the headline
dedup operating point: S_pad compact rows, N = B*F = 426k remapped
indices, K = 17 (fused [1+16] table width).

    timeout 900 python scripts/bench_pallas_sparse.py [--n 30]
                [--s_pad 32768] [--chunk 8192] [--unroll 8]

Prints one JSON line. Timing methodology = bench_components.py: each
op runs inside ONE jitted fori_loop with data-dependent iterations, so
the dev tunnel's per-dispatch overhead and caching don't corrupt it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(body, n):
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
    return (time.perf_counter() - t0) / n * 1e3


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--fields", type=int, default=26)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--s_pad", type=int, default=32768)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--unroll", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.ops import pallas_sparse as PS

    N = a.b * a.fields
    rng = np.random.default_rng(0)
    # Zipf ids over the Criteo vocab, deduped to realistic unique counts,
    # then remapped to compact positions — exactly what the sparse
    # mapper ships to the device
    raw = np.minimum(rng.zipf(1.2, size=(N,)), 117_580).astype(np.int64)
    uniq, inv = np.unique(raw, return_inverse=True)
    s_used = uniq.size
    assert s_used <= a.s_pad, (s_used, a.s_pad)
    table = jnp.asarray(rng.standard_normal((a.s_pad, a.k)), jnp.float32)
    idx = jnp.asarray(inv, jnp.int32)
    g = jnp.asarray(rng.standard_normal((N, a.k)), jnp.float32)

    out = {
        "backend": jax.default_backend(),
        "N": N, "K": a.k, "s_used": int(s_used), "s_pad": a.s_pad,
        "chunk": a.chunk, "unroll": a.unroll, "n": a.n,
    }

    interp = jax.default_backend() == "cpu"

    out["pl_expand_ms"] = round(timed(
        lambda i: jnp.sum(PS.expand_rows(
            table * (1.0 + 0.001 * i), idx, chunk=a.chunk,
            unroll=a.unroll, interpret=interp)[0]),
        a.n), 3)

    out["xla_expand_ms"] = round(timed(
        lambda i: jnp.sum(PS.expand_reference(
            table * (1.0 + 0.001 * i), idx)[0]),
        a.n), 3)

    out["pl_accum_ms"] = round(timed(
        lambda i: jnp.sum(PS.accumulate_rows(
            g * (1.0 + 0.001 * i), idx, a.s_pad, chunk=a.chunk,
            unroll=a.unroll, interpret=interp)[0]),
        a.n), 3)

    out["xla_accum_ms"] = round(timed(
        lambda i: jnp.sum(PS.accumulate_reference(
            g * (1.0 + 0.001 * i), idx, a.s_pad)[0]),
        a.n), 3)

    # fwd+bwd through the custom_vjp lookup vs the plain XLA lookup —
    # what the training step actually pays
    lookup = PS.make_vmem_expand_lookup(chunk=a.chunk, unroll=a.unroll)
    ids2d = idx.reshape(a.b, a.fields)
    # row-dependent weight so the backward is a REAL per-row scatter (a
    # constant cotangent lets XLA shortcut the segment-sum entirely)
    w = jnp.asarray(
        rng.standard_normal((a.b, a.fields, a.k)), jnp.float32
    )

    def fb(fn):
        def body(i):
            def loss(t):
                return jnp.sum(fn(t * (1.0 + 0.001 * i), ids2d) * w)
            l, gr = jax.value_and_grad(loss)(table)
            return l + gr[0, 0]
        return body

    if not interp:
        out["pl_lookup_fwdbwd_ms"] = round(timed(fb(lookup), a.n), 3)
        out["xla_lookup_fwdbwd_ms"] = round(
            timed(fb(lambda t, i: t[i]), a.n), 3)

    out["pl_expand_ns_per_row"] = round(out["pl_expand_ms"] * 1e6 / N, 2)
    out["pl_accum_ns_per_row"] = round(out["pl_accum_ms"] * 1e6 / N, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
