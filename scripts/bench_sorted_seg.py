"""Microbench: sorted-window segment kernels vs XLA at the DIN point.

The DIN published-regime decomposition (bench_din_decomp.py) showed the
[M=1.31M,K=16] -> [G=16k,K] segment scatter at 14.6 ms and its
cotangent gather at 5.7 ms on v5e — one HBM transaction per slot. The
sorted-window kernels (ops/pallas_sparse.sorted_segsum/sorted_expand)
reformulate both as windowed one-hot MXU matmuls + contiguous
dynamic-sublane VMEM RMWs using the packer's field-major order
invariant. This prints the head-to-head.

Run on the real chip:  timeout 1200 python scripts/bench_sorted_seg.py
CPU sanity:            JAX_PLATFORMS=cpu python scripts/bench_sorted_seg.py --small
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _sync(x):
    import jax.numpy as jnp

    float(jnp.sum(jnp.ravel(x)[:1]).astype(jnp.float32))


def _timeit(f, args, n=20):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.ops import pallas_sparse as PS

    if small:
        jax.config.update("jax_platforms", "cpu")
        M, G, K, n = 20_000, 1024, 16, 3
    else:
        M, G, K, n = 1_310_720, 16_384, 16, 20

    rng = np.random.default_rng(0)
    # segment lengths ~ the published Ali-CCP mix (heavy fields avg ~250,
    # light ~5): a lognormal mix averaging M/G slots per live segment
    lens = rng.lognormal(mean=np.log(max(M // G, 1)), sigma=1.2, size=G)
    lens = np.maximum((lens * (M / lens.sum())).astype(np.int64), 0)
    lens[-1] += M - lens.sum()
    cdest = np.repeat(np.arange(G, dtype=np.int32), lens)[:M]
    vals = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    valsb = vals.astype(jnp.bfloat16)
    src = jnp.asarray(rng.normal(size=(G, K)).astype(np.float32))
    cd = jnp.asarray(cdest)

    import functools

    xla_seg = jax.jit(
        functools.partial(PS.sorted_segsum_reference, n_out=G)
    )
    pl_seg = jax.jit(functools.partial(PS.sorted_segsum, n_out=G))
    xla_ex = jax.jit(PS.sorted_expand_reference)
    pl_ex = jax.jit(PS.sorted_expand)
    # the scalar-loop VMEM kernel (prior best) for comparison
    acc = jax.jit(functools.partial(PS.accumulate_rows, s=G))

    out = {"M": M, "G": G, "K": K}
    o1, o2 = xla_seg(vals, cd), pl_seg(vals, cd)
    err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o1)) + 1e-9))
    assert err < 1e-5, err
    e1, e2 = xla_ex(src, cd), pl_ex(src, cd)
    assert float(jnp.max(jnp.abs(e1 - e2))) == 0.0
    out["segsum_xla_ms"] = round(_timeit(xla_seg, (vals, cd), n), 2)
    out["segsum_pl_ms"] = round(_timeit(pl_seg, (vals, cd), n), 2)
    out["segsum_pl_bf16_ms"] = round(_timeit(pl_seg, (valsb, cd), n), 2)
    out["segsum_scalarloop_ms"] = round(_timeit(acc, (vals, cd), n), 2)
    out["expand_xla_ms"] = round(_timeit(xla_ex, (src, cd), n), 2)
    out["expand_pl_ms"] = round(_timeit(pl_ex, (src, cd), n), 2)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
