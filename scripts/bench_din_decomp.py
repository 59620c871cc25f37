"""DIN published-regime step DECOMPOSITION (VERDICT r4 item 3).

The round-4 DIN cell (4.5M vocab, B=4096, published lengths, mh_coo +
mh_bucket + fused table) reached 109.6 ms while ESMM hit 58.1 — and the
verdict flagged that DIN's remaining time had no published fwd/bwd/opt
split to guide an attack. This script produces that split on the real
chip, plus standalone microbenches of the attention legs:

  step        the full train step (fwd + bwd + row optimizer)
  fwd         loss evaluation only (train=True forward)
  fwd_bwd     value_and_grad, no optimizer application
  [opt        = step - fwd_bwd, the row gather/scatter + Adam leg]

  att_mlp_f / att_mlp_fb   the attention MLP over the live COO slots
                           [M, 3K] -> 256 -> 1, forward / fwd+grad
  segsum / segsum_grad     one [M,K] -> [G,K] segment accumulate and its
                           cotangent gather
  expand                   the [M,K] row expand rows[idx] feeding it

Run on the real chip:  timeout 1800 python scripts/bench_din_decomp.py
CPU sanity:            JAX_PLATFORMS=cpu python scripts/bench_din_decomp.py --small
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_repos_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

from bench_published import make_batches  # noqa: E402


def _sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[-1]
    float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def _timeit(f, args, n=12):
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

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.ragged import MH_PAIRS
    from tf_repos_tpu.data.sparse_batch import (
        MhCooPacker,
        MhPadBucketer,
        SparseBatchMapper,
    )
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.ops.pallas_sparse import make_vmem_expand_lookup
    from tf_repos_tpu.train import sparse as SP
    from tf_repos_tpu.train.optimizers import make_optimizer

    if small:
        jax.config.update("jax_platforms", "cpu")
        vocab, b, pad, scale, n = 50_000, 64, 16, 0.05, 3
    else:
        vocab, b, pad, scale, n = 4_500_000, 4096, 512, 1.0, 12

    cfg = Config(
        model="DIN", feature_size=vocab, field_size=11,
        embedding_size=16, deep_layers="256,128", attention_layers="256",
        dropout="1.0,1.0", batch_size=b, learning_rate=0.0005,
        l2_reg=0.0001, optimizer="Adam", multi_hot_pad=pad,
        compute_dtype="bfloat16", attention_pooling=True,
    )
    model = create_model(cfg)
    raw = make_batches("DIN", vocab, b, pad, 1.2, scale=scale)
    bucketer, packer = MhPadBucketer(MH_PAIRS), MhCooPacker(model.mh_coo_groups())
    mapper = SparseBatchMapper(model.sparse_slots())
    host = [mapper(packer(bucketer(dict(x)))) for x in raw]
    dev = [jax.tree.map(jnp.asarray, x) for x in host]
    M = int(host[0]["__mhc_idx"].shape[-1])
    S = int(host[0]["__uids_emb"].shape[-1])
    out = {"M_bucket": M, "uids_bucket": S}

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    lookup = make_vmem_expand_lookup()
    results = {}
    for variant in ("fused_table", "dma"):
        sopt = SP.make_sparse_row_optimizer(
            cfg.optimizer, cfg.learning_rate, fused_table=True,
            dma_scatter=variant == "dma",
        )
        params, mstate = model.init(jax.random.PRNGKey(0))
        if variant == "fused_table":
            params = SP.cast_tables(model, params, jnp.bfloat16)
        opt_state = SP.init_opt_state(model, tx, sopt, params)
        step = SP.build_sparse_train_step(model, tx, sopt, lookup=lookup)
        for d in dev:
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, d, jax.random.PRNGKey(1)
            )
        _sync(loss)

        # fwd / fwd+bwd on the same fused working set
        slot_names = list(model.sparse_slots().keys())
        tables, rest = SP.split_params(params, slot_names)
        u = {t: dev[0][SP.UIDS_PREFIX + t] for t in slot_names}

        def fwd_only(opt_state, rest, batch):
            su = {
                t: SP.take_rows_f32(opt_state["sparse"][t]["wmv"], u[t])
                for t in slot_names
            }
            rows = {t: su[t][..., : tables[t].shape[-1]] for t in slot_names}
            p = dict(rest)
            p.update(rows)
            loss, _ = model.loss(
                p, mstate, batch, train=True, rng=jax.random.PRNGKey(1),
                lookup=lookup,
            )
            return loss

        def fwd_bwd(opt_state, rest, batch):
            su = {
                t: SP.take_rows_f32(opt_state["sparse"][t]["wmv"], u[t])
                for t in slot_names
            }
            rows = {t: su[t][..., : tables[t].shape[-1]] for t in slot_names}

            def lf(rows, rest):
                p = dict(rest)
                p.update(rows)
                loss, _ = model.loss(
                    p, mstate, batch, train=True, rng=jax.random.PRNGKey(1),
                    lookup=lookup,
                )
                return loss

            (loss), grads = jax.value_and_grad(lf, argnums=(0, 1))(rows, rest)
            return loss, grads

        jf = jax.jit(fwd_only)
        jfb = jax.jit(fwd_bwd)
        t_fwd = _timeit(jf, (opt_state, rest, dev[0]), n=n)
        t_fb = _timeit(jfb, (opt_state, rest, dev[0]), n=n)
        # the step donates its state: time it last, threading outputs
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, dev[0], jax.random.PRNGKey(1)
            )
        _sync(loss)
        t_step = (time.perf_counter() - t0) / n * 1e3
        results[variant] = {
            "step_ms": round(t_step, 2),
            "fwd_ms": round(t_fwd, 2),
            "fwd_bwd_ms": round(t_fb, 2),
            "opt_ms": round(t_step - t_fb, 2),
            "examples_per_sec": round(b / (t_step / 1e3), 1),
        }
    out["legs"] = results

    # ---- attention-leg microbenches at the real M/S/K
    K = cfg.embedding_size
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(S, K)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, M), jnp.int32)
    dest = jnp.asarray(np.sort(rng.integers(0, b * 5, M)), jnp.int32)
    xatt = jnp.asarray(rng.normal(size=(M, 3 * K)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3 * K, 256)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(256, 1)) * 0.05, jnp.bfloat16)

    expand = jax.jit(lambda r, i: r[i])
    mlp = jax.jit(lambda x, a, c: jax.nn.sigmoid((jax.nn.relu(x @ a)) @ c))

    def mlp_loss(x, a, c):
        return jnp.sum(jax.nn.sigmoid((jax.nn.relu(x @ a)) @ c).astype(jnp.float32))

    mlp_g = jax.jit(jax.grad(mlp_loss, argnums=(0, 1, 2)))
    seg = jax.jit(
        lambda g, d: jnp.zeros((b * 5, K), jnp.float32).at[d].add(g)
    )
    segT = jax.jit(lambda ct, d: ct[d])
    g = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b * 5, K)), jnp.float32)

    out["micro"] = {
        "expand_ms": round(_timeit(expand, (rows, idx), n=n), 2),
        "att_mlp_f_ms": round(_timeit(mlp, (xatt, w1, w2), n=n), 2),
        "att_mlp_fb_ms": round(_timeit(mlp_g, (xatt, w1, w2), n=n), 2),
        "segsum_ms": round(_timeit(seg, (g, dest), n=n), 2),
        "segsum_T_ms": round(_timeit(segT, (ct, dest), n=n), 2),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
