"""Touched-rows-only ("lazy") optimizer updates for big embedding tables.

Why (VERDICT r1 items 2+4; reference pain point DeepMTL/README.md:43-45,
DeepCvrMTL.py:122): dense optax updates rewrite every moment row of a
[V,K] table each step (~5.3 ms/step measured at 4.5M x 16 on v5e), and
the backward pass materializes a dense [V,K] cotangent through an XLA
scatter that is erratic at this vocab (39-435 ms for the same op). The
reference's async parameter server only ever updated the rows a worker
pushed — this module restores that behavior on TPU, exactly.

TPU-first design — every stage avoids the ops measured pathological on
v5e (CLAUDE.md): no TPU sort (jnp.sort of 342k int32 took 12 s), no
V-sized scatter-add:

  1. The HOST loader dedups the batch's ids with an O(V+N) flag array
     (data/sparse_batch.py, pipelined with TPU compute in the prefetch
     thread) and ships `__uids_<table>` (unique rows, sentinel-padded to
     a static size) plus the id fields REMAPPED to positions into it.
  2. The device gathers the S unique rows and differentiates the loss
     W.R.T. THOSE ROWS: the model sees a small [S,K] "table" and the
     remapped ids, so the backward segment-sum lands in an [S,K] buffer.
     A dense [V,K] cotangent is never materialized.
  3. Adam/Adagrad/FTRL/SGD run on the S rows only — moment tensors stay
     [V,K] in HBM but only S rows are read and written back (unique ids
     => collision-free .set; sentinel rows use scatter mode="drop").

Semantics = TF LazyAdam / the reference's async-PS updates: untouched
rows keep stale moments and do not move; Adam bias correction uses the
global step count. L2 regularization applies to the TOUCHED rows only
(the model's l2_loss sees the gathered rows) — the same gradients a PS
receives when the regularizer is attached to the gathered embeddings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tf_repos_tpu.ops.rounding import maybe_round

UIDS_PREFIX = "__uids_"


def take_rows(a: jax.Array, u: jax.Array) -> jax.Array:
    """Gather rows at u; sentinel (out-of-range) rows come back zero, so
    they contribute nothing to touched-row L2 and get zero gradients.

    CONTRACT: u is ascending and duplicate-free (data/sparse_batch.py
    builds it from a flag-array flatnonzero, sentinel-padded at the end)
    — the sorted/unique flags let XLA skip its conservative scatter/
    gather lowering."""
    return a.at[u].get(
        mode="fill", fill_value=0, unique_indices=True, indices_are_sorted=True
    )


def take_rows_f32(a: jax.Array, u: jax.Array) -> jax.Array:
    """Gather + upcast: bf16-stored tables move half the HBM bytes per
    gather; all row math runs in f32."""
    return take_rows(a, u).astype(jnp.float32)


def put_rows(a: jax.Array, u: jax.Array, rows: jax.Array) -> jax.Array:
    """Scatter rows back at u (unique => collision-free); sentinel rows
    are dropped. With donated inputs XLA performs this in place. Same
    sorted/unique contract as take_rows."""
    return a.at[u].set(
        rows, mode="drop", unique_indices=True, indices_are_sorted=True
    )


def take_rows_unsorted_f32(a: jax.Array, u: jax.Array) -> jax.Array:
    """take_rows_f32 without the ascending claim — the sharded path maps
    out-of-shard ids to distinct OOB positions (V_local + slot index),
    which breaks monotonicity but keeps uniqueness. OOB must be POSITIVE:
    negative indices WRAP under mode="fill"/"drop" (measured), they are
    not treated as out-of-bounds."""
    return a.at[u].get(
        mode="fill", fill_value=0, unique_indices=True, indices_are_sorted=False
    ).astype(jnp.float32)


def put_rows_unsorted(a: jax.Array, u: jax.Array, rows: jax.Array) -> jax.Array:
    """put_rows without the ascending claim (see take_rows_unsorted_f32)."""
    return a.at[u].set(
        rows, mode="drop", unique_indices=True, indices_are_sorted=False
    )


class SparseRowOpt(NamedTuple):
    """A lazy row-wise optimizer for one [V, ...] table. Row math is f32
    regardless of storage dtype; writes back in the table's/moments'
    dtype — stochastically rounded for bf16 (ops/rounding.py), so small
    updates survive in expectation."""

    init: Callable[[jax.Array], Any]  # table -> aux state pytree
    # (aux, table, u, g_rows, key) -> (new_table, new_aux)
    apply: Callable[
        [Any, jax.Array, jax.Array, jax.Array, jax.Array], Tuple[jax.Array, Any]
    ]


class FusedTableRowOpt(SparseRowOpt):
    """SparseRowOpt whose storage FUSES the table into the moment array:
    aux["wmv"] = [V, 3K] rows (w | m | v). The step then does ONE row
    gather and ONE row scatter per table instead of 2 gathers + 2
    scatters — and the vocab-row SCATTER is the single most expensive
    op of the large-vocab step (measured on v5e at V=4.5M, S=131k:
    .at[u].set 15.4 ms for [V,K] / 18.7 ms for [V,2K], vs 4.5/5.8 ms
    for the gathers; the optimizer leg was 33 ms of the 72 ms published
    ESMM step). Row ops are transaction-bound, so one 3K-wide
    scatter costs about one K-wide scatter.

    Protocol change (train/sparse._sparse_step_body understands it via
    isinstance): the forward gathers [S, 3K] from aux["wmv"] once; the
    model consumes su[:, :K]; apply() receives the SAME gathered su (no
    re-gather) and writes concat(w1, m1, v1) back with one put. The
    params entry for the table is refreshed as wmv[:, :K] each step
    (~0.7 ms at 4.5M x 16 bf16 — a strided row copy), so eval /
    checkpoint / export paths are unchanged. The checkpoint carries the
    table twice (params + wmv); layouts don't interchange with
    fused_moments or the plain layout.

    Mesh-aware (round 5): under a model-sharded mesh each shard stores
    [V_local, 3K] and the sharded step (parallel/sparse_step.py) gathers
    [S,3K] with the masked-gather+psum lookup, then scatters this
    shard's rows back — the same 1+1 row-op structure per shard, vs the
    unfused sharded layout's 2 gathers + 2 scatters."""


def make_sparse_row_optimizer(
    name: str,
    learning_rate: float,
    fused_moments: bool = False,
    sorted_indices: bool = True,
    fused_table: bool = False,
    catchup: bool = False,
    dma_scatter: bool = False,
) -> SparseRowOpt:
    """Same hyperparameters as train/optimizers.make_optimizer (the
    reference's exact settings, DeepFM.py:204-211), applied lazily.

    fused_moments: for two-slot optimizers (Adam m/v, FTRL n/z) store the
    moments row-interleaved in one [V, 2K] array so each step does ONE
    moment gather + ONE moment scatter instead of two of each. Row access
    at big vocab is HBM-transaction-bound (K=128 gather measured only 22%
    slower than K=16 on v5e), so halving the op count beats halving the
    width. State layout changes ([V,2K] "mv"/"nz" key) — checkpoints are
    not interchangeable with the unfused layout.

    fused_table: go one further — fuse the TABLE into the same array
    ([V, 3K] = w|m|v, see FusedTableRowOpt): 1 gather + 1 scatter per
    step. Adam only (the published large-vocab optimizer); works on one
    chip and per shard under a model-sharded mesh.

    dma_scatter (--dma_scatter, round 5 — the unblocked Pallas DMA
    write-back, VERDICT r4 item 5): store the fused w|m|v rows LANE-
    PADDED to the TPU tile width ([V, L], L = 3K rounded up to 128,
    f32) and replace the XLA vocab-row scatter with per-row async DMA
    copies (ops/pallas_sparse.dma_row_scatter). Measured at V=4.5M,
    S=131k on v5e: the padded layout alone takes the GATHER 7.99 ->
    2.29 ms (512B-aligned rows are the HBM transaction sweet spot;
    unaligned 192B rows straddle transactions) and the XLA scatter
    23.1 -> 15.6; the DMA scatter takes it to 10.96 ms. At small vocab
    (117k, S=32k) XLA is already at 1.3 ms and the DMA path LOSES
    (2.0 ms) — keep this off below ~1M vocab. Costs HBM capacity
    (L/3K = 2.67x at K=16; 2.3 GB at 4.5M x 128 f32) and f32-only
    (bf16 sublane tiling rejects single-row DMA slices; the padded f32
    gather already beats the unpadded bf16 gather 2.3 vs 6.6 ms, so
    bf16 storage has no remaining row-op advantage under padding).
    Requires fused_table.

    catchup (--sparse_catchup, VERDICT r4 item 2): per-row moment
    catch-up that closes the multi-epoch AUC gap of plain lazy Adam.
    Plain lazy semantics freeze a row's m,v while it is untouched; dense
    Adam would have DECAYED them by β each step (zero gradient). With a
    per-row last-touched-step array ([V] int32), on touch the moments
    decay by β^Δ (Δ = steps since last touch) before the gradient term —
    exactly dense Adam's moments under zero-grad gaps — and bias
    correction keeps using the true global step. The one remaining
    deviation from dense (shared with the reference's async PS,
    DeepCvrMTL.py:122): weight micro-updates from residual momentum on
    untouched rows are not applied. Cost: one int32[S] gather + scatter
    + a per-row pow — noise next to the [S,K] row traffic. Adam only
    (Adagrad/FTRL/SGD lazy updates are already exact fixed points of the
    dense update)."""
    gather = take_rows_f32 if sorted_indices else take_rows_unsorted_f32
    put = put_rows if sorted_indices else put_rows_unsorted
    key = name.lower()
    lr = learning_rate
    if catchup and key != "adam":
        raise ValueError(
            f"--sparse_catchup applies to Adam (got {name!r}): the other "
            "sparse-row optimizers are already exact fixed points of the "
            "dense update on untouched rows"
        )
    if dma_scatter and not fused_table:
        raise ValueError(
            "--dma_scatter requires --fused_table (the DMA write-back "
            "replaces the fused [V,L] storage's one scatter; the unfused "
            "layouts keep XLA's)"
        )

    def _gather_i(a, u):
        return a.at[u].get(
            mode="fill", fill_value=0, unique_indices=True,
            indices_are_sorted=sorted_indices,
        )

    def _put_last(last, u, t):
        return last.at[u].set(
            t, mode="drop", unique_indices=True,
            indices_are_sorted=sorted_indices,
        )
    if fused_table:
        if key != "adam":
            raise ValueError(
                f"--fused_table supports Adam (got {name!r}); use "
                "--fused_moments for the other optimizers"
            )
        if fused_moments:
            raise ValueError(
                "--fused_table supersedes --fused_moments (the moments "
                "already live in the fused [V,3K] storage); set only one"
            )
        b1, b2, eps = 0.9, 0.999, 1e-8

        def _lane_pad(k: int) -> int:
            return ((3 * k + 127) // 128) * 128

        def ft_init(table):
            K = table.shape[-1]
            if dma_scatter:
                if table.dtype != jnp.float32:
                    raise ValueError(
                        "--dma_scatter requires f32 tables (bf16 sublane "
                        "tiling rejects single-row DMA slices; the padded "
                        "f32 gather already beats unpadded bf16 — drop "
                        "--param_dtype=bfloat16)"
                    )
                L = _lane_pad(K)
                wmv = jnp.concatenate(
                    [table, jnp.zeros(table.shape[:-1] + (L - K,), table.dtype)],
                    axis=-1,
                )
            else:
                wmv = jnp.concatenate(
                    [table, jnp.zeros(table.shape[:-1] + (2 * K,), table.dtype)],
                    axis=-1,
                )
            aux = {"wmv": wmv, "t": jnp.zeros((), jnp.int32)}
            if catchup:
                aux["last"] = jnp.zeros(table.shape[:-1], jnp.int32)
            return aux

        def ft_apply(aux, su, u, g, key):
            """su: the [S, 3K] (or lane-padded [S, L]) f32 rows ALREADY
            gathered from aux["wmv"] by the step body (the one gather
            serves forward + moments)."""
            kw = key
            t = aux["t"] + 1
            tf32 = t.astype(jnp.float32)
            K = g.shape[-1]
            w0, m0, v0 = (
                su[..., :K], su[..., K : 2 * K], su[..., 2 * K : 3 * K]
            )
            if catchup:
                delta = (t - _gather_i(aux["last"], u)).astype(jnp.float32)
                d1, d2 = jnp.power(b1, delta)[:, None], jnp.power(b2, delta)[:, None]
            else:
                d1, d2 = b1, b2
            m1 = d1 * m0 + (1.0 - b1) * g
            v1 = d2 * v0 + (1.0 - b2) * jnp.square(g)
            m_hat = m1 / (1.0 - jnp.power(b1, tf32))
            v_hat = v1 / (1.0 - jnp.power(b2, tf32))
            w1 = w0 - lr * m_hat / (jnp.sqrt(v_hat) + eps)
            new = jnp.concatenate([w1, m1, v1], axis=-1)
            if dma_scatter:
                from tf_repos_tpu.ops.pallas_sparse import dma_row_scatter

                L = aux["wmv"].shape[-1]
                if L > 3 * K:
                    new = jnp.pad(new, ((0, 0), (0, L - 3 * K)))
                wmv = dma_row_scatter(aux["wmv"], u, new)
            else:
                wmv = put(
                    aux["wmv"], u, maybe_round(new, kw, aux["wmv"].dtype)
                )
            out = {"wmv": wmv, "t": t}
            if catchup:
                out["last"] = _put_last(aux["last"], u, t)
            return wmv[..., :K], out

        return FusedTableRowOpt(ft_init, ft_apply)
    if key == "adam":
        b1, b2, eps = 0.9, 0.999, 1e-8

        if fused_moments:

            def init(table):
                K = table.shape[-1]
                aux = {
                    "mv": jnp.zeros(table.shape[:-1] + (2 * K,), table.dtype),
                    "t": jnp.zeros((), jnp.int32),
                }
                if catchup:
                    aux["last"] = jnp.zeros(table.shape[:-1], jnp.int32)
                return aux

            def apply(aux, table, u, g, key):
                kw, kmv = jax.random.split(key)
                t = aux["t"] + 1
                tf32 = t.astype(jnp.float32)
                K = table.shape[-1]
                mv_u = gather(aux["mv"], u)
                if catchup:
                    delta = (t - _gather_i(aux["last"], u)).astype(jnp.float32)
                    d1, d2 = (
                        jnp.power(b1, delta)[:, None],
                        jnp.power(b2, delta)[:, None],
                    )
                else:
                    d1, d2 = b1, b2
                m_u = d1 * mv_u[..., :K] + (1.0 - b1) * g
                v_u = d2 * mv_u[..., K:] + (1.0 - b2) * jnp.square(g)
                m_hat = m_u / (1.0 - jnp.power(b1, tf32))
                v_hat = v_u / (1.0 - jnp.power(b2, tf32))
                w_u = gather(table, u) - lr * m_hat / (jnp.sqrt(v_hat) + eps)
                mv_new = jnp.concatenate([m_u, v_u], axis=-1)
                out = {
                    "mv": put(
                        aux["mv"], u, maybe_round(mv_new, kmv, aux["mv"].dtype)
                    ),
                    "t": t,
                }
                if catchup:
                    out["last"] = _put_last(aux["last"], u, t)
                return put(table, u, maybe_round(w_u, kw, table.dtype)), out

            return SparseRowOpt(init, apply)

        def init(table):
            aux = {
                "m": jnp.zeros_like(table),
                "v": jnp.zeros_like(table),
                "t": jnp.zeros((), jnp.int32),
            }
            if catchup:
                aux["last"] = jnp.zeros(table.shape[:-1], jnp.int32)
            return aux

        def apply(aux, table, u, g, key):
            kw, km, kv = jax.random.split(key, 3)
            t = aux["t"] + 1
            tf32 = t.astype(jnp.float32)
            if catchup:
                delta = (t - _gather_i(aux["last"], u)).astype(jnp.float32)
                d1, d2 = jnp.power(b1, delta)[:, None], jnp.power(b2, delta)[:, None]
            else:
                d1, d2 = b1, b2
            m_u = d1 * gather(aux["m"], u) + (1.0 - b1) * g
            v_u = d2 * gather(aux["v"], u) + (1.0 - b2) * jnp.square(g)
            m_hat = m_u / (1.0 - jnp.power(b1, tf32))
            v_hat = v_u / (1.0 - jnp.power(b2, tf32))
            w_u = gather(table, u) - lr * m_hat / (jnp.sqrt(v_hat) + eps)
            out = {
                "m": put(aux["m"], u, maybe_round(m_u, km, aux["m"].dtype)),
                "v": put(aux["v"], u, maybe_round(v_u, kv, aux["v"].dtype)),
                "t": t,
            }
            if catchup:
                out["last"] = _put_last(aux["last"], u, t)
            return put(table, u, maybe_round(w_u, kw, table.dtype)), out

        return SparseRowOpt(init, apply)

    if key == "adagrad":
        init_acc = 1e-8

        def init(table):
            return {"a": jnp.full_like(table, init_acc)}

        def apply(aux, table, u, g, key):
            kw, ka = jax.random.split(key)
            a_u = gather(aux["a"], u) + jnp.square(g)
            # sentinel rows gather a=0 -> rsqrt(0)=inf, times g=0 -> NaN;
            # they are dropped at scatter but NaN would poison nothing —
            # still, keep the math finite:
            step = lr * g * jax.lax.rsqrt(jnp.maximum(a_u, init_acc * 1e-3))
            w_u = gather(table, u) - step
            return put(table, u, maybe_round(w_u, kw, table.dtype)), {
                "a": put(aux["a"], u, maybe_round(a_u, ka, aux["a"].dtype))
            }

        return SparseRowOpt(init, apply)

    if key == "ftrl":
        # TF FtrlOptimizer defaults (lr_power=-0.5, init_accum=0.1,
        # l1=l2=0) — the wide/sparse-part optimizer (DeepFM.py:210-211)
        p, init_acc = -0.5, 0.1

        if fused_moments:

            def init(table):
                K = table.shape[-1]
                nz = jnp.zeros(table.shape[:-1] + (2 * K,), table.dtype)
                return {"nz": nz.at[..., :K].set(init_acc)}

            def apply(aux, table, u, g, key):
                kw, knz = jax.random.split(key)
                K = table.shape[-1]
                nz_u = gather(aux["nz"], u)
                n0 = jnp.maximum(nz_u[..., :K], init_acc * 1e-3)
                z0 = nz_u[..., K:]
                w = gather(table, u)
                n1 = n0 + jnp.square(g)
                z1 = z0 + g - ((jnp.power(n1, -p) - jnp.power(n0, -p)) / lr) * w
                w_new = -z1 / (jnp.power(n1, -p) / lr)
                nz_new = jnp.concatenate([n1, z1], axis=-1)
                return put(table, u, maybe_round(w_new, kw, table.dtype)), {
                    "nz": put(
                        aux["nz"], u, maybe_round(nz_new, knz, aux["nz"].dtype)
                    )
                }

            return SparseRowOpt(init, apply)

        def init(table):
            return {
                "n": jnp.full_like(table, init_acc),
                "z": jnp.zeros_like(table),
            }

        def apply(aux, table, u, g, key):
            kw, kn, kz = jax.random.split(key, 3)
            n0 = gather(aux["n"], u)
            n0 = jnp.maximum(n0, init_acc * 1e-3)  # sentinel rows: finite
            w = gather(table, u)
            z0 = gather(aux["z"], u)
            n1 = n0 + jnp.square(g)
            z1 = z0 + g - ((jnp.power(n1, -p) - jnp.power(n0, -p)) / lr) * w
            w_new = -z1 / (jnp.power(n1, -p) / lr)
            return put(table, u, maybe_round(w_new, kw, table.dtype)), {
                "n": put(aux["n"], u, maybe_round(n1, kn, aux["n"].dtype)),
                "z": put(aux["z"], u, maybe_round(z1, kz, aux["z"].dtype)),
            }

        return SparseRowOpt(init, apply)

    if key in ("gd", "sgd"):

        def init(table):
            return {}

        def apply(aux, table, u, g, key):
            w_u = gather(table, u) - lr * g
            return put(table, u, maybe_round(w_u, key, table.dtype)), aux

        return SparseRowOpt(init, apply)

    if key == "momentum":
        mom = 0.95

        def init(table):
            return {"mo": jnp.zeros_like(table)}

        def apply(aux, table, u, g, key):
            kw, kmo = jax.random.split(key)
            mo_u = mom * gather(aux["mo"], u) + g
            w_u = gather(table, u) - lr * mo_u
            return put(table, u, maybe_round(w_u, kw, table.dtype)), {
                "mo": put(aux["mo"], u, maybe_round(mo_u, kmo, aux["mo"].dtype))
            }

        return SparseRowOpt(init, apply)

    raise ValueError(f"no sparse-row variant for optimizer {name!r}")


def split_params(params: Dict[str, Any], slot_names) -> Tuple[Dict, Dict]:
    tables = {t: params[t] for t in slot_names}
    rest = {k: v for k, v in params.items() if k not in tables}
    return tables, rest


def init_opt_state(
    model, tx_dense: optax.GradientTransformation, sopt: SparseRowOpt, params
):
    """Combined optimizer state: optax for the dense part, lazy row state
    for each sparse table."""
    names = model.sparse_slots().keys()
    tables, rest = split_params(params, names)
    return {
        "dense": tx_dense.init(rest),
        "sparse": {t: sopt.init(tab) for t, tab in tables.items()},
    }


def _sparse_step_body(model, tx_dense, sopt, slot_names, params, opt_state, mstate, batch, rng, lookup=None):
    rng, sr_key = jax.random.split(rng)
    tables, rest = split_params(params, slot_names)
    u = {t: batch[UIDS_PREFIX + t] for t in slot_names}
    fused_tbl = isinstance(sopt, FusedTableRowOpt)
    # f32 row math regardless of table storage dtype (bf16 tables
    # halve the gather bytes; the upcast fuses into the gather).
    # fused_table: ONE [S, 3K] gather from the fused w|m|v storage
    # serves both the forward rows AND the optimizer moments.
    if fused_tbl:
        su = {
            t: take_rows_f32(opt_state["sparse"][t]["wmv"], u[t])
            for t in slot_names
        }
        rows = {t: su[t][..., : tables[t].shape[-1]] for t in slot_names}
    else:
        rows = {t: take_rows_f32(tables[t], u[t]) for t in slot_names}

    lookup_kw = {} if lookup is None else {"lookup": lookup}

    def loss_fn(rows, rest):
        p = dict(rest)
        p.update(rows)  # the model sees a small [S,K] "table"
        return model.loss(p, mstate, batch, train=True, rng=rng, **lookup_kw)

    (loss, (_, new_mstate)), (g_rows, g_rest) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(rows, rest)

    upd, new_dense = tx_dense.update(g_rest, opt_state["dense"], rest)
    new_rest = optax.apply_updates(rest, upd)

    new_params = dict(new_rest)
    new_sparse = {}
    for i, t in enumerate(slot_names):
        new_params[t], new_sparse[t] = sopt.apply(
            opt_state["sparse"][t],
            su[t] if fused_tbl else tables[t],
            u[t], g_rows[t],
            jax.random.fold_in(sr_key, i),
        )
    return new_params, {"dense": new_dense, "sparse": new_sparse}, new_mstate, loss


def build_sparse_train_step(
    model, tx_dense: optax.GradientTransformation, sopt: SparseRowOpt,
    lookup=None,
):
    """(params, opt_state, mstate, batch, rng) -> (params, opt_state,
    mstate, loss) — same contract as loop.build_train_step, but batches
    must have passed through data/sparse_batch.SparseBatchMapper (which
    adds __uids_<table> and remaps the id fields). ``lookup`` overrides
    the model's inner (remapped-id) lookup — e.g. the Pallas VMEM expand
    of ops/pallas_sparse.py."""
    slot_names = list(model.sparse_slots().keys())

    def step(params, opt_state, mstate, batch, rng):
        return _sparse_step_body(
            model, tx_dense, sopt, slot_names, params, opt_state, mstate,
            batch, rng, lookup=lookup,
        )

    return jax.jit(step, donate_argnums=(0, 1, 2))


def build_sparse_multi_train_step(
    model, tx_dense: optax.GradientTransformation, sopt: SparseRowOpt, k: int,
    lookup=None,
):
    """K sparse steps per dispatch via lax.scan (host-loop amortization,
    see loop.build_multi_train_step). stacked_batch fields (incl. the
    __uids_* arrays) carry a leading [K] axis."""
    slot_names = list(model.sparse_slots().keys())

    def one(carry, xs):
        params, opt_state, mstate = carry
        batch, sub = xs
        p, o, m, loss = _sparse_step_body(
            model, tx_dense, sopt, slot_names, params, opt_state, mstate,
            batch, sub, lookup=lookup,
        )
        return (p, o, m), loss

    def multi(params, opt_state, mstate, stacked_batch, rng):
        subs = jax.random.split(rng, k)
        (params, opt_state, mstate), losses = jax.lax.scan(
            one, (params, opt_state, mstate), (stacked_batch, subs)
        )
        return params, opt_state, mstate, losses

    return jax.jit(multi, donate_argnums=(0, 1, 2))


def cast_tables(model, params, dtype) -> Dict[str, Any]:
    """Cast the sparse-slot tables to `dtype` (plain round-to-nearest —
    used once at init; training writes use stochastic rounding)."""
    out = dict(params)
    for t in model.sparse_slots():
        out[t] = params[t].astype(dtype)
    return out


def upcast_tables_f32(model, params) -> Dict[str, Any]:
    """f32 view of bf16-stored tables for eval/infer/export paths."""
    out = dict(params)
    for t in model.sparse_slots():
        if out[t].dtype != jnp.float32:
            out[t] = out[t].astype(jnp.float32)
    return out
