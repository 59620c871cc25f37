"""Mesh-sharded lazy (touched-rows) table updates.

This composes the two PS-behavior replacements — row-sharded tables over
the "model" axis (parallel/step.py) and touched-rows-only optimizer
updates (train/sparse.py) — into one train step: the TPU-native
equivalent of the reference's full parameter-server architecture, where
sharded PS variables receive SPARSE gradient pushes for exactly the rows
a batch touched (DeepCvrMTL.py:122 semantics over DeepFM.py:237-282
topology).

Data flow per step (mesh = data × model):
  * the HOST dedups the global batch's ids (data/sparse_batch.py) and
    ships `__uids_<table>` REPLICATED (P()) while the remapped id fields
    shard over "data" as usual;
  * each model shard masked-gathers its rows for the uids; a psum over
    "model" assembles the replicated [S,K] working set (the transpose of
    this gather is NOT differentiated — the loss is differentiated w.r.t.
    the gathered ROWS, so no dense [V,K] cotangent and no scatter-add
    transpose exist anywhere);
  * the data loss is Σ_d local_sum / Σ_d weight, so grad w.r.t. the
    (data-invariant) rows auto-psums over "data": the DP gradient
    all-reduce moves [S_pad,K] — the touched working set — instead of the
    dense path's [V_local,K] per-shard moment traffic;
  * each model shard applies the row optimizer to the uids that fall in
    its row range: out-of-shard and sentinel uids are remapped to
    distinct OOB positions (V_local + slot) and dropped by the scatter.
    Updates are identical on every data replica (SR keys are split from
    the pre-fold rng), so params stay data-invariant — checked by
    shard_map(check_vma=True).

L2 matches the single-chip sparse path: touched-rows-only for tables
(the model's l2_loss sees the gathered rows — replicated, so it is
differentiated separately from the data loss with no collectives; see
parallel/step.py's gradient-layout proof for why the split is load-
bearing).

Multi-host: each host's loader dedups only its local batch slice, so the
harness unions the local sets across hosts first
(data/sparse_batch.GlobalUidsUnion — two host allgathers per table,
issued from the main loop thread so collective order matches the train
step's psums on every host), then places the identical global uids
replicated and the id fields as per-host slices.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tf_repos_tpu.models.base import CtrModel
from tf_repos_tpu.ops.embedding import dense_lookup, make_sharded_lookup
from tf_repos_tpu.parallel.step import (
    DATA_AXIS,
    MODEL_AXIS,
    ShardedState,
    batch_spec,
    make_shardings,
    model_per_example_loss,
    pad_params_for_mesh,
    _spec_tree_like,
)
from tf_repos_tpu.train.sparse import (
    UIDS_PREFIX,
    FusedTableRowOpt,
    SparseRowOpt,
    split_params,
)


def sparse_batch_spec(batch: Dict[str, Any]) -> Dict[str, P]:
    """Data-sharded batch EXCEPT the __uids_* arrays, which carry the
    global unique-id set and are replicated."""
    spec = batch_spec(batch)
    for k in batch:
        if k.startswith(UIDS_PREFIX):
            spec[k] = P()
    return spec


class ShardedSparseState(ShardedState):
    """Sharded (params, {dense, sparse} opt state, mstate) initializer.

    Tables (and their row-optimizer aux arrays) shard over "model"; the
    dense remainder and its optax state replicate — matching the
    reference's PS-variables vs worker-variables split."""

    def __init__(self, model: CtrModel, tx_dense, sopt: SparseRowOpt, mesh,
                 table_dtype=None):
        super().__init__(model, tx_dense, mesh)
        self.sopt = sopt
        self.table_dtype = table_dtype
        self.slot_names = list(model.sparse_slots().keys())

    def place_batch(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        sh = make_shardings(self.mesh, sparse_batch_spec(batch))
        if jax.process_count() > 1:
            # data-sharded fields: per-host slices; __uids_* replicated —
            # identical on every host after GlobalUidsUnion
            import numpy as np

            return jax.tree.map(
                lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
                dict(batch),
                sh,
            )
        return jax.device_put(batch, sh)

    def place_stacked(self, stacked: Dict[str, Any]) -> Dict[str, jax.Array]:
        """Place a [K, B_local, ...] stacked mapped group: data fields
        assembled across hosts over "data", __uids_* ([K, S]) replicated
        (identical on every host after GlobalUidsUnion per group batch)."""
        sh = make_shardings(self.mesh, stacked_sparse_batch_spec(stacked))
        if jax.process_count() > 1:
            import numpy as np

            return jax.tree.map(
                lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
                dict(stacked),
                sh,
            )
        return jax.device_put(stacked, sh)

    def init(self, rng: jax.Array):
        model, tx, mesh, sopt = self.model, self.tx, self.mesh, self.sopt

        p_shapes, m_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
        pspec = _spec_tree_like(p_shapes, model.param_spec())

        def _build(rng):
            params, mstate = model.init(rng)
            params = pad_params_for_mesh(params, pspec, self.n_model)
            if self.table_dtype is not None:
                for t in self.slot_names:
                    params[t] = params[t].astype(self.table_dtype)
            tables, rest = split_params(params, self.slot_names)
            opt_state = {
                "dense": tx.init(rest),
                "sparse": {t: sopt.init(tab) for t, tab in tables.items()},
            }
            return {"params": params, "opt_state": opt_state, "mstate": mstate}

        shapes = jax.eval_shape(_build, rng)
        pspec_full = _spec_tree_like(shapes["params"], model.param_spec())
        # sparse aux arrays mirror their table's leading (vocab) axis ->
        # same row sharding; scalars (Adam "t") replicate
        sspec = {
            t: jax.tree.map(
                lambda x: P(MODEL_AXIS, *([None] * (len(x.shape) - 1)))
                if len(x.shape) >= 1
                else P(),
                aux,
            )
            for t, aux in shapes["opt_state"]["sparse"].items()
        }
        ospec = {
            "dense": jax.tree.map(lambda _: P(), shapes["opt_state"]["dense"]),
            "sparse": sspec,
        }
        mspec = jax.tree.map(lambda _: P(), shapes["mstate"])
        specs = {"params": pspec_full, "opt_state": ospec, "mstate": mspec}
        shardings = {k: make_shardings(mesh, v) for k, v in specs.items()}
        state = jax.jit(_build, out_shardings=shardings)(rng)
        return state, specs


def build_sharded_sparse_train_step(
    model: CtrModel,
    tx_dense: optax.GradientTransformation,
    sopt: SparseRowOpt,
    mesh,
    specs: Dict[str, Any],
    inner_lookup=None,
):
    """(state, batch, rng) -> (state, loss). Batches must come through
    data/sparse_batch.SparseBatchMapper (global uids + remapped ids).
    ``inner_lookup`` overrides the model's inner (remapped-id) lookup
    into the replicated [S_pad,K] working set — e.g. the Pallas VMEM
    expand of ops/pallas_sparse.py (--pallas_expand): the compact rows
    are per-device replicated, so each device runs the same kernel on
    its local batch shard; no collective crosses the kernel."""
    pspec, ospec, mspec = specs["params"], specs["opt_state"], specs["mstate"]
    step = _make_sparse_step_body(model, tx_dense, sopt, inner_lookup)

    def wrapped(state, batch, rng):
        bspec = sparse_batch_spec(batch)
        sharded = shard_map(
            step,
            mesh=mesh,
            in_specs=(pspec, ospec, mspec, bspec, P()),
            out_specs=(pspec, ospec, mspec, P()),
            check_vma=True,
        )
        p, o, m, loss = sharded(
            state["params"], state["opt_state"], state["mstate"], batch, rng
        )
        return {"params": p, "opt_state": o, "mstate": m}, loss

    return jax.jit(wrapped, donate_argnums=(0,))


def _make_sparse_step_body(
    model: CtrModel, tx_dense: optax.GradientTransformation, sopt: SparseRowOpt,
    inner_lookup=None,
):
    """Per-device sharded-sparse step body (shared by the single-dispatch
    and scan-batched builders); must run inside shard_map."""
    slots = model.sparse_slots()
    slot_names = list(slots.keys())
    lookup = make_sharded_lookup(MODEL_AXIS)
    row_lookup = inner_lookup if inner_lookup is not None else dense_lookup
    fused_tbl = isinstance(sopt, FusedTableRowOpt)

    def step(params, opt_state, mstate, batch, rng):
        # SR keys must be identical on every device (the same row update
        # runs on each data replica of a model shard) -> split BEFORE the
        # data fold; dropout uses the folded, data-varying key.
        rng, sr_key = jax.random.split(rng)
        drop_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        tables, rest = split_params(params, slot_names)
        u = {t: batch[UIDS_PREFIX + t] for t in slot_names}
        # replicated [S_pad, ...] working set: masked local gather + psum
        # over "model" (sentinels hit zero-valued padding rows).
        # --fused_table: the gather reads each shard's [V_local, 3K]
        # w|m|v storage instead of the table — ONE [S,3K] gather+psum
        # serves both the forward rows (the :K slice) and the optimizer
        # moments, and the write-back below is the matching single
        # scatter per shard. Same 1+1 row-op structure as the single-
        # chip FusedTableRowOpt (train/sparse.py), applied per shard.
        if fused_tbl:
            su = {
                t: lookup(opt_state["sparse"][t]["wmv"], u[t]).astype(
                    jnp.float32
                )
                for t in slot_names
            }
            rows = {
                t: su[t][..., : tables[t].shape[-1]] for t in slot_names
            }
        else:
            rows = {
                t: lookup(tables[t], u[t]).astype(jnp.float32)
                for t in slot_names
            }

        def data_loss_fn(rows, rest):
            p = dict(rest)
            p.update(rows)
            out, new_ms = model.apply(
                p, mstate, batch, train=True, rng=drop_rng, lookup=row_lookup
            )
            per, w = model_per_example_loss(model, out, batch)
            tot_w = jax.lax.psum(jnp.sum(w), DATA_AXIS)
            local = jnp.sum(per * w) / jnp.maximum(tot_w, 1.0)
            return local, new_ms

        (local_loss, new_mstate), (g_rows_d, g_rest_d) = jax.value_and_grad(
            data_loss_fn, argnums=(0, 1), has_aux=True
        )(rows, rest)
        new_mstate = jax.tree.map(lambda x: jax.lax.pmean(x, DATA_AXIS), new_mstate)

        # touched-rows L2, differentiated separately (all inputs
        # replicated -> replicated grads, zero collectives)
        def l2_fn(rows, rest):
            p = dict(rest)
            p.update(rows)
            return model.l2_loss(p)

        l2_val, (g_rows_l2, g_rest_l2) = jax.value_and_grad(
            l2_fn, argnums=(0, 1)
        )(rows, rest)
        g_rows = jax.tree.map(jnp.add, g_rows_d, g_rows_l2)
        g_rest = jax.tree.map(jnp.add, g_rest_d, g_rest_l2)

        upd, new_dense = tx_dense.update(g_rest, opt_state["dense"], rest)
        new_rest = optax.apply_updates(rest, upd)

        shard = jax.lax.axis_index(MODEL_AXIS)
        new_params = dict(new_rest)
        new_sparse = {}
        for i, t in enumerate(slot_names):
            v_local = tables[t].shape[0]
            lo = shard * v_local
            ut = u[t]
            # uids in this shard's REAL row range update here; everything
            # else (other shards' rows, vocab-sentinels, padding rows) maps
            # to a distinct OOB slot and is dropped by the scatter
            in_range = (ut >= lo) & (ut < lo + v_local) & (ut < slots[t].vocab)
            u_loc = jnp.where(
                in_range, ut - lo, v_local + jnp.arange(ut.shape[0], dtype=ut.dtype)
            )
            # fused_table: apply() consumes the replicated gathered
            # [S,3K] rows (every shard computes identical row updates;
            # the scatter at u_loc keeps only this shard's rows)
            new_params[t], new_sparse[t] = sopt.apply(
                opt_state["sparse"][t],
                su[t] if fused_tbl else tables[t],
                u_loc, g_rows[t],
                jax.random.fold_in(sr_key, i),
            )
        return new_params, {"dense": new_dense, "sparse": new_sparse}, new_mstate, (
            jax.lax.psum(local_loss, DATA_AXIS) + l2_val
        )

    return step


def stacked_sparse_batch_spec(batch: Dict[str, Any]) -> Dict[str, P]:
    """Spec for a [K, B, ...] stacked mapped batch: scan axis unsharded,
    batch axis over "data", __uids_* ([K, S]) fully replicated."""
    from tf_repos_tpu.parallel.step import stacked_batch_spec

    spec = stacked_batch_spec(batch)
    for k in batch:
        if k.startswith(UIDS_PREFIX):
            spec[k] = P()
    return spec


def build_sharded_sparse_multi_train_step(
    model: CtrModel,
    tx_dense: optax.GradientTransformation,
    sopt: SparseRowOpt,
    mesh,
    specs: Dict[str, Any],
    k: int,
    inner_lookup=None,
):
    """K sharded sparse steps per dispatch (lax.scan inside shard_map) —
    same contract as train/sparse.build_sparse_multi_train_step."""
    pspec, ospec, mspec = specs["params"], specs["opt_state"], specs["mstate"]
    step = _make_sparse_step_body(model, tx_dense, sopt, inner_lookup)

    def multi(params, opt_state, mstate, stacked, rng):
        subs = jax.random.split(rng, k)

        def one(carry, xs):
            p, o, m = carry
            batch, sub = xs
            p, o, m, loss = step(p, o, m, batch, sub)
            return (p, o, m), loss

        (params, opt_state, mstate), losses = jax.lax.scan(
            one, (params, opt_state, mstate), (stacked, subs)
        )
        return params, opt_state, mstate, losses

    def wrapped(params, opt_state, mstate, stacked, rng):
        bspec = stacked_sparse_batch_spec(stacked)
        sharded = shard_map(
            multi,
            mesh=mesh,
            in_specs=(pspec, ospec, mspec, bspec, P()),
            out_specs=(pspec, ospec, mspec, P()),
            check_vma=True,
        )
        return sharded(params, opt_state, mstate, stacked, rng)

    return jax.jit(wrapped, donate_argnums=(0, 1, 2))
