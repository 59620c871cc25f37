"""Jitted step builders: train / eval / predict.

Single-chip and data-parallel-sharded execution share these builders; the
mesh-aware variants (row-sharded tables via shard_map) live in
tf_repos_tpu/parallel/step.py. All steps are pure functions compiled once
(XLA traces f(x) exactly once; no data-dependent Python control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tf_repos_tpu.models.base import CtrModel
from tf_repos_tpu.ops import metrics as M


def build_train_step(model: CtrModel, tx: optax.GradientTransformation, lookup=None):
    """(params, opt_state, mstate, batch, rng) -> (params, opt_state,
    mstate, loss). Donated inputs so the big tables update in place.
    lookup: optional embedding-lookup override (e.g. the Pallas
    field-block custom-vjp lookup, ops/pallas_embedding.py)."""
    from tf_repos_tpu.ops.embedding import dense_lookup

    lookup = lookup or dense_lookup

    def step(params, opt_state, mstate, batch, rng):
        (loss, (_, new_mstate)), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, mstate, batch, train=True, rng=rng, lookup=lookup
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, new_mstate, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))


def build_multi_train_step(
    model: CtrModel, tx: optax.GradientTransformation, k: int, lookup=None
):
    """K training steps per device dispatch via lax.scan.

    (params, opt_state, mstate, stacked_batch [K,B,...], rng) ->
    (params, opt_state, mstate, losses [K]).

    Host-loop amortization: one dispatch + one H2D transfer carries K
    steps, so fixed per-dispatch costs (RPC latency on tunneled/remote
    device topologies, per-transfer latency, Python loop overhead) are
    paid once per K steps instead of per step. On a directly-attached
    chip this is a minor win; through a high-latency control plane it is
    the difference between 2 and 80 steps/sec (measured on this rig's
    axon tunnel at ~0.4-0.6 s fixed per dispatch).
    """
    from tf_repos_tpu.ops.embedding import dense_lookup

    lookup = lookup or dense_lookup

    def step(carry, xs):
        params, opt_state, mstate = carry
        batch, sub = xs
        (loss, (_, new_mstate)), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, mstate, batch, train=True, rng=sub, lookup=lookup
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_opt_state, new_mstate), loss

    def multi(params, opt_state, mstate, stacked_batch, rng):
        subs = jax.random.split(rng, k)
        (params, opt_state, mstate), losses = jax.lax.scan(
            step, (params, opt_state, mstate), (stacked_batch, subs)
        )
        return params, opt_state, mstate, losses

    return jax.jit(multi, donate_argnums=(0, 1, 2))


def stack_batches(batches, uid_sentinels: Optional[Dict[str, int]] = None) -> Dict[str, Any]:
    """[{k: [B,...]}] * K -> {k: [K,B,...]} (one transfer per field).

    uid_sentinels: {"__uids_<table>": vocab, "__mhc_*": 0} — bucketed
    arrays (uids, COO triplets) may differ in LAST-axis length within a
    group when the host mapper's pow2 bucket grew mid-group
    (data/sparse_batch.py); shorter ones are padded along the last axis
    to the group max with the given pad value (vocab = strictly out of
    range for uids, dropped by the device-side scatter; 0 for the COO
    triplet, which adds exactly zero). Last-axis padding keeps the COO
    arrays' per-data-shard layout intact."""
    import numpy as np

    sentinels = uid_sentinels or {}
    out = {}
    for k in batches[0].keys():
        arrs = [b[k] for b in batches]
        if k in sentinels:
            m = max(a.shape[-1] for a in arrs)
            arrs = [
                np.pad(
                    a,
                    [(0, 0)] * (a.ndim - 1) + [(0, m - a.shape[-1])],
                    constant_values=sentinels[k],
                )
                if a.shape[-1] < m
                else a
                for a in arrs
            ]
        out[k] = np.stack(arrs)
    return out


def build_eval_step(model: CtrModel):
    """Accumulates loss and per-metric streaming-AUC counts on device.

    acc = {"loss_sum", "weight_sum", "auc": {name: AucState}}
    """

    def step(params, mstate, acc, batch):
        loss, (out, _) = model.loss(params, mstate, batch, train=False)
        w = batch.get("mask")
        wsum = jnp.sum(w) if w is not None else jnp.float32(batch["label"].shape[0])
        new_auc = {}
        for name, (labels, preds) in model.eval_metrics(out, batch).items():
            new_auc[name] = M.auc_update(acc["auc"][name], labels, preds, w)
        return {
            "loss_sum": acc["loss_sum"] + loss * wsum,
            "weight_sum": acc["weight_sum"] + wsum,
            "auc": new_auc,
        }

    return jax.jit(step, donate_argnums=(2,))


def init_eval_acc(model: CtrModel) -> Dict[str, Any]:
    return {
        "loss_sum": jnp.float32(0.0),
        "weight_sum": jnp.float32(0.0),
        "auc": {name: M.AucState.init() for name in model_metric_names(model)},
    }


def model_metric_names(model: CtrModel):
    """Metric names without running the model: probe eval_metrics with
    dummy arrays (it only builds a dict of (labels, preds) pairs)."""
    dummy_out = {k: jnp.zeros((1,)) for k in ("prob", "logits", "pctr", "pcvr", "pctcvr")}
    dummy_batch = {k: jnp.zeros((1,)) for k in ("label", "y", "z", "mask")}
    try:
        return list(model.eval_metrics(dummy_out, dummy_batch).keys())
    except Exception:
        return ["auc"]


def finalize_eval(acc) -> Dict[str, float]:
    res = {"loss": float(acc["loss_sum"] / jnp.maximum(acc["weight_sum"], 1.0))}
    for name, st in acc["auc"].items():
        res[name] = float(M.auc_finalize(st))
    return res


def build_predict_step(model: CtrModel):
    def step(params, mstate, batch):
        out, _ = model.apply(params, mstate, batch, train=False)
        return {k: out[k] for k in model.prediction_keys}

    return jax.jit(step)
