"""ESMM (DeepCvrMTL) — joint CTR + CVR on the full impression space.

Behavioral spec from /root/reference/DeepMTL/Model_pipeline/DeepCvrMTL.py:
two labels y (click), z (conversion) (:146-148); ONE shared embedding
table over common + multi-hot + ad fields (:152-164; common embeddings
are NOT value-scaled — :154 commented out); two parallel MLP towers CVR
(:166-183) and CTR (:185-203); pCTCVR = pCTR * pCVR (:205-210); loss =
ctr_task_wgt * sigmoid_CE(y_ctr; y) + (1-wgt) * log_loss(pctcvr; z) +
l2_reg * l2_loss(Feat_Emb) (:219-223); metrics CTR_AUC(y,pctr),
CVR_AUC(z,pcvr), CTCVR_AUC(z,pctcvr) (:229-233).

Batch contract is the same ragged/padded Ali-CCP layout as DIN plus both
labels: {"y": f32[B], "z": f32[B]}.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tf_repos_tpu.models.base import (
    SparseSlot,
    MODEL_AXIS_SPEC,
    Batch,
    CtrModel,
    Outputs,
    Params,
    State,
)
from tf_repos_tpu.ops import metrics as M
from tf_repos_tpu.ops import towers as T
from tf_repos_tpu.ops.embedding import dense_lookup, glorot_normal_init, xla_coo_pool

USER_FIELDS = ("u_cat", "u_shop", "u_brand", "u_int")

# --mh_coo group order (data/sparse_batch.MhCooPacker): 4 val-weighted
# user behavior fields + the mask-only ad intention field. The COO dest
# is b * len(groups) + group_index in THIS order.
MH_COO_GROUPS = (
    ("u_cat", True), ("u_shop", True), ("u_brand", True), ("u_int", True),
    ("a_int", False),
)


class ESMM(CtrModel):
    name = "ESMM"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k = cfg.embedding_size
        keys = jax.random.split(rng, 5)
        layers = cfg.deep_layers_list
        mlp_in = cfg.field_size * k + 8 * k
        cvr_mlp, cvr_state = T.init_mlp(keys[1], mlp_in, layers, batch_norm=cfg.batch_norm)
        ctr_mlp, ctr_state = T.init_mlp(keys[2], mlp_in, layers, batch_norm=cfg.batch_norm)
        params = {
            "emb": glorot_normal_init(keys[0], (cfg.feature_size, k)),
            "cvr_mlp": cvr_mlp,
            "cvr_out": T.init_dense(keys[3], layers[-1], 1),
            "ctr_mlp": ctr_mlp,
            "ctr_out": T.init_dense(keys[4], layers[-1], 1),
        }
        return params, {"cvr_mlp": cvr_state, "ctr_mlp": ctr_state}

    def apply(
        self,
        params: Params,
        state: State,
        batch: Batch,
        *,
        train: bool,
        rng: Optional[jax.Array] = None,
        lookup=dense_lookup,
    ) -> Tuple[Outputs, State]:
        cfg = self.cfg
        emb_t = params["emb"]
        from tf_repos_tpu.data.sparse_batch import MHC_DEST, MHC_IDX, MHC_W

        fc = batch["feat_ids"].shape[1]
        b = batch["feat_ids"].shape[0]
        if MHC_IDX in batch:
            # --mh_coo: the host packed the multi-hot groups' LIVE slots
            # as a COO triplet (data/sparse_batch.MhCooPacker) — the
            # padded [B,p] fields are not in the batch. One pooled
            # segment-sum replaces the 5 padded expand+einsum legs; its
            # device cost is proportional to live slots, not pad
            # (ops/pallas_sparse.py COO-pool section; the reference's
            # embedding_lookup_sparse consumed COO sp_ids too,
            # DeepCvrMTL.py:152-164).
            all_ids = jnp.concatenate(
                [
                    batch["feat_ids"],
                    batch["a_catids"][:, None],
                    batch["a_shopids"][:, None],
                    batch["a_brandids"][:, None],
                ],
                axis=1,
            )
            rows = lookup(emb_t, all_ids)  # [B, fc+3, K]
            common = rows[:, :fc]  # unscaled (:154)
            a_cat = rows[:, fc]
            a_shop = rows[:, fc + 1]
            a_brand = rows[:, fc + 2]
            ng = len(MH_COO_GROUPS)
            # NOT the round-5 sorted-window path: DIN's attention wins
            # with it because d_rows are already materialized for the
            # MLP, so the segment ops stand alone there. ESMM's fused
            # coo_pool never materializes the [M,K] rows — switching it
            # to expand + sorted segsum measured 52.8 vs 45.5 ms at the
            # published point (A/B, round 5). Keep the fused pool.
            pool = getattr(lookup, "coo_pool", xla_coo_pool)
            # flatten the local [n_data_local, M_pad] view (1 data shard
            # per device under a mesh; [1, M_pad] on a single chip)
            pooled_all = pool(
                emb_t,
                batch[MHC_IDX].reshape(-1),
                batch[MHC_DEST].reshape(-1),
                batch[MHC_W].reshape(-1),
                b * ng,
            ).reshape(b, ng, -1).astype(rows.dtype)
            pooled = [pooled_all[:, i] for i in range(len(USER_FIELDS))]
            a_int = pooled_all[:, len(USER_FIELDS)]
        else:
            # ONE fused gather for every field: each separate lookup would
            # materialize its own dense [V,K] cotangent in the backward
            # pass — at Ali-CCP scale (4.5M rows) that is ~288MB of
            # zero-init + scatter PER CALL SITE; fusing 9 call sites into
            # one cuts the backward's table-sized traffic 9x. Per-field
            # widths MAY differ (--mh_bucket slices each field to its own
            # pow2 live width) — offsets are cumulative.
            all_ids = jnp.concatenate(
                [
                    batch["feat_ids"],
                    *[batch[f"{f}ids"] for f in USER_FIELDS],
                    batch["a_catids"][:, None],
                    batch["a_shopids"][:, None],
                    batch["a_brandids"][:, None],
                    batch["a_intids"],
                ],
                axis=1,
            )
            rows = lookup(emb_t, all_ids)  # [B, fc+sum(w_f)+3+w_a, K]
            common = rows[:, :fc]  # unscaled (:154)
            off = fc
            pooled = []
            for f in USER_FIELDS:
                ids = batch[f"{f}ids"]
                vals = batch[f"{f}vals"]
                mask = (ids > 0).astype(rows.dtype)
                demb = rows[:, off : off + ids.shape[1]]
                off += ids.shape[1]
                pooled.append(jnp.einsum("bpk,bp->bk", demb, mask * vals))  # sum combiner

            a_cat = rows[:, off]
            a_shop = rows[:, off + 1]
            a_brand = rows[:, off + 2]
            off += 3
            int_mask = (batch["a_intids"] > 0).astype(rows.dtype)
            a_int = jnp.einsum("bpk,bp->bk", rows[:, off:], int_mask)

        x = jnp.concatenate(
            [common.reshape(common.shape[0], -1), *pooled, a_cat, a_shop, a_brand, a_int],
            axis=1,
        )

        k_cvr = k_ctr = None
        if train and rng is not None:
            k_cvr, k_ctr = jax.random.split(rng)
        new_state: State = {}
        x_cvr, new_state["cvr_mlp"] = T.apply_mlp(
            params["cvr_mlp"], state["cvr_mlp"], x,
            keep_probs=cfg.dropout_list, train=train, rng=k_cvr,
            batch_norm=cfg.batch_norm, bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        y_cvr = T.dense(params["cvr_out"], x_cvr)[:, 0]
        x_ctr, new_state["ctr_mlp"] = T.apply_mlp(
            params["ctr_mlp"], state["ctr_mlp"], x,
            keep_probs=cfg.dropout_list, train=train, rng=k_ctr,
            batch_norm=cfg.batch_norm, bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        y_ctr = T.dense(params["ctr_out"], x_ctr)[:, 0]

        pctr = jax.nn.sigmoid(y_ctr)
        pcvr = jax.nn.sigmoid(y_cvr)
        pctcvr = pctr * pcvr
        return {
            "logits": y_ctr,
            "logits_cvr": y_cvr,
            "pctr": pctr,
            "pcvr": pcvr,
            "pctcvr": pctcvr,
            "prob": pctcvr,
        }, new_state

    def loss(self, params, state, batch, *, train, rng=None, lookup=dense_lookup):
        out, new_state = self.apply(params, state, batch, train=train, rng=rng, lookup=lookup)
        y, z = batch["y"], batch["z"]
        mask = batch.get("mask")
        ctr_per = M.sigmoid_xent(out["logits"], y)
        if mask is None:
            ctr_loss = jnp.mean(ctr_per)
            cvr_loss = M.log_loss(z, out["pctcvr"])
        else:
            wsum = jnp.maximum(jnp.sum(mask), 1.0)
            ctr_loss = jnp.sum(ctr_per * mask) / wsum
            cvr_loss = M.log_loss(z, out["pctcvr"], mask)
        w = self.cfg.ctr_task_wgt
        loss = w * ctr_loss + (1.0 - w) * cvr_loss + self.l2_loss(params)
        return loss, (out, new_state)

    def per_example_loss(self, out: Outputs, batch: Batch) -> jax.Array:
        """[B] joint loss per example: w·CE(y_ctr; y) + (1−w)·log_loss
        (pctcvr; z) — the masked-mean of this equals loss() minus L2."""
        y, z = batch["y"], batch["z"]
        ctr_per = M.sigmoid_xent(out["logits"], y)
        eps = 1e-7
        p = jnp.clip(out["pctcvr"], eps, 1.0 - eps)
        cvr_per = -(z * jnp.log(p) + (1.0 - z) * jnp.log(1.0 - p))
        w = self.cfg.ctr_task_wgt
        return w * ctr_per + (1.0 - w) * cvr_per

    def l2_loss(self, params: Params) -> jax.Array:
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["emb"]))

    def eval_metrics(self, out: Outputs, batch: Batch):
        return {
            "CTR_AUC": (batch["y"], out["pctr"]),
            "CVR_AUC": (batch["z"], out["pcvr"]),
            "CTCVR_AUC": (batch["z"], out["pctcvr"]),
        }

    @property
    def prediction_keys(self):
        return ["pctcvr", "pctr", "pcvr"]

    def param_spec(self):
        spec = super().param_spec()
        spec["emb"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"emb": SparseSlot(("feat_ids", "u_catids", "u_shopids", "u_brandids", "u_intids", "a_catids", "a_shopids", "a_brandids", "a_intids"), self.cfg.feature_size)}

    def mh_coo_groups(self):
        return MH_COO_GROUPS

    def coo_combine_ok(self) -> bool:
        """Every ESMM pool is embedding_lookup_sparse combiner="sum"
        (DeepCvrMTL.py:155-159) = linear in w — duplicate (row, id)
        weights may be summed on the host exactly."""
        return True
