"""DIN — Deep Interest Network over Ali-CCP-style records.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/DIN.py:
TFRecord input with VarLen multi-hot user-behavior fields (:57-99) — on
TPU these are fixed-shape padded arrays with the id==0 padding-mask
convention (:157). One shared embedding table (:117); ad-side embeddings
incl. a sum-combined multi-hot interest field (:143-148); attention_unit
per behavior field: MLP over [u_emb, u_emb - a_emb, a_emb] -> sigmoid
weight -> masked weighted sum-pool (:152-173), toggleable vs plain
sum-pool via --attention_pooling (:45, else-branch :179-183); concat all
-> MLP -> logit (:185-214); L2 on Feat_Emb only (:226).

Reference quirk reproduced intentionally: the attention MLP loops over
len(attention_layers) but draws its widths from deep_layers
(DIN.py:161 uses layers[i]) — with defaults that is one 256-wide layer.

Batch contract (data/ragged.py): feat_ids:int32[B,Fc];
{u_cat,u_shop,u_int,u_brand}_{ids,vals}: [B,P] padded; a_catids/
a_shopids/a_brandids: int32[B]; a_intids: int32[B,P]; label:f32[B].
"""

from __future__ import annotations

from typing import Optional, Tuple

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
from tf_repos_tpu.ops import towers as T
from tf_repos_tpu.ops.embedding import dense_lookup, glorot_normal_init, xla_coo_pool

USER_FIELDS = ("u_cat", "u_shop", "u_brand", "u_int")

# --mh_coo groups: all five multi-hot groups pack, with or without
# attention. Sum-pools (DIN.py:148,179-183) ride the COO segment pool
# directly; attention (DIN.py:152-173) runs its MLP over the LIVE COO
# slots instead of every padded position — identical math (a dead slot
# contributes 0 to the masked weighted sum either way) at ~1/7 the MLP
# rows in the published length regime (avg ~300 live of ~2176 padded
# slots/sample at pad 512). Two documented deviations when the
# attention MLP is stochastic/normalized: dropout draws align to live
# slots (not padded positions), and --batch_norm statistics are
# computed over the COO bucket's rows — live slots plus the bucket's
# pad rows (idx=dest=0, w=0; up to ~25% of rows as the quarter-pow2
# bucket grows), NOT over every padded position. Pad rows contribute 0
# to the pooled sums either way; their share of bn stats/dropout draws
# is a (small) padding artifact, as is the reference's own inclusion of
# sparse_tensor_to_dense rows beyond each sample's length
# (DIN.py:152-173) — neither is a semantic.
#
# a_int is NOT packed (round 5): its only pooled use is the plain sum
# combiner (DIN.py:148) feeding the u_int attention query and the tower
# concat — computed directly from the padded a_intids block of the
# SHARED gather (a masked einsum, identical math to the padded branch).
# Packing it forced a full-M segment scatter whose only consumer was
# that one [B,K] vector (a_int slots carried mult=1 through the
# attention pool anyway); dropping it removes that scatter + its
# backward gather and shrinks the COO bucket ~10% (the step
# decomposition showed the per-slot scatter/gather chain, not the MLP,
# dominating — scripts/bench_din_decomp.py).
MH_COO_GROUPS = (
    ("u_cat", True), ("u_shop", True), ("u_brand", True), ("u_int", True),
)


class DIN(CtrModel):
    name = "DIN"

    def _att_widths(self):
        """DIN.py:160-161: range over attention_layers, widths from
        deep_layers."""
        cfg = self.cfg
        return [cfg.deep_layers_list[i] for i in range(len(cfg.attention_layers_list))]

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k = cfg.embedding_size
        keys = jax.random.split(rng, 4)
        layers = cfg.deep_layers_list
        common_dims = cfg.field_size * k
        # concat: common + 4 user-pooled + a_cat + a_shop + a_brand + a_int
        mlp_in = common_dims + 8 * k
        params: Params = {
            "emb": glorot_normal_init(keys[0], (cfg.feature_size, k)),
        }
        state: State = {}
        if cfg.attention_pooling:
            att_params, att_state = T.init_mlp(keys[1], 3 * k, self._att_widths())
            params["att_mlp"] = att_params
            params["att_out"] = T.init_dense(keys[2], self._att_widths()[-1], 1)
            state["att_mlp"] = att_state
        params["mlp"], state["mlp"] = T.init_mlp(
            keys[3], mlp_in, layers, batch_norm=cfg.batch_norm
        )
        params["out"] = T.init_dense(jax.random.fold_in(rng, 7), layers[-1], 1)
        return params, state

    def _attention_unit(
        self,
        params: Params,
        state: State,
        dense_emb: jax.Array,  # [B,P,K] already weighted by vals
        mask: jax.Array,  # [B,P]
        a_emb: jax.Array,  # [B,K]
        *,
        train: bool,
        rng: Optional[jax.Array],
    ) -> Tuple[jax.Array, State]:
        b, p, k = dense_emb.shape
        ub = dense_emb.reshape(b * p, k)
        ax = jnp.broadcast_to(a_emb[:, None, :], (b, p, k)).reshape(b * p, k)
        x = jnp.concatenate([ub, ub - ax, ax], axis=1)  # [(B*P), 3K]
        h, att_state = T.apply_mlp(
            params["att_mlp"],
            state["att_mlp"],
            x,
            keep_probs=self.cfg.dropout_list,
            train=train,
            rng=rng,
            batch_norm=self.cfg.batch_norm,
            bn_decay=self.cfg.batch_norm_decay,
            compute_dtype=self.cfg.tower_dtype,
        )
        att_wgt = jax.nn.sigmoid(T.dense(params["att_out"], h)).reshape(b, p, 1)
        pooled = jnp.sum(dense_emb * att_wgt * mask[..., None], axis=1)  # [B,K]
        return pooled, att_state

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
        from tf_repos_tpu.data.sparse_batch import (
            MHC_CDEST,
            MHC_CIDX,
            MHC_CNT,
            MHC_DEST,
            MHC_IDX,
            MHC_PERM,
            MHC_SROWS,
            MHC_W,
        )

        fc = batch["feat_ids"].shape[1]
        b = batch["feat_ids"].shape[0]
        coo = MHC_IDX in batch
        # fields that ride the COO pack (--mh_coo) are ABSENT from the
        # batch — all five multi-hot groups pack (MH_COO_GROUPS); the
        # attention MLP runs over the live COO slots
        groups = self.mh_coo_groups() if coo else ()
        padded_user = [f for f in USER_FIELDS if f"{f}ids" in batch]
        # ONE fused gather for every padded field (see models/esmm.py:
        # each separate lookup would materialize its own dense [V,K]
        # cotangent in the backward — table-sized traffic per call site).
        # Per-field widths MAY differ (--mh_bucket slices each field to
        # its own pow2 live width), so offsets are cumulative.
        parts = [batch["feat_ids"]]
        user_off = {}
        off = fc
        for f in padded_user:
            w = batch[f"{f}ids"].shape[1]
            parts.append(batch[f"{f}ids"])
            user_off[f] = (off, w)
            off += w
        parts += [
            batch["a_catids"][:, None],
            batch["a_shopids"][:, None],
            batch["a_brandids"][:, None],
        ]
        scalar_off = off
        off += 3
        if "a_intids" in batch:
            parts.append(batch["a_intids"])
        rows = lookup(emb_t, jnp.concatenate(parts, axis=1))
        common = rows[:, :fc]  # [B,Fc,K]
        user_rows = {f: rows[:, o : o + w] for f, (o, w) in user_off.items()}
        a_cat = rows[:, scalar_off]
        a_shop = rows[:, scalar_off + 1]
        a_brand = rows[:, scalar_off + 2]
        new_state: State = {}
        keys = {}
        if train and rng is not None:
            ks = jax.random.split(rng, len(USER_FIELDS) + 1)
            keys = {f: ks[i] for i, f in enumerate(USER_FIELDS)}
            mlp_rng = ks[-1]
        else:
            keys = {f: None for f in USER_FIELDS}
            mlp_rng = None

        if coo:
            ng = len(groups)
            idxf = batch[MHC_IDX].reshape(-1)
            destf = batch[MHC_DEST].reshape(-1)
            wf = batch[MHC_W].reshape(-1)
            # a_int: plain sum combiner over the padded a_intids block
            # of the SHARED gather (DIN.py:148) — same math as the
            # padded branch; keeping it out of the COO stream removes a
            # full-M segment scatter whose only consumer was this [B,K]
            # vector (see MH_COO_GROUPS comment)
            int_mask = (batch["a_intids"] > 0).astype(common.dtype)
            a_int = jnp.einsum("bpk,bp->bk", rows[:, off:], int_mask)
            if cfg.attention_pooling:
                # attention over LIVE slots: per live slot j with group
                # g = dest[j] % ng, score MLP([d, d - a_g, a_g]) where
                # d = w[j] * emb[idx[j]] — exactly DIN.py:152-173 with the
                # dead padded positions skipped (they contribute 0 to the
                # masked weighted sum either way).
                #
                # ONE gather feeds everything: d_rows is reused for the
                # MLP input AND the attention-weighted pool — measured
                # round 4 at the published point, the naive form
                # (separate emb_t[idx] gathers per use) pays a
                # [S,K]-scatter backward pass per gather where this pays
                # ONE accumulate through `lookup` (the lane-packed
                # Pallas kernel above the VMEM row cap).
                seg_pool = getattr(lookup, "seg_pool", None)
                use_sorted = seg_pool is not None and MHC_CNT in batch
                sbe = getattr(lookup, "sorted_bwd_expand", None)
                if use_sorted and sbe is not None and MHC_PERM in batch:
                    # idx-sorted backward (round 5): the expand's AD
                    # transpose — the costliest remaining per-slot op
                    # (~15-19 ms scalar accumulate at the published
                    # point) — rides the packer's idx-sorted aux stream
                    # through the lane-packed windowed segment sum
                    raw = sbe(
                        emb_t, idxf,
                        batch[MHC_PERM].reshape(-1),
                        batch[MHC_CIDX].reshape(-1),
                        batch[MHC_SROWS].reshape(-1),
                        jnp.sum(batch[MHC_CNT]),
                        # lossless when the rows are consumed in bf16
                        # (the cotangent was produced as bf16)
                        cast_bf16=common.dtype == jnp.bfloat16,
                    )
                else:
                    raw = lookup(emb_t, idxf)
                d_rows = (
                    raw.astype(common.dtype)
                    * wf[:, None].astype(common.dtype)
                )
                # group g pairs with ad embedding: u_cat<->a_cat,
                # u_shop<->a_shop, u_brand<->a_brand, u_int<->a_int
                ad_all = jnp.stack([a_cat, a_shop, a_brand, a_int], axis=1)
                if use_sorted:
                    # sorted-window formulation (round 5): the packer
                    # emits field-major with ascending rows, so the
                    # COMPACT segment id (running count of non-empty
                    # (field,row) pairs, from __mhc_cnt) is
                    # nondecreasing with increments <= 1 — the segment
                    # scatter and query select become windowed one-hot
                    # MXU matmuls (ops/pallas_sparse.make_sorted_seg;
                    # XLA pays ~11 ns/slot = 14.6 ms for the same
                    # scatter at the published point, the kernel 3.0).
                    # dest is NOT consulted: cdest is rebuilt from the
                    # counts exactly like the slim wire rebuilds dest.
                    cnt = batch[MHC_CNT].reshape(-1)  # [ng*b] field-major
                    nz = cnt > 0
                    c_of = jnp.cumsum(nz.astype(jnp.int32)) - 1
                    c_ix = jnp.maximum(c_of, 0)
                    gc = b * ng
                    if MHC_CDEST in batch:
                        # host-built (the packer): the in-graph repeat
                        # below costs ~10 ms/step at M=1.3M on v5e
                        cdest = batch[MHC_CDEST].reshape(-1)
                    else:
                        # slim wire: cdest is rebuilt on device (the
                        # wire stays minimal; 4 B/slot would cost more
                        # tunnel time than this repeat)
                        cdest = jnp.repeat(
                            c_ix, cnt, total_repeat_length=idxf.shape[0]
                        )
                    # queries in compact rows: scatter the field-major
                    # [ng*b, K] query matrix to its live positions
                    q_fm = ad_all.swapaxes(0, 1).reshape(gc, -1)
                    q_c = (
                        jnp.zeros_like(q_fm)
                        .at[jnp.where(nz, c_ix, gc)]
                        .set(q_fm, mode="drop")
                    )
                    a_sel = lookup.seg_select(q_c, cdest)
                else:
                    a_sel = ad_all.reshape(b * ng, -1)[destf]
                xatt = jnp.concatenate([d_rows, d_rows - a_sel, a_sel], axis=1)
                h, new_state["att_mlp"] = T.apply_mlp(
                    params["att_mlp"],
                    state["att_mlp"],
                    xatt,
                    keep_probs=cfg.dropout_list,
                    train=train,
                    rng=keys[USER_FIELDS[0]],
                    batch_norm=cfg.batch_norm,
                    bn_decay=cfg.batch_norm_decay,
                    compute_dtype=cfg.tower_dtype,
                )
                wgt = jax.nn.sigmoid(T.dense(params["att_out"], h))[:, 0]
                mult = wgt.astype(d_rows.dtype)
                # f32 accumulators: ~300 live slots/row sum in bf16 would
                # random-walk ~2^-8*sqrt(300) relative error; f32 target
                # costs 2x scatter bytes, measured ~neutral on chip
                if use_sorted:
                    pooled_c = seg_pool(
                        d_rows * mult[:, None], cdest, gc
                    )  # [gc, K] f32, compact rows
                    att_pooled = (
                        jnp.where(nz[:, None], pooled_c[c_ix], 0.0)
                        .reshape(ng, b, -1)
                        .astype(common.dtype)
                    )
                    pooled = [att_pooled[i] for i in range(len(USER_FIELDS))]
                else:
                    att_pooled = (
                        jnp.zeros((b * ng, d_rows.shape[-1]), jnp.float32)
                        .at[destf]
                        .add((d_rows * mult[:, None]).astype(jnp.float32))
                        .reshape(b, ng, -1)
                        .astype(common.dtype)
                    )
                    pooled = [
                        att_pooled[:, i] for i in range(len(USER_FIELDS))
                    ]
            else:
                # no attention: every group is a plain weighted sum-pool —
                # the segment pool rides the (possibly Pallas) COO kernel
                pool = getattr(lookup, "coo_pool", xla_coo_pool)
                sums = pool(emb_t, idxf, destf, wf, b * ng)
                sums = sums.reshape(b, ng, -1).astype(common.dtype)
                pooled = [sums[:, i] for i in range(len(USER_FIELDS))]
        else:
            int_mask = (batch["a_intids"] > 0).astype(common.dtype)
            a_int = jnp.einsum(
                "bpk,bp->bk", rows[:, off:], int_mask
            )  # sum combiner (DIN.py:148)
            ad_emb = {
                "u_cat": a_cat, "u_shop": a_shop, "u_brand": a_brand,
                "u_int": a_int,
            }
            pooled = []
            att_state = state.get("att_mlp")
            for f in USER_FIELDS:
                ids = batch[f"{f}ids"]
                vals = batch[f"{f}vals"]
                mask = (ids > 0).astype(common.dtype)
                demb = user_rows[f] * vals[..., None]  # [B,P,K]
                if cfg.attention_pooling:
                    pl_, att_state = self._attention_unit(
                        params,
                        {"att_mlp": att_state},
                        demb,
                        mask,
                        ad_emb[f],
                        train=train,
                        rng=keys[f],
                    )
                else:  # plain weighted sum-pool (DIN.py:179-183)
                    pl_ = jnp.einsum("bpk,bp->bk", demb, mask)
                pooled.append(pl_)
            if cfg.attention_pooling:
                new_state["att_mlp"] = att_state

        x = jnp.concatenate(
            [common.reshape(common.shape[0], -1), *pooled, a_cat, a_shop, a_brand, a_int],
            axis=1,
        )
        h, new_state["mlp"] = T.apply_mlp(
            params["mlp"],
            state["mlp"],
            x,
            keep_probs=cfg.dropout_list,
            train=train,
            rng=mlp_rng,
            batch_norm=cfg.batch_norm,
            bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        logits = T.dense(params["out"], h)[:, 0]
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, new_state

    def l2_loss(self, params: Params) -> jax.Array:
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["emb"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["emb"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"emb": SparseSlot(("feat_ids", "u_catids", "u_shopids", "u_brandids", "u_intids", "a_catids", "a_shopids", "a_brandids", "a_intids"), self.cfg.feature_size)}

    def mh_coo_groups(self):
        return MH_COO_GROUPS

    def coo_combine_ok(self) -> bool:
        """Only without attention: the attention MLP scores each slot
        from w * emb NONLINEARLY (sigmoid, DIN.py:152-173), so summed
        duplicate weights change its math. The --attention_pooling=false
        path is all sum combiners (DIN.py:179-183) = linear in w."""
        return not self.cfg.attention_pooling

    def wants_sorted_seg(self) -> bool:
        return bool(self.cfg.attention_pooling)

    def wants_sorted_aux(self) -> bool:
        return bool(self.cfg.attention_pooling)
