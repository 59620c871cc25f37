"""DeepFM: FM bias + first-order + second-order (sum-square trick) + deep
MLP over concatenated embeddings.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/DeepFM.py:
weights FM_B/FM_W/FM_V (:114-116), first order (:125-127), pairwise via
sum-square trick (:129-135), MLP over [B, F*K] with ReLU -> (BN) ->
dropout per layer (:151-167), logit = FM_B + y_w + y_v + y_d (:172-176),
loss adds l2_reg * l2_loss(FM_W) + l2_reg * l2_loss(FM_V) (:188-190).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tf_repos_tpu.models.base import (
    SparseSlot,
    MODEL_AXIS_SPEC,
    REPLICATED,
    Batch,
    CtrModel,
    Outputs,
    Params,
    State,
)
from tf_repos_tpu.ops import interactions as I
from tf_repos_tpu.ops import towers as T
from tf_repos_tpu.ops.embedding import (
    dense_lookup,
    fused_linear_lookup,
    fused_linear_table_init,
)


class DeepFM(CtrModel):
    name = "DeepFM"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_w, k_v, k_mlp, k_out = jax.random.split(rng, 4)
        layers = cfg.deep_layers_list
        mlp_params, mlp_state = T.init_mlp(
            k_mlp,
            cfg.field_size * cfg.embedding_size,
            layers,
            batch_norm=cfg.batch_norm,
        )
        params = {
            "fm_b": jnp.zeros((1,), jnp.float32),
            # FM_W and FM_V fused into one [V, 1+K] table — one gather /
            # scatter per step instead of two (ops/embedding.py)
            "fm_wv": fused_linear_table_init(
                k_w, k_v, cfg.feature_size, cfg.embedding_size
            ),
            "mlp": mlp_params,
            "out": T.init_dense(k_out, layers[-1], 1),
        }
        return params, {"mlp": mlp_state}

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
        ids = batch["feat_ids"].reshape(-1, cfg.field_size)
        vals = batch["feat_vals"].reshape(-1, cfg.field_size)

        sf = cfg.static_fields
        if sf > 0 and (
            lookup is dense_lookup or getattr(lookup, "static_slice_ok", False)
        ):
            # Criteo layout: fields 0..sf-1 carry constant ids 1..sf
            # (features/criteo.py emits continuous features that way), so
            # their rows come from a SLICE — no gather forward, no
            # scatter rows backward. The remaining gather/scatter shrinks
            # from B*F to B*(F-sf) rows (the HBM-transaction-bound cost).
            table = params["fm_wv"]
            srows = jax.lax.dynamic_slice_in_dim(table, 1, sf, 0)  # [sf,1+K]
            y_w_s = jnp.einsum("f,bf->b", srows[:, 0], vals[:, :sf])
            emb_s = srows[None, :, 1:] * vals[:, :sf, None]  # [B,sf,K]
            y_w_d, emb_d = fused_linear_lookup(
                table, ids[:, sf:], vals[:, sf:], lookup
            )
            y_w = y_w_s + y_w_d
            emb = jnp.concatenate([emb_s, emb_d], axis=1)
        else:
            y_w, emb = fused_linear_lookup(params["fm_wv"], ids, vals, lookup)
        y_v = I.fm_second_order(emb)

        deep_in = emb.reshape(emb.shape[0], -1)
        h, mlp_state = T.apply_mlp(
            params["mlp"],
            state["mlp"],
            deep_in,
            keep_probs=cfg.dropout_list,
            train=train,
            rng=rng,
            batch_norm=cfg.batch_norm,
            bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        y_d = T.dense(params["out"], h)[:, 0]

        logits = params["fm_b"][0] + y_w + y_v + y_d
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"mlp": mlp_state}

    def l2_loss(self, params: Params) -> jax.Array:
        # == l2*l2_loss(FM_W) + l2*l2_loss(FM_V) on the fused table
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["fm_wv"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["fm_wv"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {
            "fm_wv": SparseSlot(
                ("feat_ids",), self.cfg.feature_size,
                static=self.cfg.static_fields,
            )
        }
