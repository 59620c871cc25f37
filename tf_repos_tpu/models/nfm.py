"""NFM — Neural Factorization Machine.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/NFM.py:
linear part (:118-120), Bi-Interaction pooling keeping a K-vector
(:122-128), dropout BEFORE the first MLP layer too (:136-137), MLP ->
1-unit out, logit = bias + linear + deep (:155-158), L2 on Feat_Bias and
Feat_Emb (:169).
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
from tf_repos_tpu.ops import interactions as I
from tf_repos_tpu.ops import towers as T
from tf_repos_tpu.ops.embedding import (
    dense_lookup,
    fused_linear_lookup,
    fused_linear_table_init,
)


class NFM(CtrModel):
    name = "NFM"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_b, k_e, k_mlp, k_out = jax.random.split(rng, 4)
        layers = cfg.deep_layers_list
        mlp_params, mlp_state = T.init_mlp(
            k_mlp, cfg.embedding_size, layers, batch_norm=cfg.batch_norm
        )
        params = {
            "bias": jnp.zeros((1,), jnp.float32),
            # linear + embedding fused into one [V, 1+K] table: one
            # gather/scatter per step instead of two (ops/embedding.py)
            "wv": fused_linear_table_init(
                k_b, k_e, cfg.feature_size, cfg.embedding_size
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

        y_linear, emb = fused_linear_lookup(params["wv"], ids, vals, lookup)
        deep_in = I.bi_interaction(emb)  # [B,K]

        pre_rng = mlp_rng = None
        if train and rng is not None:
            pre_rng, mlp_rng = jax.random.split(rng)
            deep_in = T.dropout(deep_in, cfg.dropout_list[0], pre_rng)  # NFM.py:136-137

        h, mlp_state = T.apply_mlp(
            params["mlp"],
            state["mlp"],
            deep_in,
            keep_probs=cfg.dropout_list,
            train=train,
            rng=mlp_rng,
            batch_norm=cfg.batch_norm,
            bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        y_d = T.dense(params["out"], h)[:, 0]
        logits = params["bias"][0] + y_linear + y_d
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"mlp": mlp_state}

    def l2_loss(self, params: Params) -> jax.Array:
        # == l2 on the separate linear + embedding tables (fused [V,1+K])
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["wv"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["wv"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"wv": SparseSlot(("feat_ids",), self.cfg.feature_size)}
