"""PNN family — FNN / Inner-PNN / Outer-PNN selected by model_type.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/PNN.py:
weights Global_Bias/Feat_Bias/Feat_Emb (:116-118), linear part (:129-131),
FNN = flat embeddings (:139-140), Inner = concat(flat, pairwise inner
products) (:141-153), Outer = concat(flat, pairwise outer products,
einsum 'api,apj->apij') (:154-167; the reference marks Outer "NOT ready"
— here it is implemented and tested), MLP -> 1-unit out, logit =
bias + linear + deep (:190-194).
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


class PNN(CtrModel):
    name = "PNN"

    def __init__(self, cfg, model_type: Optional[str] = None):
        super().__init__(cfg)
        self.model_type = model_type or cfg.model_type or "Inner"
        if self.model_type not in ("FNN", "Inner", "Outer"):
            raise ValueError(f"PNN model_type must be FNN/Inner/Outer, got {self.model_type}")

    def _deep_in_dim(self) -> int:
        cfg = self.cfg
        f, k = cfg.field_size, cfg.embedding_size
        num_pairs = f * (f - 1) // 2
        if self.model_type == "FNN":
            return f * k
        if self.model_type == "Inner":
            return f * k + num_pairs
        return f * k + num_pairs * k * k

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_b, k_e, k_mlp, k_out = jax.random.split(rng, 4)
        layers = cfg.deep_layers_list
        mlp_params, mlp_state = T.init_mlp(
            k_mlp, self._deep_in_dim(), layers, batch_norm=cfg.batch_norm
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
        flat = emb.reshape(emb.shape[0], -1)

        if self.model_type == "FNN":
            deep_in = flat
        elif self.model_type == "Inner":
            deep_in = jnp.concatenate([flat, I.pairwise_inner(emb)], axis=1)
        else:
            deep_in = jnp.concatenate([flat, I.pairwise_outer(emb)], axis=1)

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
        logits = params["bias"][0] + y_linear + y_d
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"mlp": mlp_state}

    def l2_loss(self, params: Params) -> jax.Array:
        """PNN.py:214-216: l2 on Feat_Bias and Feat_Emb."""
        # == l2 on the separate linear + embedding tables (fused [V,1+K])
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["wv"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["wv"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"wv": SparseSlot(("feat_ids",), self.cfg.feature_size)}
