"""DeepMVM — Multi-View Machine + deep MLP.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/DeepMVM.py:
weights MVM_W [V,K], MVM_B [F,K] (:117-118), scaled embeddings (:141-144),
MVM part = element-wise product over ALL fields of (emb + field bias)
(:145-150), deep MLP from flattened embeddings (:166-178), concat
[x_mvm, x_deep] -> 1-unit out (:180-185), L2 on MVM_W and MVM_B
(:198-199).
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
from tf_repos_tpu.ops.embedding import dense_lookup, glorot_normal_init


class DeepMVM(CtrModel):
    name = "DeepMVM"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_w, k_b, k_mlp, k_out = jax.random.split(rng, 4)
        layers = cfg.deep_layers_list
        mlp_params, mlp_state = T.init_mlp(
            k_mlp, cfg.field_size * cfg.embedding_size, layers, batch_norm=cfg.batch_norm
        )
        params = {
            "mvm_w": glorot_normal_init(k_w, (cfg.feature_size, cfg.embedding_size)),
            "mvm_b": glorot_normal_init(k_b, (cfg.field_size, cfg.embedding_size)),
            "mlp": mlp_params,
            "out": T.init_dense(k_out, cfg.embedding_size + layers[-1], 1),
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

        emb = lookup(params["mvm_w"], ids) * vals[..., None]  # [B,F,K]
        x_mvm = I.mvm(emb, params["mvm_b"])  # [B,K]

        h, mlp_state = T.apply_mlp(
            params["mlp"],
            state["mlp"],
            emb.reshape(emb.shape[0], -1),
            keep_probs=cfg.dropout_list,
            train=train,
            rng=rng,
            batch_norm=cfg.batch_norm,
            bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        stack = jnp.concatenate([x_mvm, h], axis=1)
        logits = T.dense(params["out"], stack)[:, 0]
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"mlp": mlp_state}

    def l2_loss(self, params: Params) -> jax.Array:
        l2 = self.cfg.l2_reg
        return l2 * 0.5 * jnp.sum(jnp.square(params["mvm_w"])) + l2 * 0.5 * jnp.sum(
            jnp.square(params["mvm_b"])
        )

    def param_spec(self):
        spec = super().param_spec()
        spec["mvm_w"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"mvm_w": SparseSlot(("feat_ids",), self.cfg.feature_size)}
