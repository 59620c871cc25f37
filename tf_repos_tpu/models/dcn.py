"""DCN — Deep & Cross Network.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/DCN.py:
weights Cross_B/Cross_W [L, F*K] and Feat_Emb (:120-126), x0 = flattened
scaled embeddings (:134-139), cross layers x_{l+1} = x0*(x_l.w_l) + x_l +
b_l (:140-145), parallel deep MLP from x0 (:147-176), concat -> 1-unit
out (:178-184), L2 on Cross_B, Cross_W, Feat_Emb (:199).
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


class DCN(CtrModel):
    name = "DCN"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_cb, k_cw, k_e, k_mlp, k_out = jax.random.split(rng, 5)
        d = cfg.field_size * cfg.embedding_size
        layers = cfg.deep_layers_list
        mlp_params, mlp_state = T.init_mlp(k_mlp, d, layers, batch_norm=cfg.batch_norm)
        params = {
            "cross_b": glorot_normal_init(k_cb, (cfg.cross_layers, d)),
            "cross_w": glorot_normal_init(k_cw, (cfg.cross_layers, d)),
            "emb": glorot_normal_init(k_e, (cfg.feature_size, cfg.embedding_size)),
            "mlp": mlp_params,
            "out": T.init_dense(k_out, d + layers[-1], 1),
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

        emb = lookup(params["emb"], ids) * vals[..., None]
        x0 = emb.reshape(emb.shape[0], -1)  # [B, F*K]

        xl = I.cross_network(x0, params["cross_w"], params["cross_b"])
        h, mlp_state = T.apply_mlp(
            params["mlp"],
            state["mlp"],
            x0,
            keep_probs=cfg.dropout_list,
            train=train,
            rng=rng,
            batch_norm=cfg.batch_norm,
            bn_decay=cfg.batch_norm_decay,
            compute_dtype=cfg.tower_dtype,
        )
        stack = jnp.concatenate([xl, h], axis=1)
        logits = T.dense(params["out"], stack)[:, 0]
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"mlp": mlp_state}

    def l2_loss(self, params: Params) -> jax.Array:
        l2 = self.cfg.l2_reg
        return (
            l2 * 0.5 * jnp.sum(jnp.square(params["cross_b"]))
            + l2 * 0.5 * jnp.sum(jnp.square(params["cross_w"]))
            + l2 * 0.5 * jnp.sum(jnp.square(params["emb"]))
        )

    def param_spec(self):
        spec = super().param_spec()
        spec["emb"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"emb": SparseSlot(("feat_ids",), self.cfg.feature_size)}
