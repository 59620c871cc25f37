"""AFM — Attentional Factorization Machine.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/AFM.py:
linear part (:124-126), element-wise products of all F(F-1)/2 pairs
(:127-139), attention MLP over each pair (attention_layers flag :52,
ReLU fully_connected stack :143-147) -> scalar logit -> softmax over the
pair axis (:149-151), dropout on attention weights then on the pooled
vector (:152,158), attention-weighted sum-pool -> 1-unit projection
(:155-162), logit = bias + linear + deep (:164-168), L2 on Feat_Bias and
Feat_Emb (:181).
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


class AFM(CtrModel):
    name = "AFM"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_b, k_e, k_att, k_ao, k_out = jax.random.split(rng, 5)
        att_layers = cfg.attention_layers_list
        att_params, att_state = T.init_mlp(k_att, cfg.embedding_size, att_layers)
        params = {
            "bias": jnp.zeros((1,), jnp.float32),
            # linear + embedding fused into one [V, 1+K] table: one
            # gather/scatter per step instead of two (ops/embedding.py)
            "wv": fused_linear_table_init(
                k_b, k_e, cfg.feature_size, cfg.embedding_size
            ),
            "att_mlp": att_params,
            "att_out": T.init_dense(k_ao, att_layers[-1], 1),
            "out": T.init_dense(k_out, cfg.embedding_size, 1),
        }
        return params, {"att_mlp": att_state}

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
        b = ids.shape[0]
        num_pairs = cfg.field_size * (cfg.field_size - 1) // 2

        y_linear, emb = fused_linear_lookup(params["wv"], ids, vals, lookup)
        pairs = I.pairwise_elementwise(emb)  # [B,P,K]

        # attention net runs per pair: flatten pairs into the batch axis
        # exactly as the reference reshapes to [(None*P), K] (AFM.py:141)
        att_in = pairs.reshape(b * num_pairs, cfg.embedding_size)
        k1 = k2 = k3 = None
        if train and rng is not None:
            k1, k2, k3 = jax.random.split(rng, 3)
        # reference attention MLP has NO dropout inside (AFM.py:143-147)
        h, att_state = T.apply_mlp(
            params["att_mlp"], state["att_mlp"], att_in, keep_probs=[1.0], train=train, rng=None,
            compute_dtype=cfg.tower_dtype,
        )
        att_logits = T.dense(params["att_out"], h).reshape(b, num_pairs, 1)
        aij = jax.nn.softmax(att_logits, axis=1)
        if train:
            aij = T.dropout(aij, cfg.dropout_list[0], k1)  # AFM.py:152

        y_emb = jnp.sum(aij * pairs, axis=1)  # [B,K]
        if train:
            y_emb = T.dropout(y_emb, cfg.dropout_list[1], k2)  # AFM.py:158
        y_d = T.dense(params["out"], y_emb)[:, 0]

        logits = params["bias"][0] + y_linear + y_d
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, {"att_mlp": att_state}

    def l2_loss(self, params: Params) -> jax.Array:
        # == l2 on the separate linear + embedding tables (fused [V,1+K])
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["wv"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["wv"] = MODEL_AXIS_SPEC
        return spec

    def sparse_slots(self):
        return {"wv": SparseSlot(("feat_ids",), self.cfg.feature_size)}
