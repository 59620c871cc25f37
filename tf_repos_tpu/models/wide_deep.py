"""Wide & Deep over Criteo CSV features — wide / deep / wide_n_deep.

Behavioral spec from /root/reference/deep_ctr/Model_pipeline/wide_n_deep.py:
13 numeric columns I1..I13 and 26 categorical identity columns C14..C39
with 10,000 buckets, default bucket 0 (:92-107); wide = linear over
numerics + one-hot categoricals, deep = numerics + per-column embedding
columns -> MLP (hidden_units = deep_layers, :115-151); wide_n_deep sums
the linear and DNN logits (DNNLinearCombinedClassifier semantics).

TPU-first layout: the 26 identity columns are packed into ONE
[26*10000, K] table with per-column offsets so the table row-shards over
the model axis exactly like the libsvm models' unified id space.

Batch contract (data/csv.py): {"cont": f32[B,13], "cat": int32[B,26],
"label": f32[B], "mask": f32[B]}.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tf_repos_tpu.models.base import (
    MODEL_AXIS_SPEC,
    MODEL_AXIS_SPEC_1D,
    Batch,
    CtrModel,
    Outputs,
    Params,
    State,
)
from tf_repos_tpu.ops import towers as T
from tf_repos_tpu.ops.embedding import dense_lookup, glorot_normal_init

NUM_CONT = 13
NUM_CAT = 26
NUM_BUCKETS = 10_000  # wide_n_deep.py:98


class WideDeep(CtrModel):
    name = "wide_n_deep"

    def __init__(self, cfg, model_type: Optional[str] = None):
        super().__init__(cfg)
        self.model_type = model_type or cfg.model_type or "wide_n_deep"
        if self.model_type not in ("wide", "deep", "wide_n_deep"):
            raise ValueError(f"bad model_type {self.model_type}")

    @property
    def has_wide(self) -> bool:
        return self.model_type in ("wide", "wide_n_deep")

    @property
    def has_deep(self) -> bool:
        return self.model_type in ("deep", "wide_n_deep")

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        k_empty = jax.random.PRNGKey(0)
        k_emb, k_mlp, k_out = jax.random.split(rng, 3)
        params: Params = {"bias": jnp.zeros((1,), jnp.float32)}
        state: State = {}
        if self.has_wide:
            params["wide_cont"] = jnp.zeros((NUM_CONT,), jnp.float32)
            params["wide_cat"] = jnp.zeros((NUM_CAT * NUM_BUCKETS,), jnp.float32)
        if self.has_deep:
            layers = cfg.deep_layers_list
            params["emb"] = glorot_normal_init(
                k_emb, (NUM_CAT * NUM_BUCKETS, cfg.embedding_size)
            )
            params["mlp"], mlp_state = T.init_mlp(
                k_mlp,
                NUM_CONT + NUM_CAT * cfg.embedding_size,
                layers,
                batch_norm=cfg.batch_norm,
            )
            params["out"] = T.init_dense(k_out, layers[-1], 1)
            state["mlp"] = mlp_state
        return params, state

    @staticmethod
    def _offset_ids(cat: jax.Array) -> jax.Array:
        """identity-column semantics: out-of-range -> bucket 0, then pack
        column c into rows [c*10000, (c+1)*10000)."""
        safe = jnp.where((cat >= 0) & (cat < NUM_BUCKETS), cat, 0)
        offsets = jnp.arange(NUM_CAT, dtype=safe.dtype) * NUM_BUCKETS
        return safe + offsets[None, :]

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
        cont = batch["cont"]
        ids = self._offset_ids(batch["cat"])
        logits = params["bias"][0]
        new_state: State = {}
        if self.has_wide:
            logits = logits + jnp.dot(cont, params["wide_cont"]) + jnp.sum(
                lookup(params["wide_cat"], ids), axis=1
            )
        if self.has_deep:
            emb = lookup(params["emb"], ids)  # [B,26,K]
            deep_in = jnp.concatenate([cont, emb.reshape(emb.shape[0], -1)], axis=1)
            h, new_state["mlp"] = T.apply_mlp(
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
            logits = logits + T.dense(params["out"], h)[:, 0]
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, new_state

    def param_spec(self):
        spec = super().param_spec()
        if self.has_wide:
            spec["wide_cat"] = MODEL_AXIS_SPEC_1D
        if self.has_deep:
            spec["emb"] = MODEL_AXIS_SPEC
        return spec
