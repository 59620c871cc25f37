"""LR — logistic regression over the unified libsvm id space.

The reference's "LR" baseline is LinearClassifier in wide_n_deep.py
(:133-137); on the libsvm representation it reduces to
logit = b + sum_f w[id_f] * val_f. Kept as its own registry entry so the
zoo's AUC ladder (deep_ctr/uploads/tensorboard_auc.png: LR ~0.777) can be
reproduced from the same data files as the deep models.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tf_repos_tpu.models.base import (
    SparseSlot,
    MODEL_AXIS_SPEC_1D,
    Batch,
    CtrModel,
    Outputs,
    Params,
    State,
)
from tf_repos_tpu.ops.embedding import dense_lookup, glorot_normal_init


class LR(CtrModel):
    name = "LR"

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        cfg = self.cfg
        params = {
            "bias": jnp.zeros((1,), jnp.float32),
            "w": jnp.zeros((cfg.feature_size,), jnp.float32),
        }
        return params, {}

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
        logits = params["bias"][0] + jnp.sum(lookup(params["w"], ids) * vals, axis=1)
        return {"logits": logits, "prob": jax.nn.sigmoid(logits)}, state

    def l2_loss(self, params: Params) -> jax.Array:
        return self.cfg.l2_reg * 0.5 * jnp.sum(jnp.square(params["w"]))

    def param_spec(self):
        spec = super().param_spec()
        spec["w"] = MODEL_AXIS_SPEC_1D
        return spec

    def sparse_slots(self):
        return {"w": SparseSlot(("feat_ids",), self.cfg.feature_size)}
