"""Model protocol: every algorithm is a pure ``f(x)``.

The reference packages each algorithm as an Estimator model_fn returning
an EstimatorSpec (SURVEY.md §1 L3). Here a model is a small config-bound
object with pure functions:

  init(rng)                      -> (params, state)       pytrees
  apply(params, state, batch,
        train, rng, lookup)      -> (outputs, new_state)  outputs["prob"], ["logits"]
  loss(params, state, batch,
       train, rng, lookup)       -> (scalar, (outputs, new_state))
  param_spec()                   -> PartitionSpec pytree matching params
                                    (embedding tables row-sharded on "model")

``lookup`` is the embedding-lookup function (dense gather on one chip,
masked-gather+psum inside shard_map on a mesh — ops/embedding.py), so the
same model math runs unsharded and sharded.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tf_repos_tpu.config import Config
from tf_repos_tpu.ops import metrics as M
from tf_repos_tpu.ops.embedding import dense_lookup

Params = Any
State = Any
Batch = Dict[str, jax.Array]
Outputs = Dict[str, jax.Array]

MODEL_AXIS_SPEC = P("model", None)  # row-sharded [V,K] table
MODEL_AXIS_SPEC_1D = P("model")  # row-sharded [V] table
REPLICATED = P()


class SparseSlot(NamedTuple):
    """One big embedding table eligible for lazy touched-rows updates
    (train/sparse.py): the batch fields holding ids into it, and its
    vocab size (rows).

    static > 0: the model slices rows 1..static directly (constant-id
    continuous fields, --static_fields). The mapper then seeds ids
    0..static into every dedup set, so position == id for the whole
    static block and the model's dynamic_slice reads the same rows off
    the gathered [S, K] matrix as off the full table — the slice path
    composes with lazy sparse updates without any model change."""

    fields: Tuple[str, ...]
    vocab: int
    static: int = 0


class CtrModel:
    """Base for single-task CTR models (sigmoid over one logit)."""

    name: str = "base"

    def __init__(self, cfg: Config):
        self.cfg = cfg

    # -------- to implement
    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        raise NotImplementedError

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
        raise NotImplementedError

    def l2_loss(self, params: Params) -> jax.Array:
        """Explicit L2 terms the reference adds to the loss (embedding
        tables only — see ops/towers.mlp_l2 parity note)."""
        return jnp.float32(0.0)

    def param_spec(self) -> Any:
        """PartitionSpec pytree matching init()'s params. Default:
        everything replicated; models with big tables override."""
        params, _ = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        return jax.tree.map(lambda _: REPLICATED, params)

    def sparse_slots(self) -> Dict[str, SparseSlot]:
        """Tables eligible for lazy touched-rows optimizer updates
        (--sparse_table_update; train/sparse.py). Empty dict: the model
        has no huge tables / doesn't support the sparse path."""
        return {}

    def mh_coo_groups(self):
        """Multi-hot groups eligible for the host-side COO pack
        (--mh_coo; data/sparse_batch.MhCooPacker): ((field, has_vals),
        ...) in pooled-output order. Empty: the model keeps padded
        multi-hot batches (e.g. DIN, whose attention needs the per-slot
        sequence, not a sum-pool)."""
        return ()

    def coo_combine_ok(self) -> bool:
        """True when every consumer of the COO (idx, dest, w) stream is
        LINEAR in w — then the host may sum the weights of duplicate
        (row, id) pairs before packing (--mh_coo_combine;
        data/sparse_batch.combine_dups), exactly reproducing the
        reference's sum combiners with ~1.85x fewer live slots at the
        published Ali-CCP regime. Models whose per-slot math is
        nonlinear in w (DIN attention: sigmoid MLP over w * emb,
        DIN.py:152-173) must return False."""
        return False

    def wants_sorted_seg(self) -> bool:
        """True when the model's COO pooling rides the sorted-window
        segment kernels (needs the packer's cdest stream on the wire —
        4 B/slot; models that keep the fused coo_pool should not pay
        it). DIN attention only."""
        return False

    def wants_sorted_aux(self) -> bool:
        """True when the model's COO backward rides the idx-sorted aux
        stream (packer sorted_aux — perm/cidx/srows; costs an O(M) host
        radix sort per batch). DIN attention only: its [M,K] expand
        cotangent is a standalone accumulate the sorted-window kernels
        beat; ESMM's fused coo_pool backward measured better without."""
        return False

    # -------- provided
    def loss(
        self,
        params: Params,
        state: State,
        batch: Batch,
        *,
        train: bool,
        rng: Optional[jax.Array] = None,
        lookup=dense_lookup,
    ) -> Tuple[jax.Array, Tuple[Outputs, State]]:
        """Masked mean loss + explicit L2 (DeepFM.py:188-190 semantics)."""
        out, new_state = self.apply(
            params, state, batch, train=train, rng=rng, lookup=lookup
        )
        logits = out["logits"]
        label = batch["label"]
        if self.cfg.loss_type == "square_loss":
            per = M.squared_loss(logits, label)
        else:
            per = M.sigmoid_xent(logits, label)
        mask = batch.get("mask")
        if mask is None:
            data_loss = jnp.mean(per)
        else:
            data_loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return data_loss + self.l2_loss(params), (out, new_state)

    def per_example_loss(self, out: Outputs, batch: Batch) -> jax.Array:
        """[B] data-loss per example (no L2, no normalization). The
        mesh-sharded step (parallel/step.py) uses this to apply its own
        global masked-mean normalization across the data axis."""
        logits = out["logits"]
        label = batch["label"]
        if self.cfg.loss_type == "square_loss":
            return M.squared_loss(logits, label)
        return M.sigmoid_xent(logits, label)

    def eval_metrics(self, out: Outputs, batch: Batch) -> Dict[str, Tuple[jax.Array, jax.Array]]:
        """(labels, preds) pairs to feed streaming AUC; one per metric
        (reference: {"auc": tf.metrics.auc(labels, pred)}, DeepFM.py:193)."""
        return {"auc": (batch["label"], out["prob"])}

    @property
    def prediction_keys(self):
        """Keys written by infer (reference predict_keys='prob')."""
        return ["prob"]
