"""Slim host→device wire format for the Criteo libsvm layout.

The standard libsvm batch moves 320 B/example to the device
(feat_ids int32[B,39] + feat_vals f32[B,39] + label + mask). But under
the Criteo preprocessor's layout (features/criteo.py, behavioral spec
from /root/reference/deep_ctr/Feature_pipeline/get_criteo_feature.py)
most of those bytes are CONSTANTS:

  * the first ``static_fields`` (13) id columns are always 1..sf — the
    continuous fields' fixed ids (the same contract models/deepfm.py's
    --static_fields slice path relies on);
  * the remaining 26 val columns are always exactly 1.0 (categorical
    features are emitted as ``<id>:1``, get_criteo_feature.py:143-145).

So the wire only needs cont_vals f32[B,sf] + cat_ids int32[B,F-sf]
(+ label/mask) = 164 B/example — 1.95x fewer input bytes on ANY
host→device link (PCIe on colocated hosts, the dev tunnel here), and
the full batch is reconstructed EXACTLY on-device inside the already-
jitted step. The codec is mathematically exact (padding rows
reconstruct to the same zeros the dense reader emits, keyed off the
mask); end-to-end trajectories agree to float-accumulation tolerance,
not bytes, because the decode fuses into a different XLA program.

Enabled with --slim_transfer (requires --static_fields>0; libsvm
models; composes with steps_per_dispatch stacking and the sharded
data-axis placement — batch_spec shards any leading-batch-axis key).

Composes with --sparse_table_update: the harness runs the encoder
AFTER the dedup mapper (data/sparse_batch.py), whose remap keeps
position == id for the whole static prefix — ids 1..sf appear in
every valid row (they are the constant continuous-field ids), so the
ascending unique set starts [0, 1, .., sf] and SparseSlot.static
seeding pins that even for degenerate batches. Categorical vals stay
exactly 1.0 (the mapper never touches vals), so both encoder
contracts still hold on the REMAPPED batch and the wire carries
remapped cat ids + the __uids_* arrays (which ride the wire either
way). Any violation fails loudly on the host, per batch.

  encode_batch   host side (runs on the prefetch thread), validates the
                 layout contract on every batch (cheap memcmp-speed
                 checks) so a non-Criteo file fails loudly, not wrongly
  decode_batch   pure jnp, traced into the train/eval/predict steps via
                 SlimWireModel.apply
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tf_repos_tpu.models.base import Batch, CtrModel, Outputs, Params, State
from tf_repos_tpu.ops.embedding import dense_lookup

CONT_VALS = "__slim_cont_vals"
CAT_IDS = "__slim_cat_ids"


def encode_batch(batch: Dict[str, np.ndarray], sf: int) -> Dict[str, np.ndarray]:
    """Full libsvm batch -> slim wire batch (host side).

    Validates the Criteo layout contract row-by-row against the mask
    (padding rows are all-zero in the dense reader and are excluded).
    """
    ids = np.asarray(batch["feat_ids"])
    vals = np.asarray(batch["feat_vals"])
    mask = np.asarray(batch["mask"]) if "mask" in batch else np.ones(ids.shape[0], np.float32)
    valid = mask > 0

    static_ids = np.arange(1, sf + 1, dtype=ids.dtype)
    want_ids = np.where(valid[:, None], static_ids[None, :], 0)
    if not np.array_equal(ids[:, :sf], want_ids):
        raise ValueError(
            "--slim_transfer: feat_ids[:, :static_fields] are not the "
            "constant 1..sf Criteo continuous-field ids (see "
            "features/criteo.py layout); this input file does not match "
            "the --static_fields contract"
        )
    want_vals = valid.astype(vals.dtype)[:, None]
    if not np.array_equal(vals[:, sf:], np.broadcast_to(want_vals, vals[:, sf:].shape)):
        raise ValueError(
            "--slim_transfer: feat_vals[:, static_fields:] are not all "
            "exactly 1.0 (categorical '<id>:1' emission); this input "
            "file does not match the Criteo layout"
        )

    out = {k: v for k, v in batch.items() if k not in ("feat_ids", "feat_vals")}
    out[CONT_VALS] = np.ascontiguousarray(vals[:, :sf])
    out[CAT_IDS] = np.ascontiguousarray(ids[:, sf:])
    return out


def decode_batch(batch: Batch, sf: int) -> Batch:
    """Slim wire batch -> full batch (pure jnp; runs inside jit)."""
    if CONT_VALS not in batch:
        return batch
    cont_vals = batch[CONT_VALS]
    cat_ids = batch[CAT_IDS]
    B = cat_ids.shape[0]
    mask = batch.get("mask")
    valid = (mask > 0) if mask is not None else jnp.ones((B,), bool)
    static_ids = jnp.where(
        valid[:, None], jnp.arange(1, sf + 1, dtype=cat_ids.dtype)[None, :], 0
    )
    cat_vals = jnp.broadcast_to(
        valid.astype(cont_vals.dtype)[:, None], (B, cat_ids.shape[1])
    )
    out = {k: v for k, v in batch.items() if k not in (CONT_VALS, CAT_IDS)}
    out["feat_ids"] = jnp.concatenate([static_ids, cat_ids], axis=1)
    out["feat_vals"] = jnp.concatenate([cont_vals, cat_vals], axis=1)
    return out


def encoding_batches(it, sf: int):
    """Wrap a batch iterator with the host-side encoder (composes with
    data.pipeline.Prefetcher so the encode cost rides the prefetch
    thread, off the dispatch loop)."""
    for b in it:
        yield encode_batch(b, sf)


class SlimWireModel(CtrModel):
    """Decorator model: decodes the slim wire batch on-device, then
    delegates to the wrapped model. Because every step builder
    (train/loop.py, train/sparse.py, parallel/step.py) calls
    model.apply/loss inside its jitted function, the decode is traced
    into the SAME dispatch — no extra device round trip, and the
    host→device transfer moves only the slim arrays."""

    def __init__(self, inner: CtrModel):
        super().__init__(inner.cfg)
        self.inner = inner
        self.name = inner.name  # instance attr shadows the class attr
        self._sf = inner.cfg.static_fields

    # decode seam
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
        return self.inner.apply(
            params, state, decode_batch(batch, self._sf),
            train=train, rng=rng, lookup=lookup,
        )

    def loss(
        self,
        params: Params,
        state: State,
        batch: Batch,
        *,
        train: bool,
        rng: Optional[jax.Array] = None,
        lookup=dense_lookup,
    ):
        # decode-then-delegate (not the inherited CtrModel.loss over
        # self.apply): a model that OVERRIDES loss (e.g. a multi-task
        # joint loss) must see its own loss, not the base one
        return self.inner.loss(
            params, state, decode_batch(batch, self._sf),
            train=train, rng=rng, lookup=lookup,
        )

    # pure delegation (label/mask pass through the slim batch unchanged,
    # so loss/per_example_loss/eval_metrics inherited from CtrModel are
    # correct too — but forward them so a model override still wins)
    def init(self, rng):
        return self.inner.init(rng)

    def l2_loss(self, params):
        return self.inner.l2_loss(params)

    def param_spec(self):
        return self.inner.param_spec()

    def sparse_slots(self):
        return self.inner.sparse_slots()

    def mh_coo_groups(self):
        return self.inner.mh_coo_groups()

    def per_example_loss(self, out: Outputs, batch: Batch):
        return self.inner.per_example_loss(out, batch)

    def eval_metrics(self, out: Outputs, batch: Batch):
        return self.inner.eval_metrics(out, batch)

    @property
    def prediction_keys(self):
        return self.inner.prediction_keys
