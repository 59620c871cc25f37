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


# ----------------------------------------------------------- Ali-CCP wire
#
# The Ali-CCP padded batch moves ~650 B/example at pad=16 (and ~2 KB at
# pad=64) — measured input-link-bound through the dev tunnel exactly
# like the Criteo layout was. Three classes of those bytes are
# reconstructible on device:
#
#   * multi-hot VALS that are exactly the live mask (vals == (ids > 0)):
#     the remap pipeline passes raw Ali-CCP values through
#     (get_remap_mapper.py:35-38), and categorical list fields carry 1.0
#     — the encoder COMMITS the per-field contract on the first batch
#     and validates every later batch (loud failure, never silent);
#     under --mh_coo the packed w is reconstructible as (idx > 0)
#     because id 0 always keeps position 0 (data/sparse_batch.py);
#   * id widths: remapped positions are < the uids bucket size, so
#     int32 id fields narrow to uint16 whenever the bucket (or, dense
#     path, the vocab) fits — the bucket size is part of the batch
#     SHAPE, so the dtype is trace-stable per bucket;
#   * the "label" alias (always == y for Ali-CCP readers).

ALICCP_VAL_GROUPS = ("u_cat", "u_shop", "u_brand", "u_int")
ALICCP_ID_FIELDS = (
    "feat_ids", "a_catids", "a_shopids", "a_brandids", "a_intids",
    "u_catids", "u_shopids", "u_brandids", "u_intids",
)
_U16_MAX = np.iinfo(np.uint16).max

# COO-triplet compression keys (round 5, VERDICT r4 item 4): at the
# published length regime the wire is ~1.9 KB/example and nearly all of
# it is the (idx int32, dest int32->u16) COO stream at a 131k uids
# bucket. Both halves compress exactly:
#   * idx splits into __mhc_lo (u16 low bits) + __mhc_hi (the 17th bit,
#     np.packbits -> 1 bit/slot) while the bucket fits 2^17; u8 high
#     byte up to 2^24 — 4 B/slot -> 2.125 B (resp. 3 B);
#   * dest is DETERMINED by the per-(field,row) live counts: the packer
#     (data/sparse_batch.MhCooPacker) emits slots field-major with rows
#     ascending, so dest = repeat(dest_val, counts) where
#     dest_val[g, r] = r * n_groups + g — ship __mhc_cnt u16[nd, G, B]
#     (~40 KB) instead of dest (2.6 MB at M=1.3M), rebuilt on device
#     with jnp.repeat(total_repeat_length=M). Validated against the
#     actual dest on every batch; hard error if the packer order ever
#     drifts.
# Single-process only: GlobalUidsUnion rewrites idx values/pads shapes
# after this encoder would have split them.
MHC_LO = "__mhc_lo"
MHC_HI = "__mhc_hi"
# canonical definition lives with the packer (the packer now emits the
# counts itself; the encoder re-derives them from dest as validation)
from tf_repos_tpu.data.sparse_batch import MHC_CNT  # noqa: E402


class SharedWireState:
    """First-batch wire-contract decisions shared across the
    --map_workers pool's per-worker encoder instances. Without it each
    worker commits its OWN first batch (divergent droppable-vals
    verdicts → spurious mid-run ValueError) and picks the idx encoding
    from its OWN mapper's uids bucket (divergent key sets
    {__mhc_idx} vs {__mhc_lo,__mhc_hi} trip the dispatcher's same-keys
    fallback every alternation). One instance per ITERATOR, handed to
    every worker's encoder (code-review round 5).

    The committing batch is whichever worker takes the lock first — not
    necessarily stream batch 0. Either outcome stays correct: a
    non-droppable first commit just keeps the vals on the wire (less
    compression), a droppable commit makes any later contradicting
    batch fail loudly (same as the serial encoder mid-run)."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()
        self.drop: Optional[Dict[str, bool]] = None
        self.drop_w: Optional[bool] = None
        self.cnt_ok: Optional[bool] = None
        self.bound: int = 0  # monotonic max id bound (encoding form)


class AliccpSlimEncoder:
    """Host-side Ali-CCP slim encoder (prefetch thread; runs AFTER the
    dedup mapper and the --mh_coo packer, whose outputs it narrows).

    vocab: the id bound for non-mapped batches (cfg.feature_size).
    compress_coo: split the COO idx into lo/hi and replace dest with
    per-(field,row) counts (see module comment); disable under
    multi-host, where GlobalUidsUnion must rewrite the raw idx.
    shared: SharedWireState when several worker-local encoders feed one
    stream (--map_workers)."""

    def __init__(self, vocab: int, compress_coo: bool = True,
                 n_groups: int = 0,
                 shared: Optional[SharedWireState] = None,
                 drop_w_ok: bool = True):
        self.vocab = int(vocab)
        self.compress_coo = bool(compress_coo)
        self.n_groups = int(n_groups)
        self._shared = shared if shared is not None else SharedWireState()
        self._narrow_dest: Optional[bool] = None
        if not drop_w_ok:
            # --mh_coo_combine: duplicate-(row,id) weights are SUMMED on
            # the host, so w is a count (not the binary live mask) for
            # mask-only groups whenever a row repeats an id. A first
            # batch that happens to have no duplicates would latch
            # drop_w=True and a later duplicate batch would fail the
            # mid-run contract check — commit non-droppable up front.
            self._shared.drop_w = False

    # first-batch commitments live in the (possibly shared) state
    @property
    def _drop(self):
        return self._shared.drop

    @_drop.setter
    def _drop(self, v):
        self._shared.drop = v

    @property
    def _drop_w(self):
        return self._shared.drop_w

    @_drop_w.setter
    def _drop_w(self, v):
        self._shared.drop_w = v

    @property
    def _cnt_ok(self):
        return self._shared.cnt_ok

    @_cnt_ok.setter
    def _cnt_ok(self, v):
        self._shared.cnt_ok = v

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from tf_repos_tpu.data.sparse_batch import MHC_DEST, MHC_IDX, MHC_W
        from tf_repos_tpu.train.sparse import UIDS_PREFIX

        batch = dict(batch)
        batch.pop("label", None)  # alias of y, re-established on device

        # ---- multi-hot vals (padded path): drop the binary ones
        present = [f for f in ALICCP_VAL_GROUPS if f + "vals" in batch]
        if self._drop is None:
            with self._shared.lock:
                if self._drop is None:
                    self._drop = {
                        f: bool(
                            np.array_equal(
                                np.asarray(batch[f + "vals"]),
                                (np.asarray(batch[f + "ids"]) > 0).astype(
                                    np.float32
                                ),
                            )
                        )
                        for f in present
                    }
        for f in present:
            if not self._drop.get(f, False):
                continue
            ids = np.asarray(batch[f + "ids"])
            vals = np.asarray(batch.pop(f + "vals"))
            if not np.array_equal(vals, (ids > 0).astype(np.float32)):
                raise ValueError(
                    f"--slim_transfer: {f}vals stopped being the binary "
                    "live mask mid-run (first batch committed it as "
                    "droppable); this input mixes real-valued and binary "
                    "batches for the field — disable --slim_transfer"
                )

        # ---- COO w (mh_coo path): reconstructible as (idx > 0)
        if MHC_W in batch:
            idx = np.asarray(batch[MHC_IDX])
            w = np.asarray(batch[MHC_W])
            live = (idx > 0).astype(np.float32)
            if self._drop_w is None:
                with self._shared.lock:
                    if self._drop_w is None:
                        self._drop_w = bool(np.array_equal(w, live))
            if self._drop_w:
                if not np.array_equal(w, live):
                    raise ValueError(
                        "--slim_transfer: __mhc_w stopped being the binary "
                        "live mask mid-run; disable --slim_transfer"
                    )
                del batch[MHC_W]

        # ---- id narrowing: positions < uids bucket (mapped batches) or
        # raw ids < vocab (dense batches); both are trace-stable bounds
        uids_keys = [k for k in batch if k.startswith(UIDS_PREFIX)]
        bound = (
            min(batch[k].shape[-1] for k in uids_keys)
            if uids_keys
            else self.vocab
        )
        # the encoding FORM (u16 idx vs lo/hi split vs u8-high) must be
        # identical across the worker pool even while per-worker mapper
        # buckets diverge — take the monotonic max bound over all
        # workers, so the form switches at most twice per run globally
        with self._shared.lock:
            self._shared.bound = max(self._shared.bound, int(bound))
            bound = self._shared.bound
        # ---- dest -> per-(field,row) counts, BEFORE the idx split (the
        # raw idx's nonzero prefix is the exact live-slot extent)
        if (
            self.compress_coo
            and self.n_groups > 0
            and MHC_DEST in batch
            and MHC_IDX in batch
            and "y" in batch
        ):
            dest = np.asarray(batch[MHC_DEST])
            idx_raw = np.asarray(batch[MHC_IDX])
            ngr = self.n_groups
            nd = dest.shape[0]
            bs = int(np.asarray(batch["y"]).shape[0]) // max(nd, 1)
            ok = bs * nd == int(np.asarray(batch["y"]).shape[0])
            cnts = np.zeros((nd, ngr, bs), np.uint16)
            dv = (
                np.arange(bs, dtype=np.int64)[None, :] * ngr
                + np.arange(ngr, dtype=np.int64)[:, None]
            ).reshape(-1)
            for s in range(nd if ok else 0):
                nz = np.flatnonzero(idx_raw[s])
                nlive = int(nz.max(initial=-1)) + 1
                d = dest[s, :nlive].astype(np.int64)
                key = (d % ngr) * bs + d // ngr
                c = np.bincount(key, minlength=ngr * bs)
                if (
                    np.any(np.diff(key) < 0)
                    or c.max(initial=0) > _U16_MAX
                    or c.size != ngr * bs
                    or not np.array_equal(np.repeat(dv, c), d)
                    or np.any(dest[s, nlive:])
                ):
                    ok = False
                    break
                cnts[s] = c.astype(np.uint16).reshape(ngr, bs)
            if self._cnt_ok is None:
                with self._shared.lock:
                    if self._cnt_ok is None:
                        self._cnt_ok = ok
            if self._cnt_ok:
                if not ok:
                    raise ValueError(
                        "--slim_transfer: the COO dest stream stopped "
                        "matching the packer's field-major order mid-run "
                        "(first batch committed the counts form); "
                        "disable --slim_transfer"
                    )
                batch[MHC_CNT] = cnts
                del batch[MHC_DEST]
                # cdest rebuilds on device from the counts (models/din.py)
                from tf_repos_tpu.data.sparse_batch import MHC_CDEST

                batch.pop(MHC_CDEST, None)
            else:
                # dest failed the field-major validation: the packer's
                # cnt/cdest rest on the same order assumption — drop
                # them so the model keeps the raw destf formulation
                from tf_repos_tpu.data.sparse_batch import MHC_CDEST

                batch.pop(MHC_CNT, None)
                batch.pop(MHC_CDEST, None)
        if bound <= _U16_MAX:
            for f in ALICCP_ID_FIELDS:
                if f in batch:
                    batch[f] = np.asarray(batch[f]).astype(np.uint16)
            if MHC_IDX in batch:
                batch[MHC_IDX] = np.asarray(batch[MHC_IDX]).astype(np.uint16)
        elif self.compress_coo and MHC_IDX in batch:
            # lo/hi split (module comment): the bound is part of the
            # batch SHAPE (uids bucket), so the chosen form is
            # trace-stable per bucket
            idx = np.asarray(batch[MHC_IDX])
            if bound <= (1 << 17):
                batch[MHC_LO] = (idx & 0xFFFF).astype(np.uint16)
                batch[MHC_HI] = np.packbits(
                    (idx >> 16).astype(np.uint8), axis=-1
                )
                del batch[MHC_IDX]
            elif bound <= (1 << 24):
                batch[MHC_LO] = (idx & 0xFFFF).astype(np.uint16)
                batch[MHC_HI] = (idx >> 16).astype(np.uint8)
                del batch[MHC_IDX]
        if MHC_DEST in batch:
            dest = np.asarray(batch[MHC_DEST])
            if self._narrow_dest is None:
                # dest < B_local * n_groups, constant per run
                self._narrow_dest = bool(dest.max(initial=0) <= _U16_MAX)
            if self._narrow_dest:
                batch[MHC_DEST] = dest.astype(np.uint16)
        return batch


def decode_aliccp_batch(batch: Batch) -> Batch:
    """Ali-CCP slim wire -> full batch (pure jnp; runs inside jit). The
    reconstruction is keyed entirely off the batch structure: uint16
    arrays widen to int32, absent vals rebuild as the live mask, the
    label alias rebuilds from y — full (non-slim) batches pass through
    unchanged."""
    from tf_repos_tpu.data.sparse_batch import MHC_DEST, MHC_IDX, MHC_W

    out = {
        k: (v.astype(jnp.int32) if v.dtype == jnp.uint16 else v)
        for k, v in batch.items()
    }
    if MHC_LO in out:
        lo = out.pop(MHC_LO)
        hi = out.pop(MHC_HI)
        m = lo.shape[-1]
        if hi.shape[-1] != m:  # bit-packed 17th bit
            hi = jnp.unpackbits(hi, axis=-1, count=m)
        out[MHC_IDX] = lo | (hi.astype(jnp.int32) << 16)
    if MHC_CNT in out and MHC_DEST not in out:
        # kept in the decoded batch: the sorted-window attention path
        # (models/din.py) derives its compact segment ids from it. When
        # the authoritative dest WAS shipped (multi-host slim,
        # compress_coo=False) it stays — rebuilding would discard the
        # transferred bytes and silently mask any dest/cnt drift.
        cnt = out[MHC_CNT] = out[MHC_CNT].astype(jnp.int32)  # [nd,ngr,bs]
        nd, ngr, bs = cnt.shape
        m = out[MHC_IDX].shape[-1]
        dv = (
            jnp.arange(bs, dtype=jnp.int32)[None, :] * ngr
            + jnp.arange(ngr, dtype=jnp.int32)[:, None]
        ).reshape(-1)

        def one(c):
            cf = c.reshape(-1)
            d = jnp.repeat(dv, cf, total_repeat_length=m)
            return jnp.where(jnp.arange(m) < jnp.sum(cf), d, 0)

        out[MHC_DEST] = jax.vmap(one)(cnt)
    for f in ALICCP_VAL_GROUPS:
        if f + "ids" in out and f + "vals" not in out:
            out[f + "vals"] = (out[f + "ids"] > 0).astype(jnp.float32)
    if MHC_IDX in out and MHC_W not in out:
        out[MHC_W] = (out[MHC_IDX] > 0).astype(jnp.float32)
    if "label" not in out and "y" in out:
        out["label"] = out["y"]
    return out


def aliccp_encoding_batches(it, vocab: int, compress_coo: bool = True,
                            n_groups: int = 0, drop_w_ok: bool = True):
    """Wrap a batch iterator with the Ali-CCP slim encoder (one encoder
    per iterator: the droppable-vals contract is committed on the first
    batch and enforced afterwards)."""
    enc = AliccpSlimEncoder(
        vocab, compress_coo=compress_coo, n_groups=n_groups,
        drop_w_ok=drop_w_ok,
    )
    for b in it:
        yield enc(b)


class SlimWireModel(CtrModel):
    """Decorator model: decodes the slim wire batch on-device, then
    delegates to the wrapped model. Because every step builder
    (train/loop.py, train/sparse.py, parallel/step.py) calls
    model.apply/loss inside its jitted function, the decode is traced
    into the SAME dispatch — no extra device round trip, and the
    host→device transfer moves only the slim arrays."""

    def __init__(self, inner: CtrModel, decode=None):
        super().__init__(inner.cfg)
        self.inner = inner
        self.name = inner.name  # instance attr shadows the class attr
        self._sf = inner.cfg.static_fields
        # format-specific decode: Criteo libsvm layout by default,
        # decode_aliccp_batch for the Ali-CCP models (harness picks)
        self._decode = decode if decode is not None else (
            lambda b: decode_batch(b, self._sf)
        )

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
            params, state, self._decode(batch),
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
            params, state, self._decode(batch),
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

    def coo_combine_ok(self) -> bool:
        return self.inner.coo_combine_ok()

    def wants_sorted_seg(self) -> bool:
        return self.inner.wants_sorted_seg()

    def wants_sorted_aux(self) -> bool:
        return self.inner.wants_sorted_aux()

    def per_example_loss(self, out: Outputs, batch: Batch):
        # decode first: the eval/predict steps hand these the RAW wire
        # batch (e.g. the Ali-CCP wire drops the label alias); decoding
        # is idempotent on full batches and XLA CSEs the duplicate with
        # the loss-path decode
        return self.inner.per_example_loss(out, self._decode(batch))

    def eval_metrics(self, out: Outputs, batch: Batch):
        return self.inner.eval_metrics(out, self._decode(batch))

    @property
    def prediction_keys(self):
        return self.inner.prediction_keys
