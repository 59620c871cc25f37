"""Host-side batch dedup for the lazy sparse-table update path.

For each sparse table (model.sparse_slots()) this mapper computes the
batch's unique id set and rewrites the batch:

  batch["__uids_<table>"]  int32[S_pad]  unique ids, ascending, padded
                                         with the sentinel `vocab` (one
                                         past the last row — dropped by
                                         the device-side scatter)
  batch[<id field>]        remapped to POSITIONS into __uids_<table>

so the device can gather rows once and differentiate w.r.t. them
(train/sparse.py). S_pad is static per batch shape (total id slots), so
jit compiles once.

Dedup is an O(V + N) flag array — NOT a sort: np.unique's sort costs
~10x more at 385k ids, and on the TPU itself both paths are measured
dead (jnp.sort: 12 s / 342k int32; XLA 4.5M-row scatter: erratic
39-435 ms — CLAUDE.md). The scratch arrays (V bools + V int32) are
allocated once and reused: fresh ~20MB allocations page-fault at
~1 GB/s on this machine.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional

import numpy as np

from tf_repos_tpu.train.sparse import UIDS_PREFIX


class SparseBatchMapper:
    """pad_mode:
      "pow2" (default): S_pad = the smallest power of two holding the
        batch's ACTUAL unique count, growing monotonically across batches.
        Measured on v5e (ESMM 4.5M, B=4096): the device-side row-op cost
        is driven by the STATIC uids length, not the live row count —
        sentinel rows are not free — so worst-case padding (385k slots)
        made the lazy path 2x slower than dense even when only 20k rows
        were really touched. Monotonic growth bounds recompiles to
        log2(S) bucket jumps for the whole run.
      "max": static worst case (total id slots + 1) — one compile ever;
        use when recompilation is costlier than the wasted transactions
        (tiny runs, CI)."""

    def __init__(self, slots: Dict[str, "SparseSlot"], pad_mode: str = "pow2"):
        floor = 0
        if pad_mode.startswith("pow2:"):
            # "pow2:<floor>" — start every bucket at <floor> slots. The
            # monotonic pow2 growth costs one full scan-program recompile
            # per doubling (measured: they dominate the first epoch's
            # wall clock at 4.5M vocab); a floor near the steady-state
            # unique count skips the whole growth ladder.
            pad_mode, floor = "pow2", int(pad_mode.split(":", 1)[1])
        if pad_mode not in ("pow2", "max"):
            raise ValueError(f"pad_mode {pad_mode!r} not in ('pow2', 'max', 'pow2:<floor>')")
        self.slots = slots
        self.pad_mode = pad_mode
        self._seen: Dict[str, np.ndarray] = {}
        self._remap: Dict[str, np.ndarray] = {}
        self._bucket: Dict[str, int] = {n: floor for n in slots} if floor else {}

    def _s_pad(self, name: str, vocab: int, total_slots: int, uniq: int) -> int:
        if self.pad_mode == "max":
            # uniq can exceed total_slots+1 when the static-prefix seed
            # is larger than the batch's id count (tiny packed batches)
            return min(max(total_slots + 1, uniq), vocab)
        # quarter-pow2 ladder (round 4, see quarter_pow2): every
        # S_pad-proportional device op — the optimizer leg's vocab-row
        # gathers/scatters above all — pays for PADDED rows, and pow2
        # wasted up to 100% of them (107,832 uniques -> 131,072 at the
        # published point; the ladder gives 114,688 = 12.5% fewer rows)
        bucket = max(self._bucket.get(name, 0), quarter_pow2(uniq))
        bucket = min(bucket, vocab)
        bucket = max(bucket, uniq)  # vocab-capped bucket must still fit
        self._bucket[name] = bucket
        return bucket

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch = dict(batch)
        for name, slot in self.slots.items():
            vocab = slot.vocab
            seen = self._seen.get(name)
            if seen is None:
                seen = self._seen.setdefault(name, np.zeros(vocab, np.bool_))
                self._remap.setdefault(name, np.zeros(vocab, np.int32))
            remap = self._remap[name]
            seen.fill(False)

            # packer-first ordering (round 5): MhCooPacker may run
            # BEFORE this mapper, consuming the padded multi-hot fields
            # and leaving their LIVE ids in the COO idx stream — dedup
            # then scans ~live ids instead of every padded slot
            # (7.6M -> 1.3M at the published ESMM point, the mapper was
            # 189 ms/batch of the host chain). The unique set is
            # IDENTICAL: dead padding slots carry id 0, which is always
            # seeded. Fields absent from the batch are the packed ones;
            # the COO idx array joins this slot's remap set when any of
            # its fields were packed.
            present = [f for f in slot.fields if f in batch]
            fields = [np.asarray(batch[f]) for f in present]
            extra = []
            if MHC_IDX in batch and len(present) < len(slot.fields):
                extra = [MHC_IDX]
                fields.append(np.asarray(batch[MHC_IDX]))
            ids = np.concatenate([a.ravel() for a in fields])
            # id 0 (the reserved padding row) is always in the unique set;
            # u is ascending, so 0 keeps position 0 and the models'
            # `ids > 0` multi-hot masking survives the remap unchanged.
            # Likewise ids 1..static (constant-id continuous rows,
            # SparseSlot.static): seeding the whole prefix makes
            # position == id for every id <= static unconditionally, so
            # the model's static-rows slice works on the gathered matrix
            seen[: slot.static + 1] = True
            seen[ids] = True
            u = np.flatnonzero(seen)  # ascending unique, int64
            remap[u] = np.arange(u.size, dtype=np.int32)

            total_slots = sum(int(a.size) for a in fields) + 1
            s_pad = self._s_pad(name, vocab, total_slots, int(u.size))
            uids = np.full(s_pad, vocab, np.int32)
            uids[: u.size] = u
            batch[UIDS_PREFIX + name] = uids
            for f, arr in zip(present + extra, fields):
                batch[f] = np.take(remap, arr, mode="clip")
            if extra and MHC_SROWS in batch:
                # the sorted-aux run table holds the same raw ids the
                # COO idx stream did — same monotonic remap (order and
                # run structure survive; pad 0 -> row 0, masked off on
                # device)
                batch[MHC_SROWS] = np.take(
                    remap, batch[MHC_SROWS], mode="clip"
                )
        return batch


def mapped_batches(it: Iterable, mapper) -> Iterator:
    for b in it:
        yield mapper(b)


def combine_dups(a: np.ndarray, v: "Optional[np.ndarray]" = None):
    """Combine duplicate ids within each ROW of a padded multi-hot field.

    Returns (flat combined ids, flat combined weights, per-row combined
    counts). v=None weighs each occurrence 1.0 (mask-only groups);
    otherwise weights of duplicate (row, id) pairs are SUMMED — exact for
    the reference's sum combiners (tf.nn.embedding_lookup_sparse
    combiner="sum", DeepCvrMTL.py:155-159; linear in sp_weights) up to
    float summation order. Measured at the published Ali-CCP regime
    (avg 250 ids/sample, Zipf 1.2): 1.85x fewer live COO slots — every
    M-proportional device op (pool fwd/bwd RMWs, expand) and wire byte
    shrinks by that factor. Dispatches to the C++ per-row hash
    (native_src/coo_combine.cpp, ~memory speed) with a np.unique
    fallback (~103 ms/batch at B=4096 — correctness only)."""
    from tf_repos_tpu.data import native

    if native.available():
        return native.combine_dups(a, v)
    b, p = a.shape
    fa = a.reshape(-1)
    lv = np.flatnonzero(fa > 0)
    w = (
        v.reshape(-1)[lv].astype(np.float32)
        if v is not None
        else np.ones(lv.size, np.float32)
    )
    key = ((lv // p).astype(np.int64) << 32) | fa[lv].astype(np.int64)
    uk, inv = np.unique(key, return_inverse=True)
    wc = np.bincount(inv, weights=w).astype(np.float32)
    ids_c = (uk & 0xFFFFFFFF).astype(np.int32)
    rows = (uk >> 32).astype(np.int64)
    cnt = np.bincount(rows, minlength=b).astype(np.int32)
    return ids_c, wc, cnt


MHC_IDX = "__mhc_idx"
MHC_DEST = "__mhc_dest"
MHC_W = "__mhc_w"
# per-(field,row) live counts, int32[n_data, n_groups, B_local] in the
# packer's field-major emission order — both the slim wire's dest
# replacement (data/slim_wire.py) and the sorted-window attention path
# (models/din.py + ops/pallas_sparse.make_sorted_seg) key off it
MHC_CNT = "__mhc_cnt"
# compact segment id per live slot (running count of non-empty
# (field,row) pairs): int32[n_data, M_bucket], nondecreasing with
# increments <= 1 — the sorted-window kernels' index stream. Emitted by
# the HOST (np.repeat here, ~ms at 1.3M slots) because building it
# in-graph costs ~10 ms of cumsum+searchsorted per step on v5e.
# Sentinel/bucket padding is 0 like the other COO arrays: the pad slots
# carry w=0 (zero vals rows), and a 0 after the live prefix only makes
# the window mask drop them — pooled rows are unaffected (the kernels
# never consult dest).
MHC_CDEST = "__mhc_cdest"
# idx-sorted auxiliary stream (packer sorted_aux=True; models/din.py's
# sorted BACKWARD accumulate): perm = stable idx-ascending order of the
# live slots (int32[nd, M_bucket]); cidx = compact run id per sorted
# position (nondecreasing, increments <= 1); srows = table id per run
# (int32[nd, Su_bucket], raw ids at packer time — the mapper remaps
# them exactly like __mhc_idx; remap is monotonic so the sort order and
# run structure survive). All pad with 0: the device masks sorted
# positions >= sum(counts), so 0-sentinel growth is harmless.
MHC_PERM = "__mhc_perm"
MHC_CIDX = "__mhc_cidx"
MHC_SROWS = "__mhc_srows"


def quarter_pow2(m: int) -> int:
    """Smallest value >= m on the quarter-pow2 ladder {h, 1.25h, 1.5h,
    1.75h, 2h} (h = pow2). Pure pow2 buckets waste up to 100% of every
    M-proportional device op on padding — measured at the published
    Ali-CCP point: 1.20M live COO slots -> 2.10M pow2 bucket, 75%
    overhead on the gather/scatter/pool chain that dominates the step.
    The quarter ladder caps padding waste at 25% for ~2 extra recompiles
    per doubling (monotonic growth still bounds total recompiles to
    ~4x log2(spread) for the run)."""
    m = int(m)
    if m <= 1:
        return 1
    p = 1 << (m - 1).bit_length()
    q = p >> 3  # h/4
    if q:
        h = p >> 1
        for c in (h + q, h + 2 * q, h + 3 * q):
            if m <= c:
                return c
    return p


class MhPadBucketer:
    """Slice padded multi-hot fields to the batch's live width (--mh_bucket).

    The reader pads every multi-hot field to the static --multi_hot_pad
    (the VarLen -> fixed-shape TPU contract, data/ragged.py), but the
    device cost of everything downstream — the [B, pad, K] embedding
    expand, DIN's attention MLP over [B, pad, 3K] (DIN.py:152-173) — is
    proportional to the PADDED width while true Ali-CCP lengths are ~4-8.
    --mh_coo removes the waste for SUM-POOLED groups by re-packing live
    slots as COO; DIN's attention is per-slot and cannot sum-pool, so
    this bucketer attacks the same waste one level earlier: slice each
    field to a per-field quarter-pow2 bucket of the batch's last live
    column (monotonic growth, the uids-bucket recompile rule;
    "pow2:<floor>" starts every bucket at <floor>).

    Exactness: a column is dropped only if EVERY row has id == 0 there,
    and id==0 slots are dead by the models' mask convention (DIN masks
    ids > 0, the packers/pools zero vals at ids <= 0) — the sliced batch
    computes the identical function. The live width is taken from id
    POSITIONS (last nonzero column), so right-padded and interleaved
    layouts are both safe.

    pairs: ((ids_field, vals_field | None), ...) — vals slice with their
    ids so elementwise id/val consumers keep aligned shapes."""

    def __init__(self, pairs, mode: str = "pow2"):
        floor = 0
        if mode.startswith("pow2:"):
            mode, floor = "pow2", int(mode.split(":", 1)[1])
        if mode != "pow2":
            raise ValueError(f"--mh_bucket {mode!r} not in ('off', 'pow2', 'pow2:<floor>')")
        self.pairs = tuple(pairs)
        self._bucket: Dict[str, int] = {ids: max(floor, 1) for ids, _ in self.pairs}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch = dict(batch)
        for ids_f, vals_f in self.pairs:
            if ids_f not in batch:
                continue
            a = np.asarray(batch[ids_f])
            p = a.shape[-1]
            live_cols = (a != 0).any(axis=tuple(range(a.ndim - 1)))
            width = int(p - np.argmax(live_cols[::-1])) if live_cols.any() else 0
            bucket = max(self._bucket[ids_f], quarter_pow2(width))
            bucket = min(bucket, p)
            self._bucket[ids_f] = bucket
            if bucket < p:
                batch[ids_f] = a[..., :bucket]
                if vals_f and vals_f in batch:
                    batch[vals_f] = np.asarray(batch[vals_f])[..., :bucket]
        return batch


class MhCooPacker:
    """Padded multi-hot groups -> COO triplet of LIVE slots (--mh_coo).

    The padded [B, pad] formulation pays one device row move per SLOT —
    measured 19.6 ms of the 30.7 ms pad-64 ESMM sparse step while
    ~85-90% of slots are dead padding (true lengths ~4-8). The reference
    never paid this: tf.nn.embedding_lookup_sparse consumes COO sp_ids
    (DeepCvrMTL.py:152-164). This packer restores that form on the host
    (prefetch thread). It may run BEFORE or AFTER SparseBatchMapper —
    liveness is `id > 0` either way (raw id 0 is the reserved padding
    row; remapped position 0 is id 0's row). Packer-FIRST is the fast
    order (round 5): the mapper then dedups the live COO idx stream
    instead of every padded slot and remaps __mhc_idx in place; the
    resulting batches are bit-identical (tested). Output:

      __mhc_idx  int32[n_data, M_pad]  table row (remapped position)
      __mhc_dest int32[n_data, M_pad]  pooled row = b_local * n_groups + g
      __mhc_w    f32[n_data, M_pad]    vals (val-bearing groups) or 1.0

    and DROPS the padded ids/vals arrays — the wire then carries ~12 B
    per live slot instead of 4-8 B per padded slot (9.4 MB -> ~1.6 MB per
    pad-64 B=4096 batch). The leading axis is the DATA-SHARD axis
    (n_data=1 on a single chip): each mesh data shard gets its own COO
    slice with dest indices local to its batch rows, so the arrays ride
    the standard leading-axis P("data") batch spec and per-shard padding
    stays shard-aligned under steps_per_dispatch stacking (the model
    flattens its local [1, M_pad] view). M_pad is shared across shards
    and grows over quarter-pow2 buckets monotonically (see quarter_pow2:
    pow2 wasted up to 100% of the M-proportional device ops on padding,
    the quarter ladder caps it at 25%); padded COO entries are idx=dest=0, w=0 —
    they add exactly zero into pooled row 0. Device side:
    ops/pallas_sparse.make_coo_pool (VMEM segment pool, cost ∝ live
    slots) or the XLA .at[].add fallback — models/esmm.py."""

    def __init__(self, groups, n_data: int = 1, floor: int = 1024,
                 sorted_aux: bool = False, cdest_aux: bool = True,
                 combine: bool = False):
        if not groups:
            raise ValueError("--mh_coo: model declares no multi-hot groups")
        self.groups = tuple(groups)  # ((field, has_vals), ...)
        # --mh_coo_combine: sum the weights of duplicate (row, id) pairs
        # per field before packing (combine_dups above) — exact for the
        # reference's sum combiners, 1.85x fewer live slots at the
        # published Ali-CCP regime. The harness gates this on
        # model.coo_combine_ok() (DIN's attention MLP consumes w * emb
        # NONLINEARLY — sigmoid score per slot — so combining would
        # change its math; ESMM's pools are linear in w).
        self.combine = bool(combine)
        self.n_data = max(int(n_data), 1)
        self._bucket = max(int(floor), 1)
        # emit the idx-sorted aux stream (perm/cidx/srows) for models
        # whose BACKWARD accumulate can ride the sorted-window kernels
        # (DIN attention); costs an O(M) radix argsort per batch on the
        # host, so it is opt-in
        self.sorted_aux = bool(sorted_aux)
        # emit the compact-segment stream (__mhc_cdest, 4 B/slot) — the
        # sorted-window attention path's index stream. Models that keep
        # the fused coo_pool (ESMM) never read it; the harness gates it
        # on the consumer so their wire does not carry dead bytes.
        self.cdest_aux = bool(cdest_aux)
        self._sbucket = 512

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch = dict(batch)
        ids = [np.asarray(batch.pop(f + "ids")) for f, _ in self.groups]
        ws = []
        for (f, has_vals), a in zip(self.groups, ids):
            if has_vals:
                v = np.asarray(batch.pop(f + "vals"))
                ws.append(np.where(a > 0, v, 0.0).astype(np.float32))
            else:
                ws.append((a > 0).astype(np.float32))
        b = ids[0].shape[0]
        nd = self.n_data
        if b % nd:
            raise ValueError(
                f"--mh_coo: batch size {b} not divisible by the data-mesh "
                f"size {nd}"
            )
        bs = b // nd
        ngr = len(self.groups)
        # Per-field widths may DIFFER (--mh_bucket slices each field to
        # its own pow2 live width before this packer runs), so the COO
        # pieces are built per field and concatenated — dest is computed
        # from each field's own width. Fields sliced narrower simply
        # contribute fewer candidate slots; the pooled math is identical
        # (dest = b_local * G + g either way, scatter-add is
        # order-independent up to float summation order).
        per_idx = [[] for _ in range(nd)]
        per_dest = [[] for _ in range(nd)]
        per_w = [[] for _ in range(nd)]
        cnt = np.zeros((nd, ngr, bs), np.int32)
        for g, (a, wv) in enumerate(zip(ids, ws)):
            p = a.shape[1]
            if self.combine:
                a3 = a.reshape(nd, bs, p)
                w3 = (
                    wv.reshape(nd, bs, p)
                    if self.groups[g][1]
                    else None  # mask-only: each occurrence weighs 1.0
                )
                for s in range(nd):
                    ic, wc, cr = combine_dups(
                        a3[s], w3[s] if w3 is not None else None
                    )
                    rows = np.repeat(np.arange(bs, dtype=np.int64), cr)
                    per_idx[s].append(ic)
                    per_dest[s].append((rows * ngr + g).astype(np.int32))
                    per_w[s].append(wc)
                    cnt[s, g] = cr
                continue
            fa = a.reshape(nd, bs * p)
            fw = wv.reshape(nd, bs * p)
            for s in range(nd):
                lv = np.flatnonzero(fa[s] > 0)
                per_idx[s].append(fa[s][lv])
                per_dest[s].append(((lv // p) * ngr + g).astype(np.int32))
                per_w[s].append(fw[s][lv])
                cnt[s, g] = np.bincount(lv // p, minlength=bs)
        m_max = max((sum(a.size for a in per_idx[s]) for s in range(nd)), default=0)
        bucket = max(self._bucket, quarter_pow2(m_max))
        self._bucket = bucket
        idx = np.zeros((nd, bucket), np.int32)
        dest = np.zeros((nd, bucket), np.int32)
        w = np.zeros((nd, bucket), np.float32)
        for s in range(nd):
            m = 0
            for ia, da, wa in zip(per_idx[s], per_dest[s], per_w[s]):
                idx[s, m : m + ia.size] = ia
                dest[s, m : m + ia.size] = da
                w[s, m : m + ia.size] = wa
                m += ia.size
        batch[MHC_IDX], batch[MHC_DEST], batch[MHC_W] = idx, dest, w
        batch[MHC_CNT] = cnt
        if self.cdest_aux:
            cd = np.zeros((nd, bucket), np.int32)
            for s in range(nd):
                cf = cnt[s].reshape(-1)
                nzr = cf > 0
                c_of = (np.cumsum(nzr) - 1).astype(np.int32)
                live = np.repeat(np.maximum(c_of, 0), cf)
                cd[s, : live.size] = live
            batch[MHC_CDEST] = cd
        if self.sorted_aux:
            perm = np.zeros((nd, bucket), np.int32)
            cidx = np.zeros((nd, bucket), np.int32)
            runs_per = []
            for s in range(nd):
                m = int(cnt[s].sum())
                order = np.argsort(
                    idx[s, :m], kind="stable"
                ).astype(np.int32)
                si = idx[s, :m][order]
                if m:
                    starts = np.empty(m, np.bool_)
                    starts[0] = True
                    starts[1:] = si[1:] != si[:-1]
                    cidx[s, :m] = (np.cumsum(starts) - 1).astype(np.int32)
                    runs_per.append(si[starts])
                else:
                    runs_per.append(np.zeros(0, np.int32))
                perm[s, :m] = order
            self._sbucket = max(
                self._sbucket,
                quarter_pow2(max((r.size for r in runs_per), default=0)),
            )
            srows = np.zeros((nd, self._sbucket), np.int32)
            for s, r in enumerate(runs_per):
                srows[s, : r.size] = r
            batch[MHC_PERM], batch[MHC_CIDX] = perm, cidx
            batch[MHC_SROWS] = srows
        return batch


class GlobalUidsUnion:
    """Multi-host uid union: turn per-host local unique-id sets into the
    GLOBAL set the sharded sparse step replicates (parallel/sparse_step.py).

    Each host's loader dedups only its local batch slice; this exchanges
    the local sets (two process_allgathers per table: max count, then the
    sentinel-padded arrays), unions them with the same O(V+N) flag array
    as the mapper, and re-remaps the already-remapped id fields from
    local positions to global positions (g is ascending, so a
    searchsorted over the local real uids gives the translation).

    MUST be called from the main training-loop thread in the same batch
    order on every host — it issues collectives, and a prefetch thread
    would interleave them with the train step's psums (deadlock). The
    pow2 bucket is a deterministic function of the (identical) global
    unique count plus monotonic growth from identical history, so every
    host compiles identical shapes."""

    def __init__(self, slots: Dict[str, "SparseSlot"], bucketed_pairs=()):
        self.slots = slots
        self._bucket: Dict[str, int] = {}
        self._seen: Dict[str, np.ndarray] = {}
        self._coo_bucket = 0
        # --mh_bucket pairs ((ids, vals|None), ...): per-host live-width
        # slicing needs the same cross-host shape consensus as the COO
        # bucket — allgather the widths, re-pad to the monotonic max
        # (zeros: the dead-slot convention the slicing removed)
        self.bucketed_pairs = tuple(bucketed_pairs)
        self._mh_width: Dict[str, int] = {ids: 0 for ids, _ in self.bucketed_pairs}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from jax.experimental import multihost_utils

        batch = dict(batch)
        for name, slot in self.slots.items():
            key = UIDS_PREFIX + name
            local = np.asarray(batch[key])
            counts = np.asarray(
                multihost_utils.process_allgather(np.int32(local.shape[0]))
            )
            m = int(counts.max())
            padded = np.full(m, slot.vocab, np.int32)
            padded[: local.shape[0]] = local
            all_u = np.asarray(multihost_utils.process_allgather(padded)).ravel()

            seen = self._seen.get(name)
            if seen is None:
                seen = self._seen.setdefault(name, np.zeros(slot.vocab, np.bool_))
            seen.fill(False)
            seen[all_u[all_u < slot.vocab]] = True
            g = np.flatnonzero(seen).astype(np.int32)

            # same quarter-pow2 ladder as SparseBatchMapper._s_pad: the
            # bucket is a deterministic function of the (identical)
            # global count + identical history, so every host agrees
            bucket = max(self._bucket.get(name, 0), quarter_pow2(int(g.size)))
            bucket = min(bucket, slot.vocab)
            bucket = max(bucket, int(g.size))
            self._bucket[name] = bucket

            guids = np.full(bucket, slot.vocab, np.int32)
            guids[: g.size] = g
            # local position -> global position (both ascending uid lists)
            n_real = int((local < slot.vocab).sum())
            lp2gp = np.zeros(max(local.shape[0], 1), np.int32)
            lp2gp[:n_real] = np.searchsorted(g, local[:n_real]).astype(np.int32)
            # under --slim_transfer the encoder ran on the prefetch thread
            # and split "feat_ids" into the implicit static prefix (whose
            # positions are INVARIANT here: every local set contains the
            # full 0..static prefix, so lp2gp[i] == i across it) plus the
            # explicit cat-id block — remap whichever representation the
            # batch carries
            from tf_repos_tpu.data.slim_wire import CAT_IDS

            coo_owned = False
            for f in slot.fields:
                if f in batch:
                    batch[f] = np.take(lp2gp, batch[f], mode="clip")
                elif f == "feat_ids" and CAT_IDS in batch:
                    batch[CAT_IDS] = np.take(lp2gp, batch[CAT_IDS], mode="clip")
                elif MHC_IDX in batch:
                    # --mh_coo dropped the padded multi-hot fields; their
                    # live slots ride the COO idx array (remap it once,
                    # for the table that owns the packed fields)
                    coo_owned = True
            if coo_owned:
                batch[MHC_IDX] = np.take(lp2gp, batch[MHC_IDX], mode="clip")
                # the idx-sorted aux stream is a single-process lever
                # (its srows would need the same global rewrite plus a
                # cross-host Su-bucket consensus); drop it — the model
                # falls back to the plain packed accumulate
                for k in (MHC_PERM, MHC_CIDX, MHC_SROWS):
                    batch.pop(k, None)
            batch[key] = guids
        if MHC_IDX in batch:
            # cross-host COO bucket consensus: every host must compile and
            # dispatch IDENTICAL shapes, but each host's MhCooPacker sized
            # its pow2 bucket from its own local live count — allgather the
            # sizes and re-pad to the (monotonically grown) max. Zero
            # padding (idx=dest=0, w=0) adds exactly zero into pooled row 0.
            local_m = np.int32(batch[MHC_IDX].shape[-1])
            sizes = np.asarray(multihost_utils.process_allgather(local_m))
            self._coo_bucket = max(self._coo_bucket, int(sizes.max()))
            target = self._coo_bucket
            for k in (MHC_IDX, MHC_DEST, MHC_W, MHC_CDEST, MHC_PERM, MHC_CIDX):
                if k in batch and batch[k].shape[-1] < target:
                    a = np.asarray(batch[k])
                    batch[k] = np.pad(
                        a, [(0, 0)] * (a.ndim - 1) + [(0, target - a.shape[-1])]
                    )
        present = [
            (ids_f, vals_f)
            for ids_f, vals_f in self.bucketed_pairs
            if ids_f in batch
        ]
        if present:
            # --mh_bucket width consensus (absent under --mh_coo, which
            # popped the padded fields before this runs). ONE vector
            # allgather for all bucketed fields — per-field collectives
            # would pay the cross-host rendezvous latency up to 5x per
            # batch (advisor finding, round 3).
            local_w = np.asarray(
                [batch[ids_f].shape[-1] for ids_f, _ in present], np.int32
            )
            widths = np.asarray(
                multihost_utils.process_allgather(local_w)
            ).reshape(-1, local_w.size)
            maxes = widths.max(axis=0)
            for (ids_f, vals_f), wmax in zip(present, maxes):
                self._mh_width[ids_f] = max(self._mh_width[ids_f], int(wmax))
                target = self._mh_width[ids_f]
                for k in (ids_f, vals_f):
                    if k and k in batch and batch[k].shape[-1] < target:
                        a = np.asarray(batch[k])
                        batch[k] = np.pad(
                            a,
                            [(0, 0)] * (a.ndim - 1)
                            + [(0, target - a.shape[-1])],
                        )
        return batch
