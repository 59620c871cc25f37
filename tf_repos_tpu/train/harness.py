"""The Estimator-equivalent trainer harness.

Reproduces the reference main()'s lifecycle (DeepFM.py:284-366):
  task_type=train  -> train loop with periodic eval (train_and_evaluate,
                      EvalSpec throttle_secs=1200, DeepFM.py:343-346)
  task_type=eval   -> one eval pass over va files (:347-348)
  task_type=infer  -> streaming predictions to {data_dir}/pred.txt
                      (:349-353, predict_keys="prob")
  task_type=export -> versioned servable export (:354-366)

plus: date-partitioned model_dir (:286-288), --clear_existing_model
(:318-324), hyperparameter echo (:291-307), loss/steps-per-sec logging
every log_steps (RunConfig :339-340), checkpoint/resume via Orbax.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tf_repos_tpu.config import Config, echo_config
from tf_repos_tpu.data.csv import CsvDataset
from tf_repos_tpu.data.libsvm import LibsvmDataset, glob_input_files
from tf_repos_tpu.data.pipeline import Prefetcher
from tf_repos_tpu.data.ragged import AliccpDataset
from tf_repos_tpu.models import create_model, input_format
from tf_repos_tpu.models.base import CtrModel
from tf_repos_tpu.train import loop as L
from tf_repos_tpu.train.checkpoint import CheckpointManager, clear_existing_model
from tf_repos_tpu.train.optimizers import make_optimizer


class GracefulStop:
    """SIGTERM -> finish the in-flight dispatch, break the train loop,
    checkpoint, exit 0 — preemption handling for TPU pools (preemptible /
    spot capacity sends SIGTERM with a short grace window; the reference
    relied on Estimator autosave cadence and lost the tail since the
    last save).

    Multi-host: the signal typically lands on ONE host, and a host that
    breaks early while others keep dispatching collective programs
    deadlocks the mesh — so the local flag is OR-reduced across hosts
    (process_allgather) only at eval-decision step boundaries, the same
    points every host already reaches in lockstep; all hosts then stop
    at the same step with identical collective counts."""

    def __init__(self, install: bool, decision_steps: int, k: int):
        import signal

        self.requested = False
        self.stopped = False
        self._decision_steps = max(decision_steps, 1)
        self._k = max(k, 1)
        self._prev = None
        self._installed = False
        if install:
            try:
                self._prev = signal.signal(signal.SIGTERM, self._on_signal)
                self._installed = True
            except ValueError:
                pass  # not the main thread (library use) — flag stays manual

    def _on_signal(self, signum, frame):
        self.requested = True
        print("INFO: SIGTERM received; will checkpoint and stop at a step boundary")

    def should_stop(self, step: int) -> bool:
        if jax.process_count() > 1:
            # coordinate only at boundaries every host hits at the same
            # collective count (same cadence as the eval decision)
            if step % self._decision_steps >= self._k:
                return False
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(self.requested, np.int32)
            )
            self.stopped = bool(flags.max())
        else:
            self.stopped = self.requested
        return self.stopped

    def restore(self) -> None:
        import signal

        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)


class Harness:
    def __init__(self, cfg: Config, model: Optional[CtrModel] = None):
        self.cfg = cfg
        self.model = model or create_model(cfg)
        if cfg.slim_transfer:
            fmt = input_format(self.model)
            if fmt == "libsvm":
                if cfg.static_fields <= 0:
                    raise ValueError(
                        "--slim_transfer requires --static_fields>0 (it "
                        "reconstructs the constant-id continuous block from "
                        "the same Criteo layout contract)"
                    )
                # composes with --sparse_table_update: the encoder runs
                # AFTER the dedup mapper (see _dataset ordering), and the
                # mapper's remap keeps position == id for the static prefix
                # and vals untouched — both encoder contracts still hold on
                # the remapped batch (data/slim_wire.py module docstring)
                from tf_repos_tpu.data.slim_wire import SlimWireModel

                self.model = SlimWireModel(self.model)
            elif fmt == "aliccp":
                # Ali-CCP wire: binary multi-hot vals dropped (committed
                # on the first batch, validated per batch), id fields
                # narrowed to uint16 under the uids-bucket/vocab bound,
                # label alias rebuilt on device; composes with
                # --sparse_table_update and --mh_coo (encoder runs after
                # the mapper and the COO packer)
                from tf_repos_tpu.data.slim_wire import (
                    SlimWireModel,
                    decode_aliccp_batch,
                )

                self.model = SlimWireModel(
                    self.model, decode=decode_aliccp_batch
                )
            else:
                raise ValueError(
                    "--slim_transfer supports libsvm and aliccp input "
                    f"formats (model {self.model.name} reads {fmt})"
                )
        # the canned wdl composite derives its own learning rates from
        # the model_type (wide/deep/wide_n_deep) — see canned_wdl_rates
        wdl_type = (
            cfg.model.lower()
            if cfg.model.lower() in ("wide", "deep")
            else (cfg.model_type or "wide_n_deep").lower()
        )
        self.tx = make_optimizer(cfg.optimizer, cfg.learning_rate, wdl_type)
        self.model_dir = cfg.resolved_model_dir() or "./model_ckpt"
        self.mesh = self._make_mesh()
        self._sharded = None
        self._specs = None
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        # lazy touched-rows table updates (train/sparse.py single-chip;
        # parallel/sparse_step.py under a mesh), only for models that
        # declare sparse slots
        self._sparse_slots = None
        if cfg.sparse_table_update:
            slots = self.model.sparse_slots()
            if slots:
                self._sparse_slots = slots
            else:
                print(
                    f"WARNING: --sparse_table_update: {self.model.name} "
                    "declares no sparse tables; using the dense path"
                )
        if cfg.fused_table:
            if self._sparse_slots is None:
                raise ValueError(
                    "--fused_table requires --sparse_table_update (the "
                    "fused [V,3K] w|m|v storage lives in the lazy sparse "
                    "row-update path). Works single-chip and under a mesh "
                    "(each model shard keeps a [V_local,3K] w|m|v array)."
                )
        # --mh_coo: host-side COO pack of the sum-pooled multi-hot groups
        # (data/sparse_batch.MhCooPacker) — device pooling cost scales
        # with LIVE slots, not multi_hot_pad
        self._mh_coo_groups = None
        if cfg.mh_coo:
            if self._sparse_slots is None:
                raise ValueError(
                    "--mh_coo requires --sparse_table_update (the COO idx "
                    "are remapped positions into the batch's unique rows)"
                )
            groups = self.model.mh_coo_groups()
            if not groups:
                raise ValueError(
                    f"--mh_coo: {self.model.name} declares no multi-hot "
                    "groups (libsvm/csv models have no ragged fields). "
                    "ESMM packs all 5 groups; DIN packs the 4 user groups "
                    "runs over the live COO slots (models/din.py)."
                )
            # multi-host is handled: each host packs its LOCAL batch over
            # its local data shards, and GlobalUidsUnion re-pads every
            # host's COO arrays to a cross-host pow2 bucket consensus (the
            # same main-thread collective that unions the uid sets)
            self._mh_coo_groups = groups
        # --mh_bucket: host-side pow2 slicing of the padded multi-hot
        # fields to the batch's live width (data/sparse_batch.
        # MhPadBucketer) — the pad-waste lever for the paths --mh_coo
        # cannot cover (DIN's per-slot attention, the dense Ali-CCP path)
        self._mh_bucket_pairs = None
        if cfg.mh_bucket and cfg.mh_bucket != "off":
            if input_format(self.model) != "aliccp":
                raise ValueError(
                    "--mh_bucket applies to the Ali-CCP padded multi-hot "
                    f"layout (model {self.model.name} reads "
                    f"{input_format(self.model)})"
                )
            if jax.process_count() > 1 and not cfg.sparse_table_update:
                raise ValueError(
                    "--mh_bucket under multi-host requires "
                    "--sparse_table_update: every host must dispatch "
                    "identical shapes, and the cross-host width consensus "
                    "rides GlobalUidsUnion's main-thread collectives"
                )
            from tf_repos_tpu.data.ragged import MH_PAIRS

            self._mh_bucket_pairs = MH_PAIRS
        # multi-host sparse: the sharded sparse step replicates the GLOBAL
        # unique-id set, but each host's loader dedups only its local batch
        # slice -> union the sets across hosts (collectives, so it must run
        # in the main loop thread: see _place)
        self._uids_union = None
        if self._sparse_slots is not None and jax.process_count() > 1:
            from tf_repos_tpu.data.sparse_batch import GlobalUidsUnion

            self._uids_union = GlobalUidsUnion(
                self._sparse_slots, bucketed_pairs=self._mh_bucket_pairs or ()
            )
        # --static_fields composes with --sparse_table_update on one chip
        # AND under a mesh: the sharded sparse step applies the model to
        # the REPLICATED compact rows with a plain dense lookup
        # (parallel/sparse_step.py), and the mapper's SparseSlot.static
        # seeding keeps position == id for the static block — locally and
        # after the multi-host GlobalUidsUnion (ascending union of sets
        # that each contain the full prefix). Parity-tested in
        # tests/test_sparse.py::test_sharded_sparse_static_fields_*.
        self._table_dtype = None
        if cfg.param_dtype not in ("float32", "f32", ""):
            if cfg.param_dtype not in ("bfloat16", "bf16"):
                raise ValueError(f"unsupported param_dtype {cfg.param_dtype!r}")
            if self._sparse_slots is None:
                raise ValueError(
                    "--param_dtype=bfloat16 requires --sparse_table_update "
                    "(bf16 tables are written with stochastic rounding, "
                    "which lives in the lazy sparse-update path)"
                )
            self._table_dtype = jnp.bfloat16
        if self.mesh is not None:
            if self._sparse_slots is not None:
                from tf_repos_tpu.parallel.sparse_step import ShardedSparseState

                self._sharded = ShardedSparseState(
                    self.model, self.tx, self._sparse_opt(), self.mesh,
                    table_dtype=self._table_dtype,
                )
            else:
                from tf_repos_tpu.parallel.step import ShardedState

                self._sharded = ShardedState(self.model, self.tx, self.mesh)

    def _make_mesh(self):
        """Mesh-sharded execution when >1 device is visible or the user
        asks for table sharding (mesh_model>1); plain single-device jit
        otherwise (no shard_map overhead on one chip). Explicitly
        requesting --mesh_data=1 --mesh_model=1 also selects the
        single-device path even when more devices are visible (the
        1x1-mesh shard_map adds overhead and excludes the single-chip
        -only paths like --fused_table)."""
        cfg = self.cfg
        n = len(jax.devices())
        if (n == 1 or cfg.mesh_data == 1) and cfg.mesh_model <= 1:
            return None
        from tf_repos_tpu.parallel.mesh import make_mesh

        return make_mesh(data=cfg.mesh_data, model=max(cfg.mesh_model, 1))

    # ---------------------------------------------------------- state init
    def init_train_state(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        if self._sharded is not None:
            state, self._specs = self._sharded.init(rng)
            state["step"] = 0
            return state
        params, mstate = self.model.init(rng)
        if self._sparse_slots is not None:
            from tf_repos_tpu.train import sparse as SP

            if self._table_dtype is not None:
                # bf16 table + moment storage (halves their HBM footprint);
                # row math stays f32, writes use stochastic rounding
                params = SP.cast_tables(self.model, params, self._table_dtype)
            opt_state = SP.init_opt_state(
                self.model, self.tx, self._sparse_opt(), params
            )
        else:
            opt_state = self.tx.init(params)
        return {"params": params, "opt_state": opt_state, "mstate": mstate, "step": 0}

    def _sparse_opt(self):
        from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

        # the sharded path maps out-of-shard uids to unsorted OOB slots,
        # so it cannot claim the ascending-index contract
        return make_sparse_row_optimizer(
            self.cfg.optimizer, self.cfg.learning_rate,
            fused_moments=self.cfg.fused_moments,
            sorted_indices=self.mesh is None,
            fused_table=self.cfg.fused_table,
            catchup=self.cfg.sparse_catchup,
            dma_scatter=self.cfg.dma_scatter,
        )

    def restore_or_init(self, ckpt: CheckpointManager):
        ts = self.init_train_state()
        if ckpt.latest_step() is not None:
            restored = ckpt.restore(ts)
            if restored is not None:
                return restored
        return ts

    # --------------------------------------------------------- step builders
    def _place(self, batch):
        if self._uids_union is not None and any(
            k.startswith("__uids_") for k in batch
        ):
            # main-thread host collective: local uid sets -> global set
            batch = self._uids_union(batch)
        if self._sharded is not None:
            return self._sharded.place_batch(batch)
        return batch

    def _field_block_lookup(self):
        """Pallas field-block lookup when --field_blocks is set (single-
        chip path; the sharded path keeps the psum lookup)."""
        cfg = self.cfg
        if not cfg.field_blocks or self.mesh is not None:
            return None
        if cfg.field_blocks.startswith("auto:"):
            from tf_repos_tpu.features.criteo import field_blocks_from_feature_map

            offsets, sizes = field_blocks_from_feature_map(cfg.field_blocks[5:])
        else:
            pairs = [p.split(":") for p in cfg.field_blocks.split(",")]
            offsets = tuple(int(a) for a, _ in pairs)
            sizes = tuple(int(b) for _, b in pairs)
        from tf_repos_tpu.ops.pallas_embedding import make_field_block_lookup

        return make_field_block_lookup(cfg.feature_size, offsets, sizes)

    def _pallas_expand_lookup(self):
        """Pallas VMEM expand/accumulate lookup when --pallas_expand is
        set — the sparse path's inner (remapped-id) lookup, both on one
        chip and under a mesh (where the compact [S_pad,K] working set
        is per-device replicated, so the kernel is purely local)."""
        if not self.cfg.pallas_expand:
            return None
        from tf_repos_tpu.ops.pallas_sparse import make_vmem_expand_lookup

        return make_vmem_expand_lookup()

    def _get_train_step(self):
        """Unified signature: (state_dict, placed_batch, rng) ->
        (state_dict, loss)."""
        if self._train_step is not None:
            return self._train_step
        if self.mesh is not None and self._sparse_slots is not None:
            from tf_repos_tpu.parallel.sparse_step import (
                build_sharded_sparse_train_step,
            )

            self._train_step = build_sharded_sparse_train_step(
                self.model, self.tx, self._sparse_opt(), self.mesh, self._specs,
                inner_lookup=self._pallas_expand_lookup(),
            )
        elif self.mesh is not None:
            from tf_repos_tpu.parallel.step import build_sharded_train_step

            self._train_step = build_sharded_train_step(
                self.model, self.tx, self.mesh, self._specs
            )
        elif self._sparse_slots is not None:
            from tf_repos_tpu.train.sparse import build_sparse_train_step

            inner_sp = build_sparse_train_step(
                self.model, self.tx, self._sparse_opt(),
                lookup=self._pallas_expand_lookup(),
            )

            def sstep(state, batch, rng):
                p, o, m, loss = inner_sp(
                    state["params"], state["opt_state"], state["mstate"], batch, rng
                )
                return {"params": p, "opt_state": o, "mstate": m}, loss

            self._train_step = sstep
        else:
            inner = L.build_train_step(self.model, self.tx, lookup=self._field_block_lookup())

            def step(state, batch, rng):
                p, o, m, loss = inner(
                    state["params"], state["opt_state"], state["mstate"], batch, rng
                )
                return {"params": p, "opt_state": o, "mstate": m}, loss

            self._train_step = step
        return self._train_step

    def _get_eval_step(self):
        if self._eval_step is not None:
            return self._eval_step
        if self.mesh is not None:
            from tf_repos_tpu.parallel.step import build_sharded_eval_step

            self._eval_step = build_sharded_eval_step(self.model, self.mesh, self._specs)
        else:
            self._eval_step = L.build_eval_step(self.model)
        return self._eval_step

    def _get_predict_step(self):
        if self._predict_step is not None:
            return self._predict_step
        if self.mesh is not None:
            from tf_repos_tpu.parallel.step import build_sharded_predict_step

            self._predict_step = build_sharded_predict_step(
                self.model, self.mesh, self._specs
            )
        else:
            self._predict_step = L.build_predict_step(self.model)
        return self._predict_step

    # ------------------------------------------------------------- datasets
    def _dataset(self, split: str, *, shuffle: bool, epochs: int) -> Iterable:
        """split in {tr, va, te}; the reader is chosen by the model's
        input format: libsvm (DeepFM family), csv (wide_n_deep,
        wide_n_deep.py:67-89), aliccp sample lines (DIN/ESMM — the
        static-shape replacement for the reference's VarLen TFRecords,
        DIN.py:57-99)."""
        cfg = self.cfg
        fmt = input_format(self.model)
        files = self._glob_split(split, shuffle=shuffle)
        if jax.process_count() > 1 and split == "tr":
            # per-host input sharding — the file-list split the reference
            # gets implicitly from async workers (run_dist.sh)
            from tf_repos_tpu.data.pipeline import shard_files_for_host

            files = shard_files_for_host(files, jax.process_index(), jax.process_count())
        if not files:
            raise FileNotFoundError(
                f"no {split}* input files for format {fmt} in {cfg.data_dir}"
            )
        ds = self._build_reader(files, fmt, shuffle=shuffle, epochs=epochs)
        chain_factories = []
        slim_in_chain = False
        if self._mh_bucket_pairs is not None and (
            split in ("tr", "va") or jax.process_count() == 1
        ):
            # live-width slicing BEFORE the dedup mapper (smaller id
            # arrays for everything downstream). Multi-host width
            # consensus per split (every host must dispatch identical
            # shapes): tr batches differ per host and ride
            # GlobalUidsUnion's re-pad; va streams are IDENTICAL on
            # every host (va files are not host-sharded, shuffle=False,
            # no parallel map), so per-batch width decisions agree
            # deterministically with no channel; te (infer) shards
            # files per host under multi-process and keeps fixed pads
            # (batch shapes must be static across hosts there).
            from tf_repos_tpu.data.sparse_batch import MhPadBucketer

            pairs, mode = self._mh_bucket_pairs, cfg.mh_bucket
            chain_factories.append(lambda: MhPadBucketer(pairs, mode))
        if split == "tr" and self._sparse_slots is not None:
            from tf_repos_tpu.data.sparse_batch import SparseBatchMapper

            slots, pad_mode = self._sparse_slots, cfg.sparse_pad_mode
            if self._mh_coo_groups is not None:
                # packer BEFORE the mapper (round 5): the packer needs
                # only raw-id liveness (ids > 0), and the mapper then
                # dedups/remaps the LIVE COO idx stream instead of
                # every padded slot — the mapper leg measured
                # 189 -> ~35 ms/batch at the published ESMM point
                # (batches are bit-identical either way; the mapper
                # picks up __mhc_idx as the packed fields' id source).
                # One COO slice per LOCAL data shard (dest local to the
                # shard; this host's loader batch covers only its own
                # slice of the data axis).
                from tf_repos_tpu.data.sparse_batch import MhCooPacker
                from tf_repos_tpu.parallel.step import DATA_AXIS

                n_data = max(
                    self.mesh.shape[DATA_AXIS] // jax.process_count()
                    if self.mesh is not None
                    else 1,
                    1,
                )
                groups = self._mh_coo_groups
                # idx-sorted aux stream for the sorted BACKWARD
                # accumulate (DIN attention + Pallas kernels only).
                # NOT under --slim_transfer: perm+cidx are ~8 B/slot of
                # wire (~10 MB/batch at the published point) — on the
                # link-bound paths slim serves, that costs more than the
                # ~10 ms device win buys; the model falls back to the
                # plain packed accumulate there.
                saux = bool(
                    cfg.coo_sorted_bwd
                    and cfg.pallas_expand
                    and self.model.wants_sorted_aux()
                    and not cfg.slim_transfer
                )
                floor = max(int(cfg.mh_coo_floor), 1) if cfg.mh_coo_floor else 1024
                # --mh_coo_combine: exact only when every COO consumer
                # is linear in w (sum combiners); DIN's attention MLP
                # is not — auto-disable with a signal
                comb = self._coo_combine_active()
                if cfg.mh_coo_combine and not comb:
                    print(
                        f"WARNING: --mh_coo_combine disabled: "
                        f"{self.model.name} consumes the COO w stream "
                        "nonlinearly (per-slot attention); combining "
                        "duplicate ids would change its math"
                    )
                # not under slim: the encoder drops cdest from the wire
                # (the device rebuilds it from the counts), so emitting
                # it would only burn host time in the packer
                cdaux = bool(
                    cfg.pallas_expand
                    and self.model.wants_sorted_seg()
                    and not cfg.slim_transfer
                )
                chain_factories.append(
                    lambda: MhCooPacker(
                        groups, n_data=n_data, sorted_aux=saux,
                        floor=floor, cdest_aux=cdaux, combine=comb,
                    )
                )
            # dedup + remap on the host, pipelined with TPU compute by the
            # prefetch thread (train/sparse.py step consumes __uids_*)
            chain_factories.append(
                lambda: SparseBatchMapper(slots, pad_mode=pad_mode)
            )
            if cfg.slim_transfer and cfg.map_workers > 1 and (
                jax.process_count() == 1
            ):
                # fold the slim encoder into the worker pool too (its
                # serial leg measured ~23 ms/batch at the published
                # point); single-process only — multi-host keeps the
                # encoder after GlobalUidsUnion-compatible ordering
                if input_format(self.model) == "aliccp":
                    from tf_repos_tpu.data.slim_wire import (
                        AliccpSlimEncoder,
                        SharedWireState,
                    )

                    vocab = cfg.feature_size
                    ngr = len(self._mh_coo_groups or ())
                    # ONE wire-contract state for the whole worker pool:
                    # per-worker first-batch commits diverge (spurious
                    # mid-run contract errors, alternating idx encodings)
                    sws = SharedWireState()
                    dwo = not self._coo_combine_active()
                    chain_factories.append(
                        lambda: AliccpSlimEncoder(
                            vocab, compress_coo=True, n_groups=ngr,
                            shared=sws, drop_w_ok=dwo,
                        )
                    )
                    slim_in_chain = True
        if chain_factories:
            from tf_repos_tpu.data.sparse_batch import mapped_batches

            if cfg.map_workers > 1 and split == "tr":
                # --map_workers: the chain on a thread pool, stream
                # order preserved, pad widths re-monotonized at output
                # (data/pipeline.parallel_mapped_batches docstring has
                # the exactness argument)
                from tf_repos_tpu.data.pipeline import parallel_mapped_batches

                factories = list(chain_factories)

                def make_chain(fs=factories):
                    stages = [f() for f in fs]

                    def chain(b):
                        for s in stages:
                            b = s(b)
                        return b

                    return chain

                ds = parallel_mapped_batches(
                    ds, make_chain, cfg.map_workers, self._map_pad_rules()
                )
            else:
                for f in chain_factories:
                    ds = mapped_batches(ds, f())
        if cfg.slim_transfer and not slim_in_chain:
            ds = self._slim_wrap(ds)
        it: Iterable = Prefetcher(ds, size=cfg.prefetch_batches)
        if jax.process_count() > 1:
            # every host must dispatch the same number of collective steps
            from tf_repos_tpu.data.pipeline import synchronized_iterator

            it = synchronized_iterator(it)
        return it

    def _glob_split(self, split: str, *, shuffle: bool = False) -> List[str]:
        cfg = self.cfg
        fmt = input_format(self.model)
        pattern = {
            "libsvm": f"{split}*libsvm",
            "csv": f"{split}*csv",
            "aliccp": f"{split}*",
        }[fmt]
        files = glob_input_files(
            cfg.data_dir, pattern, shuffle=shuffle, seed=cfg.seed
        )
        if fmt == "aliccp":
            files = [f for f in files if not f.endswith((".libsvm", ".csv"))]
        return files

    def _build_reader(self, files: List[str], fmt: str, *, shuffle: bool,
                      epochs: int) -> Iterable:
        """The format-dispatched file reader for an explicit file list
        (shared by _dataset and the per-file multi-process infer)."""
        cfg = self.cfg
        common = dict(
            batch_size=cfg.batch_size,
            num_epochs=epochs,
            perform_shuffle=shuffle,
            shuffle_buffer=cfg.shuffle_buffer,
            seed=cfg.seed,
        )
        if fmt == "csv":
            return CsvDataset(files, packed_cache=cfg.packed_cache, **common)
        if fmt == "aliccp":
            return AliccpDataset(
                files, multi_hot_pad=cfg.multi_hot_pad,
                packed_cache=cfg.packed_cache, **common
            )
        # --num_threads (reference resource flag, DeepFM.py:40) sizes
        # the parallel-parse pool of the native loader
        workers = max(1, min(cfg.num_threads, (os.cpu_count() or 4) - 1))
        return LibsvmDataset(
            files, field_size=cfg.field_size, parse_workers=workers,
            packed_cache=cfg.packed_cache, **common
        )

    def _coo_combine_active(self) -> bool:
        """--mh_coo_combine is applied only when every COO consumer is
        linear in w (model.coo_combine_ok(); sum combiners). The slim
        encoder keys off this too: combined w is a count, never the
        binary live mask."""
        return bool(
            self.cfg.mh_coo
            and self.cfg.mh_coo_combine
            and self.model.coo_combine_ok()
        )

    def _slim_wrap(self, ds: Iterable) -> Iterable:
        """Host-side encode to the slim wire format, on the prefetch
        thread; the SlimWireModel decodes on-device inside the step."""
        cfg = self.cfg
        if input_format(self.model) == "aliccp":
            from tf_repos_tpu.data.slim_wire import aliccp_encoding_batches

            # COO wire compression (lo/hi idx split + dest counts) is
            # single-process only: GlobalUidsUnion rewrites raw idx
            return aliccp_encoding_batches(
                ds, cfg.feature_size,
                compress_coo=jax.process_count() == 1,
                n_groups=len(self._mh_coo_groups or ()),
                drop_w_ok=not self._coo_combine_active(),
            )
        from tf_repos_tpu.data.slim_wire import encoding_batches

        return encoding_batches(ds, cfg.static_fields)

    def _map_pad_rules(self) -> Dict[str, Any]:
        """Last-axis re-pad sentinels for the bucketed keys the parallel
        map chain emits (--map_workers): vocab for uids (strictly out of
        range, dropped by the device scatter), 0 for COO triplets and
        padded multi-hot ids/vals (the dead-slot convention)."""
        rules: Dict[str, Any] = {}
        if self._sparse_slots is not None:
            from tf_repos_tpu.train.sparse import UIDS_PREFIX

            for t, s in self._sparse_slots.items():
                rules[UIDS_PREFIX + t] = s.vocab
        if self._mh_coo_groups is not None:
            from tf_repos_tpu.data.sparse_batch import (
                MHC_CDEST, MHC_CIDX, MHC_DEST, MHC_IDX, MHC_PERM,
                MHC_SROWS, MHC_W,
            )
            from tf_repos_tpu.data.slim_wire import MHC_HI, MHC_LO

            rules.update({
                MHC_IDX: 0, MHC_DEST: 0, MHC_W: 0.0, MHC_CDEST: 0,
                # idx-sorted aux (device masks positions >= sum(counts))
                MHC_PERM: 0, MHC_CIDX: 0, MHC_SROWS: 0,
                # compressed-wire forms (encoder inside the worker pool)
                MHC_LO: 0, MHC_HI: 0,
            })
        if self._mh_bucket_pairs is not None:
            for ids_f, vals_f in self._mh_bucket_pairs:
                rules[ids_f] = 0
                if vals_f:
                    rules[vals_f] = 0.0
        return rules

    # ----------------------------------------------------------------- train
    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        ckpt = CheckpointManager(
            self.model_dir,
            keep=cfg.keep_checkpoint_max,
            save_interval_steps=cfg.save_checkpoints_steps,
        )
        ts = self.restore_or_init(ckpt)
        step = int(ts.pop("step", 0))
        state = {k: ts[k] for k in ("params", "opt_state", "mstate")}
        train_step = self._get_train_step()
        # K steps per dispatch (host-loop amortization; see config)
        K = cfg.steps_per_dispatch
        if K > 1 and cfg.profile_steps:
            print(
                "WARNING: --profile_steps requires steps_per_dispatch=1 "
                "(the trace window brackets individual dispatches)"
            )
        multi_step = None
        if K > 1 and self.mesh is not None and self._sparse_slots is not None:
            from tf_repos_tpu.parallel.sparse_step import (
                build_sharded_sparse_multi_train_step,
            )

            multi_step = build_sharded_sparse_multi_train_step(
                self.model, self.tx, self._sparse_opt(), self.mesh, self._specs, K,
                inner_lookup=self._pallas_expand_lookup(),
            )
        elif K > 1 and self.mesh is not None:
            from tf_repos_tpu.parallel.step import build_sharded_multi_train_step

            multi_step = build_sharded_multi_train_step(
                self.model, self.tx, self.mesh, self._specs, K
            )
        elif K > 1 and self._sparse_slots is not None:
            from tf_repos_tpu.train.sparse import build_sparse_multi_train_step

            multi_step = build_sparse_multi_train_step(
                self.model, self.tx, self._sparse_opt(), K,
                lookup=self._pallas_expand_lookup(),
            )
        elif K > 1:
            multi_step = L.build_multi_train_step(
                self.model, self.tx, K, lookup=self._field_block_lookup()
            )
        rng = jax.random.PRNGKey(cfg.seed + 1)

        if cfg.check_numerics:
            from tf_repos_tpu.utils.observability import enable_nan_checks

            enable_nan_checks()
        writer = None
        if cfg.write_metrics and jax.process_index() == 0:
            from tf_repos_tpu.utils.observability import MetricsWriter

            writer = MetricsWriter(self.model_dir)
        profiler = None

        stop = GracefulStop(
            cfg.graceful_shutdown, cfg.eval_decision_steps, K
        )
        losses: List[float] = []
        t0 = time.time()
        last_log, last_eval = t0, t0
        metrics: Dict[str, float] = {}

        group: List = []
        last_log_step = step

        def run_group(state, rng, batches):
            """Dispatch len(batches) steps: one scan dispatch for a full
            K-group, per-batch single steps for the tail — or for a
            group whose batches changed WIRE FORM mid-group (the slim
            COO idx split engages when the uids bucket crosses 2^16,
            changing the key set; happens at most once per run)."""
            same_keys = all(
                set(b) == set(batches[0]) for b in batches[1:]
            )
            if multi_step is not None and len(batches) == K and same_keys:
                rng, sub = jax.random.split(rng)
                sentinels = None
                if self._mh_bucket_pairs is not None:
                    # mh pow2 buckets may grow mid-group; id/val padding
                    # with 0 is the dead-slot convention, exactly what
                    # the slicing removed
                    sentinels = {}
                    for ids_f, vals_f in self._mh_bucket_pairs:
                        sentinels[ids_f] = 0
                        if vals_f:
                            sentinels[vals_f] = 0.0
                if self._sparse_slots is not None:
                    from tf_repos_tpu.train.sparse import UIDS_PREFIX

                    sentinels = sentinels or {}
                    sentinels.update({
                        UIDS_PREFIX + t: s.vocab
                        for t, s in self._sparse_slots.items()
                    })
                    if self._mh_coo_groups is not None:
                        # COO buckets may also grow mid-group; zero
                        # padding (idx=dest=0, w=0 — and for the
                        # compressed wire lo=hi=0, which decodes to
                        # idx 0) adds exactly zero
                        from tf_repos_tpu.data.sparse_batch import (
                            MHC_CDEST, MHC_CIDX, MHC_DEST, MHC_IDX,
                            MHC_PERM, MHC_SROWS, MHC_W,
                        )
                        from tf_repos_tpu.data.slim_wire import (
                            MHC_HI, MHC_LO,
                        )

                        sentinels.update(
                            {MHC_IDX: 0, MHC_DEST: 0, MHC_W: 0.0,
                             MHC_CDEST: 0, MHC_PERM: 0, MHC_CIDX: 0,
                             MHC_SROWS: 0, MHC_LO: 0, MHC_HI: 0}
                        )
                    if self._uids_union is not None:
                        # per-batch global uid union BEFORE stacking, in
                        # group order (same host-collective sequence on
                        # every host); the unioned sets are identical
                        # across hosts, so the group-max sentinel padding
                        # in stack_batches is too
                        batches = [self._uids_union(b) for b in batches]
                stacked = L.stack_batches(batches, sentinels)
                if self._sharded is not None and jax.process_count() > 1:
                    # assemble per-host [K, B_local] slices into the global
                    # [K, B] batch on the mesh
                    stacked = self._sharded.place_stacked(stacked)
                p, o, m, lossk = multi_step(
                    state["params"], state["opt_state"], state["mstate"],
                    stacked, sub,
                )
                return {"params": p, "opt_state": o, "mstate": m}, rng, lossk
            outs = []
            for b in batches:
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, self._place(b), sub)
                outs.append(loss)
            return state, rng, jnp.stack([jnp.asarray(x) for x in outs])

        for batch in self._dataset("tr", shuffle=True, epochs=cfg.num_epochs):
            if K > 1:
                group.append(batch)
                if len(group) < K:
                    continue
                state, rng, lossk = run_group(state, rng, group)
                group = []
                loss = lossk[-1]
                losses.append(lossk)
                step += K
            else:
                if cfg.profile_steps and step == cfg.profile_start_step:
                    from tf_repos_tpu.utils.observability import profile_trace

                    profiler = profile_trace(os.path.join(self.model_dir, "profile"))
                    profiler.__enter__()
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, self._place(batch), sub)
                step += 1
                losses.append(loss)
                if profiler and step >= cfg.profile_start_step + cfg.profile_steps:
                    float(loss)  # device sync so the trace covers the window
                    profiler.__exit__()
                    profiler = None
            # cadence boundaries: "crossed within this dispatch" — for
            # K==1 this is exactly `step % n == 0`
            if step % cfg.log_steps < K:
                now = time.time()
                mean_loss = float(
                    jnp.mean(
                        jnp.concatenate(
                            [jnp.atleast_1d(x) for x in losses]
                        )[-cfg.log_steps:]
                    )
                )
                rate = (step - last_log_step) / max(now - last_log, 1e-9)
                last_log_step = step
                print(
                    f"INFO: step = {step}, loss = {mean_loss:.5f} "
                    f"({rate:.3f} steps/sec, {rate * cfg.batch_size:.0f} examples/sec)"
                )
                if writer:
                    writer.write(
                        step,
                        {"loss": mean_loss, "examples_per_sec": rate * cfg.batch_size},
                    )
                last_log = now
                losses = []
            # Checkpoint cadence is independent of the log cadence:
            # save_checkpoints_steps < log_steps must not silently degrade
            # to log_steps. Orbax's save_interval_steps does the throttling;
            # should_save() is the cheap pre-check.
            if cfg.save_checkpoints_steps and ckpt.should_save(step):
                ckpt.save(step, dict(state, step=step))
            # Periodic eval (reference EvalSpec throttle_secs). Decisions
            # are taken only at step boundaries that every host reaches at
            # the same count, and in multi-process runs host 0's wall-clock
            # verdict is broadcast so all hosts enter the collective eval
            # program together (raw per-host clocks would desync the
            # collective step counts and deadlock).
            # (eval_throttle_secs < 0 -> eval at every decision boundary;
            # used by tests for a clock-free deterministic cadence)
            if cfg.eval_throttle_secs and step % cfg.eval_decision_steps < K:
                want = time.time() - last_eval > cfg.eval_throttle_secs
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    want = bool(
                        multihost_utils.broadcast_one_to_all(
                            jnp.array(want, jnp.int32)
                        )
                    )
                if want:
                    metrics = self._maybe_eval(state["params"], state["mstate"])
                    if writer and metrics:
                        writer.write(step, metrics, kind="eval")
                    last_eval = time.time()
            if stop.should_stop(step):
                print(f"INFO: graceful shutdown: checkpointing at step {step}")
                break

        if group and not stop.stopped:  # tail batches of an unfinished K-group
            state, rng, lossk = run_group(state, rng, group)
            step += len(group)
        if profiler:
            profiler.__exit__()
        stop.restore()
        ckpt.save(step, dict(state, step=step), force=True)
        ckpt.close()
        if stop.stopped:
            # preemption grace windows are short: persist state, skip the
            # final eval pass; resume picks up at `step` (tested)
            metrics["step"] = step
            metrics["wall_time"] = time.time() - t0
            metrics["stopped_by_signal"] = 1.0
            if writer:
                writer.close()
            return metrics
        metrics = self._maybe_eval(state["params"], state["mstate"]) or metrics
        metrics["step"] = step
        metrics["wall_time"] = time.time() - t0
        if writer:
            writer.write(step, {k: v for k, v in metrics.items() if k != "step"}, kind="final")
            writer.close()
        return metrics

    def _f32_params(self, params):
        """Eval/infer/export consume f32 tables (bf16 is a training-
        storage format; the upcast is a one-off [V,K] copy)."""
        if self._table_dtype is None:
            return params
        from tf_repos_tpu.train.sparse import upcast_tables_f32

        return upcast_tables_f32(self.model, params)

    def _maybe_eval(self, params, mstate) -> Dict[str, float]:
        try:
            return self._run_eval(params, mstate)
        except FileNotFoundError:
            return {}

    # ------------------------------------------------------------------ eval
    def _run_eval(self, params, mstate) -> Dict[str, float]:
        params = self._f32_params(params)
        eval_step = self._get_eval_step()
        acc = L.init_eval_acc(self.model)
        for batch in self._dataset("va", shuffle=False, epochs=1):
            acc = eval_step(params, mstate, acc, self._place(batch))
        res = L.finalize_eval(acc)
        print("INFO: eval:", " ".join(f"{k} = {v:.6f}" for k, v in res.items()))
        return res

    def evaluate(self) -> Dict[str, float]:
        ckpt = CheckpointManager(self.model_dir, keep=self.cfg.keep_checkpoint_max)
        ts = self.restore_or_init(ckpt)
        ckpt.close()
        return self._run_eval(ts["params"], ts["mstate"])

    def evaluate_loop(self) -> Dict[str, float]:
        """Continuous evaluator process: poll model_dir for new checkpoints
        and evaluate each — the reference's dedicated evaluator role
        (worker 1 remapped to 'evaluator', DeepFM.py:270-272, which polls
        the shared model_dir for checkpoints written by the chief)."""
        cfg = self.cfg
        writer = None
        if cfg.write_metrics:
            from tf_repos_tpu.utils.observability import MetricsWriter

            writer = MetricsWriter(self.model_dir, filename="eval_metrics.jsonl")
        last_step = None
        last_new = time.time()
        metrics: Dict[str, float] = {}
        while time.time() - last_new < cfg.eval_loop_timeout:
            ckpt = CheckpointManager(self.model_dir, keep=cfg.keep_checkpoint_max)
            step = ckpt.latest_step()
            if step is not None and step != last_step:
                ts = self.restore_or_init(ckpt)
                ckpt.close()
                metrics = self._run_eval(ts["params"], ts["mstate"])
                metrics["step"] = step
                if writer:
                    writer.write(step, {k: v for k, v in metrics.items() if k != "step"}, kind="eval")
                last_step, last_new = step, time.time()
            else:
                ckpt.close()
                time.sleep(cfg.eval_loop_secs)
        if writer:
            writer.close()
        return metrics

    # ----------------------------------------------------------------- infer
    def infer(self, out_path: Optional[str] = None) -> str:
        """Streaming predict over te files -> pred.txt (DeepFM.py:349-353).

        Multi-process (VERDICT r4 item 6; the reference's cluster-mode
        infer task works, DeepFM.py:349-353): te FILES shard round-robin
        across hosts, every host dispatches the same number of global
        predict steps (hosts that run out feed a template batch and
        discard its output), each host writes one pred part per FILE,
        and host 0 merges the parts in glob file order. The merged
        output EQUALS the single-process pred.txt: eval-mode predictions
        are per-example deterministic (no dropout, BN uses running
        stats), so only example ORDER matters — and per-file
        concatenation in glob order reproduces the single-process stream
        order even though batch boundaries differ."""
        cfg = self.cfg
        ckpt = CheckpointManager(self.model_dir, keep=cfg.keep_checkpoint_max)
        ts = self.restore_or_init(ckpt)
        ckpt.close()
        predict_step = self._get_predict_step()
        out_path = out_path or os.path.join(cfg.data_dir, "pred.txt")
        key = self.model.prediction_keys[0]
        params = self._f32_params(ts["params"])
        if jax.process_count() > 1:
            return self._infer_multiprocess(
                out_path, params, ts["mstate"], predict_step, key
            )
        with open(out_path, "w") as f:
            for batch in self._dataset("te", shuffle=False, epochs=1):
                preds = np.asarray(
                    predict_step(params, ts["mstate"], self._place(batch))[key]
                )
                for p, m in zip(preds, batch["mask"]):
                    if m > 0:
                        f.write(f"{p:f}\n")
        return out_path

    def _infer_multiprocess(
        self, out_path: str, params, mstate, predict_step, key: str
    ) -> str:
        """See infer(). Requires the shared model/data filesystem every
        multi-host run already assumes (Orbax checkpoints live there)."""
        from jax.experimental import multihost_utils

        if self.mesh is None:
            raise RuntimeError(
                "multi-process infer needs the mesh-sharded predict step; "
                "drop --mesh_data=1/--mesh_model=1 under jax.distributed"
            )
        cfg = self.cfg
        fmt = input_format(self.model)
        files = self._glob_split("te")
        if not files:
            # same loud failure as the single-process path — an
            # IndexError below would kill hosts mid-collective
            raise FileNotFoundError(
                f"task_type=infer: no te* input files in {cfg.data_dir}"
            )
        pidx, nproc = jax.process_index(), jax.process_count()
        parts_dir = out_path + ".parts"
        if pidx == 0:
            os.makedirs(parts_dir, exist_ok=True)
            for f in os.listdir(parts_dir):
                os.remove(os.path.join(parts_dir, f))
        multihost_utils.sync_global_devices("infer_parts_dir")

        def _file_batches(path):
            ds: Iterable = self._build_reader(
                [path], fmt, shuffle=False, epochs=1
            )
            if cfg.slim_transfer:
                ds = self._slim_wrap(ds)
            return ds

        # idle-dispatch template: every host reads files[0]'s first batch
        # (shared fs, deterministic) so hosts whose file shard ran out
        # keep dispatching shape-identical collective steps; their
        # predictions are simply not written anywhere.
        tmpl = next(iter(_file_batches(files[0])))

        def my_work():
            for i in range(pidx, len(files), nproc):
                for b in _file_batches(files[i]):
                    yield i, b

        it = my_work()
        pending = next(it, None)
        part_f, part_i = None, -1
        while True:
            have = pending is not None
            flags = multihost_utils.process_allgather(
                np.asarray(1 if have else 0, np.int32)
            )
            if int(flags.max()) == 0:
                break
            i, b = pending if have else (-1, tmpl)
            preds = predict_step(params, mstate, self._place(b))[key]
            if have:
                # this host's rows of the data-sharded global output are
                # exactly its addressable shards, in global-index order.
                # The P(data) output is REPLICATED over the model axis,
                # so a host with devices on several model coordinates
                # sees duplicate shards per data range — keep one each.
                uniq = {}
                for s in preds.addressable_shards:
                    uniq.setdefault(s.index[0].start or 0, s.data)
                local = np.concatenate(
                    [np.asarray(uniq[k]) for k in sorted(uniq)]
                )
                assert local.shape[0] == len(b["mask"]), (
                    local.shape, len(b["mask"])
                )
                if i != part_i:
                    if part_f:
                        part_f.close()
                    part_i = i
                    part_f = open(
                        os.path.join(parts_dir, f"part{i:05d}"), "w"
                    )
                for p, m in zip(local, b["mask"]):
                    if m > 0:
                        part_f.write(f"{p:f}\n")
            pending = next(it, None)
        if part_f:
            part_f.close()
        multihost_utils.sync_global_devices("infer_parts_done")
        if pidx == 0:
            with open(out_path, "w") as out:
                for name in sorted(os.listdir(parts_dir)):
                    with open(os.path.join(parts_dir, name)) as pf:
                        out.write(pf.read())
            import shutil

            shutil.rmtree(parts_dir, ignore_errors=True)
        multihost_utils.sync_global_devices("infer_merged")
        return out_path

    # ---------------------------------------------------------------- export
    def export(self) -> str:
        from tf_repos_tpu.serve.export import export_servable

        cfg = self.cfg
        ckpt = CheckpointManager(self.model_dir, keep=cfg.keep_checkpoint_max)
        ts = self.restore_or_init(ckpt)
        ckpt.close()
        params = self._f32_params(ts["params"])
        if self._sharded is not None:
            from tf_repos_tpu.parallel.step import unpad_params_like

            params = unpad_params_like(self.model, params)
        # export the bare model: the slim wire format is a train-time
        # host->device transfer optimization, not a serving signature
        from tf_repos_tpu.data.slim_wire import SlimWireModel

        model = self.model.inner if isinstance(self.model, SlimWireModel) else self.model
        return export_servable(
            cfg.servable_model_dir or os.path.join(self.model_dir, "servable"),
            model,
            params,
            ts["mstate"],
        )


def run_task(cfg: Config) -> Dict[str, float] | str:
    """CLI entry: task_type dispatch, exactly the reference main() flow."""
    from tf_repos_tpu.parallel.distributed import init_distributed

    init_distributed(cfg)
    echo_config(cfg)
    if cfg.clear_existing_model and cfg.task_type == "train":
        clear_existing_model(cfg.resolved_model_dir())
    h = Harness(cfg)
    if cfg.task_type == "train":
        return h.train()
    if cfg.task_type == "eval":
        return h.evaluate()
    if cfg.task_type == "eval_loop":
        return h.evaluate_loop()
    if cfg.task_type == "infer":
        return h.infer()
    if cfg.task_type == "export":
        return h.export()
    raise ValueError(f"unknown task_type {cfg.task_type!r}")
