"""Unified configuration for the framework.

The reference declares ~25 ``tf.app.flags`` in every model file (canonical
copy: /root/reference/deep_ctr/Model_pipeline/DeepFM.py:34-60). Here they
are factored into one dataclass; every reference flag name is preserved so
parity runs can reuse the reference's launch commands, plus TPU-native
knobs (mesh shape, dtype, seed) that have no reference analog.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
from typing import List, Optional


@dataclasses.dataclass
class Config:
    # ---- distribution (reference: DeepFM.py:35-40). ps/worker hosts are
    # accepted for CLI compatibility but the TPU stack derives its topology
    # from jax.distributed + the device mesh, not from host lists.
    dist_mode: int = 0
    ps_hosts: str = ""
    worker_hosts: str = ""
    job_name: str = ""
    task_index: int = 0
    num_threads: int = 16

    # ---- model shape (reference: DeepFM.py:41-44,52-55)
    feature_size: int = 0
    field_size: int = 0
    embedding_size: int = 32
    deep_layers: str = "256,128,64"
    dropout: str = "0.5,0.5,0.5"
    batch_norm: bool = False
    batch_norm_decay: float = 0.9

    # ---- optimization (reference: DeepFM.py:45-51)
    num_epochs: int = 10
    batch_size: int = 64
    log_steps: int = 1000
    learning_rate: float = 0.0005
    l2_reg: float = 0.0001
    loss_type: str = "log_loss"  # {square_loss, log_loss}
    optimizer: str = "Adam"  # {Adam, Adagrad, GD, Momentum, ftrl}

    # ---- IO / lifecycle (reference: DeepFM.py:56-60)
    data_dir: str = ""
    dt_dir: str = ""
    model_dir: str = ""
    servable_model_dir: str = ""
    task_type: str = "train"  # {train, eval, eval_loop, infer, export}
    clear_existing_model: bool = False

    # ---- model-specific flags from other reference files
    model_type: str = ""  # PNN.py:61 {FNN, Inner, Outer}; wide_n_deep.py:46 {wide, deep, wide_n_deep}
    cross_layers: int = 3  # DCN.py:52
    attention_layers: str = "256"  # AFM.py:52, DIN.py:46
    attention_pooling: bool = True  # DIN.py:45
    ctr_task_wgt: float = 0.5  # DeepCvrMTL.py:49

    # ---- model selection. The reference has one script per algorithm
    # (DeepFM.py, PNN.py, ...); here one CLI selects from the registry.
    model: str = "DeepFM"

    # ---- preset: expand to the measured-best flag set for an operating
    # regime (see PRESETS below + FLAGS.md "Flag matrix"). Explicitly
    # passed CLI flags override the preset's values. The reference's
    # pitch is one command line per model (deep_ctr/run.sh:11-24);
    # reaching this repo's measured numbers otherwise takes 5-7
    # interacting flags, several of which REVERSE between regimes.
    preset: str = ""

    # ---- observability (reference: TensorBoard summaries via RunConfig,
    # DeepFM.py:339-340; here JSONL metrics + jax.profiler traces)
    write_metrics: bool = True
    profile_steps: int = 0  # >0: trace this many steps with jax.profiler
    profile_start_step: int = 10
    check_numerics: bool = False  # jax_debug_nans fail-fast
    eval_loop_secs: int = 30  # evaluator-process poll interval (task_type=eval_loop)
    eval_loop_timeout: int = 3600  # stop evaluator after this long with no new ckpt

    # ---- TPU-native knobs (no reference analog)
    seed: int = 2018
    mesh_data: int = -1  # -1: use all devices on the data axis
    mesh_model: int = 1  # >1 row-shards embedding tables over the model axis
    # "bfloat16": store embedding tables + their optimizer moments in
    # bf16 (halves their HBM footprint; the reference's 20GB-RAM pain
    # point, DeepMTL/README.md:43-45). Row math stays f32; writes use
    # stochastic rounding (ops/rounding.py). Requires sparse_table_update.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 for the dense towers on TPU
    shuffle_buffer: int = 256  # reference input_fn shuffle window (DeepFM.py:88)
    prefetch_batches: int = 8
    eval_throttle_secs: int = 1200  # EvalSpec throttle (DeepFM.py:345)
    # step cadence at which the eval-throttle clock is consulted; every
    # host reaches these boundaries at the same step count, making the
    # (broadcast) eval decision deterministic across hosts
    eval_decision_steps: int = 100
    save_checkpoints_steps: int = 0  # 0: only save per epoch; wide_n_deep.py:129 sets it to log_steps
    keep_checkpoint_max: int = 5
    # field-partitioned id space "off:size,off:size,..." or
    # "auto:<feature_map path>" — enables the Pallas field-block scatter
    # for table gradients on the single-chip path (ops/pallas_embedding.py)
    field_blocks: str = ""
    # K training steps per device dispatch (lax.scan host-loop
    # amortization, train/loop.build_multi_train_step): pays fixed
    # dispatch/transfer costs once per K steps. Essential on tunneled /
    # high-latency device topologies; harmless (minor win) on directly
    # attached chips. Single-chip dense path; log/eval/ckpt cadences
    # round to dispatch boundaries.
    steps_per_dispatch: int = 1
    # SIGTERM -> checkpoint + clean exit (preemptible/spot TPU pools);
    # multi-host stop is coordinated at eval_decision_steps boundaries
    graceful_shutdown: bool = True
    # first N libsvm fields have CONSTANT ids 1..N (the Criteo
    # preprocessor emits continuous features that way, features/criteo.py
    # _emit_line): their table rows are SLICED instead of gathered, and
    # their gradient is a dense slice-update instead of scatter rows —
    # cuts the HBM-transaction-bound gather/scatter row count by N/39.
    # Single-chip path; correctness requires the preprocessor layout.
    static_fields: int = 0
    # slim host->device wire format for the Criteo layout
    # (data/slim_wire.py): only cont_vals[B,sf] f32 + cat_ids[B,F-sf]
    # int32 cross the host->device link (164 vs 320 B/example, 1.95x)
    # and the full batch is reconstructed EXACTLY on-device inside the
    # already-jitted step. Wins whenever the input link is the bound
    # (PCIe on colocated hosts; the dev tunnel here caps at ~50 MB/s).
    # Requires static_fields>0 (same layout contract, validated on every
    # batch by the host encoder); libsvm models. Composes with
    # sparse_table_update: the encoder runs AFTER the dedup mapper, whose
    # remap preserves both encoder contracts (data/slim_wire.py).
    slim_transfer: bool = False
    # lazy touched-rows optimizer updates for big embedding tables
    # (train/sparse.py): the async-PS behavior of the reference
    # (DeepCvrMTL.py:122) — only rows present in the batch move, the
    # backward never materializes a dense [V,K] cotangent. Single-chip
    # path; recommended at vocab >~ 1M.
    sparse_table_update: bool = False
    # store two-slot optimizer moments (Adam m/v, FTRL n/z) fused in one
    # [V,2K] array: one moment gather + one scatter per step instead of
    # two of each. Row access at big vocab is HBM-transaction-BOUND (not
    # byte-bound) on TPU, so halving the op count wins. Changes the
    # opt-state layout — checkpoints don't interchange with unfused runs.
    fused_moments: bool = False
    # go one further: fuse the TABLE into the same array ([V,3K] = w|m|v,
    # train/sparse.FusedTableRowOpt) so each step does ONE row gather +
    # ONE row scatter per table instead of 2+2 — the vocab-row SCATTER is
    # the single most expensive op of the large-vocab step (measured
    # 15.4-18.7 ms each at V=4.5M, S=131k on v5e). Adam only; requires
    # sparse_table_update; supersedes fused_moments. Mesh-aware: each
    # model shard keeps a [V_local,3K] array (parallel/sparse_step.py).
    fused_table: bool = False
    # Pallas per-row DMA write-back for the fused table (round 5): the
    # w|m|v rows store LANE-PADDED ([V, L], L = 3K rounded up to 128,
    # f32-only) and the vocab-row scatter becomes per-row async DMA
    # copies. Measured V=4.5M/S=131k on v5e: gather 7.99 -> 2.29 ms
    # (aligned 512B rows), scatter 23.1 -> 10.96 ms. LOSES below ~1M
    # vocab (XLA is already at ~1.3 ms there); costs L/3K HBM capacity.
    # Requires fused_table; rejects param_dtype=bfloat16.
    dma_scatter: bool = False
    # per-row Adam moment catch-up for the lazy sparse path: decay m,v by
    # beta^(steps-since-last-touch) on touch (a [V] int32 last-touched
    # array) — dense Adam's zero-grad moment semantics, closing the
    # multi-epoch AUC gap of plain lazy Adam (QUALITY_SWEEPS). Adam only.
    sparse_catchup: bool = False
    # uids padding policy for the sparse mapper (data/sparse_batch.py):
    # "pow2" sizes the device working set to the ACTUAL unique-row count
    # (power-of-2 buckets, monotonic growth — a handful of recompiles);
    # "max" pads to the static worst case (one compile ever). Measured on
    # v5e: device row-op cost scales with the PADDED length, so "max" at
    # high dedup ratios wastes most of the lazy path's win.
    sparse_pad_mode: str = "pow2"
    # Pallas VMEM expand/accumulate kernels for the sparse path's inner
    # (remapped-id) lookup (ops/pallas_sparse.py): the compact [S,K]
    # rows are pinned in VMEM and each row move is a scalar-addressed
    # VPU load/store instead of an HBM DMA descriptor. Measured on v5e
    # at the headline point (Zipf ids, B=16384): step 12.1 -> 7.2 ms,
    # 1.47x over the dense+static headline (2.27M examples/s). Requires
    # sparse_table_update; works on one chip AND under a mesh (the
    # sharded sparse step's replicated [S_pad,K] working set is local to
    # each device, parallel/sparse_step.py); falls back to XLA at trace
    # time when S exceeds the VMEM capacity rule (e.g. uniform ids).
    pallas_expand: bool = False
    # pack multi-hot (ragged) fields as a COO triplet of LIVE slots on
    # the host (data/sparse_batch.MhCooPacker, prefetch thread) instead
    # of padded [B, multi_hot_pad] arrays; the device pools them with a
    # segment-sum whose cost is proportional to live ids, not padding
    # (Pallas VMEM kernels under --pallas_expand, XLA .at[].add
    # otherwise). The padded expand+accumulate was measured as 19.6 ms
    # of the 30.7 ms pad-64 ESMM sparse step with ~85-90% dead slots —
    # the reference never paid this (embedding_lookup_sparse consumes
    # COO sp_ids, DeepCvrMTL.py:152-164). Requires sparse_table_update
    # and a model with sum-pooled multi-hot groups (ESMM); also shrinks
    # the host->device wire (~12 B per live slot vs 4-8 B per padded
    # slot: 9.4 MB -> ~1.6 MB per pad-64 B=4096 batch).
    mh_coo: bool = False
    # pre-size the COO M bucket (MhCooPacker floor): like the uids
    # bucket's "pow2:<floor>", this skips the quarter-pow2 growth ladder
    # when the steady-state live-slot count is known — each ladder step
    # RECOMPILES the (scan-K) program, and a DIN-attention compile at
    # 4.5M vocab costs minutes through a remote-compile path (the
    # round-5 DIN e2e measured compile-bound without it). 0 = default
    # floor 1024 + ladder.
    mh_coo_floor: int = 0
    # combine duplicate (row, id) pairs per multi-hot field on the host
    # before the COO pack, summing their weights (data/sparse_batch.
    # combine_dups: C++ per-row hash, np.unique fallback). EXACT for sum
    # combiners (linear in w — reference embedding_lookup_sparse
    # combiner="sum") up to float order; measured 1.85x fewer live slots
    # at the published Ali-CCP regime (avg 250 ids/sample, Zipf 1.2) —
    # every M-proportional device op and wire byte shrinks by the dup
    # factor. Auto-disabled (with a warning) when the model's COO
    # consumers are nonlinear in w (model.coo_combine_ok() False: DIN
    # attention scores each slot from w * emb through a sigmoid MLP).
    mh_coo_combine: bool = True
    # opt-in idx-sorted COO backward (packer perm/cidx/srows aux + the
    # lane-packed windowed segment sum replacing the per-slot backward
    # accumulate). MEASURED 4 ms SLOWER at the published DIN point
    # (93.8 vs 89.8 ms — XLA fuses the in-graph accumulate well below
    # its standalone cost); its niche is ABOVE the lane-packed VMEM row
    # cap (~390k unique ids at K=16), where the plain accumulate falls
    # back to XLA's ~35 ms scatter while this path still fits. DIN
    # attention only; single-process; not under --slim_transfer.
    coo_sorted_bwd: bool = False
    # slice the padded multi-hot fields to the BATCH's live width on the
    # host (data/sparse_batch.MhPadBucketer): per-field pow2 buckets of
    # the max live column, monotonic growth (same recompile-bounding
    # rule as the uids buckets), "pow2:<floor>" to skip the growth
    # ladder. The device-side multi-hot cost (embedding expand, DIN's
    # attention MLP over [B, pad, ·]) scales with the PADDED width while
    # true Ali-CCP lengths are ~4-8 of pad 64 — this recovers the dead
    # ~87% without the COO rewrite, so it also covers DIN, whose
    # per-slot attention cannot ride the sum-pool COO form (--mh_coo).
    # Ali-CCP models; exact under the id==0 mask convention. Multi-host:
    # train-split only, requires --sparse_table_update (the cross-host
    # width consensus rides GlobalUidsUnion's main-thread collectives).
    mh_bucket: str = "off"
    # size of the host map-chain thread pool (data/pipeline.
    # parallel_mapped_batches) applying bucketer→dedup-mapper→COO-packer
    # to train batches — the tf.data map(num_parallel_calls=N) role
    # (reference DeepFM.py:84). The chain is numpy-heavy (releases the
    # GIL); 1 = current single-prefetch-thread behavior. Content is
    # per-batch pure, so order and math are unchanged; only the pow2
    # pad-bucket growth schedule can differ (re-monotonized at output).
    map_workers: int = 1
    # parse libsvm text once and memmap a packed binary sidecar
    # (<data_dir>/.packed_cache/, data/cache.py) on every later epoch and
    # run — the TFRecord-materialization role in the reference's pipeline.
    # The text parse (~1.2M lines/s) is the end-to-end bottleneck against
    # one chip's ~1.6M examples/s; cached epochs read at memory bandwidth.
    packed_cache: bool = False
    # padded length for multi-hot (ragged) fields; the reference carries these
    # as VarLen sparse tensors (DIN.py:65-76) — on TPU they become fixed-shape
    # padded arrays with id==0 masking (DIN.py:157 mask convention).
    multi_hot_pad: int = 64

    # -------------------------------------------------------------- helpers
    @property
    def tower_dtype(self):
        """None for f32; otherwise the compute dtype string ("bfloat16")
        passed to the dense towers (mixed precision: params stay f32)."""
        return None if self.compute_dtype in ("float32", "f32", "") else self.compute_dtype

    @property
    def deep_layers_list(self) -> List[int]:
        return [int(x) for x in self.deep_layers.split(",") if x]

    @property
    def dropout_list(self) -> List[float]:
        return [float(x) for x in self.dropout.split(",") if x]

    @property
    def attention_layers_list(self) -> List[int]:
        return [int(x) for x in self.attention_layers.split(",") if x]

    def resolve_dt_dir(self) -> str:
        """Yesterday's date unless set — the reference's daily-partition
        warm-start convention (DeepFM.py:286-288)."""
        if self.dt_dir:
            return self.dt_dir
        return (datetime.date.today() - datetime.timedelta(days=1)).strftime("%Y%m%d")

    def resolved_model_dir(self) -> str:
        return self.model_dir + self.resolve_dt_dir() if self.model_dir else self.model_dir

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @classmethod
    def with_preset(cls, name: str = "", **overrides) -> "Config":
        """Programmatic preset expansion: Config.with_preset("esmm_large_vocab",
        feature_size=..., data_dir=...). Overrides win over the preset.
        The positional is named ``name`` (not ``preset``) so a kwargs
        dict containing 'preset' — e.g. dataclasses.asdict(cfg) — can be
        splatted without a duplicate-kwarg TypeError; a 'preset' kwarg
        is accepted as an alias when no positional is given."""
        name = name or overrides.get("preset", "")
        overrides.pop("preset", None)
        base = dict(expand_preset(name))
        base.update(overrides)
        return cls(preset=name, **base)


# Measured-best flag sets per operating regime. Sources: PERF.md,
# CLAUDE.md round-2/3 measured results, QUALITY_SWEEPS.json. The
# per-regime REVERSALS these encode (why one set cannot serve all):
#   - bf16 tables + fused moments WIN at 4.5M vocab (1.9x, AUC-neutral)
#     but HURT at 117k vocab (more dtype traffic than they save);
#   - lazy sparse Adam (sparse_table_update) is the single-pass
#     throughput champion at Criteo scale but loses −0.012 AUC by epoch
#     4 (stale moments) — the multi-epoch criteo preset stays dense;
#   - mh_coo/mh_bucket only exist for the Ali-CCP ragged layout.
PRESETS = {
    # Criteo-shape multi-epoch training (the published-hypers regime,
    # AUC-safe): dense tables + static-field slicing + bf16 towers +
    # packed cache + slim wire. 1.53M ex/s device-side at B=16384.
    "criteo_headline": dict(
        batch_size=16384, learning_rate=2e-3, static_fields=13,
        compute_dtype="bfloat16", packed_cache=True, slim_transfer=True,
        steps_per_dispatch=8,
    ),
    # The sparse bench configuration, ANY-epoch-safe since round 5:
    # --sparse_catchup (per-row beta^delta moment decay on touch) makes
    # lazy sparse Adam measure AT OR ABOVE dense AUC at 1/2/4/6 epochs
    # of the 2M surrogate (QUALITY_SWEEPS.json sparse_epochs: catchup
    # +0.0008/+0.0034/+0.0174/+0.0204 vs dense; plain lazy was -0.012 by
    # epoch 4). Cost ~4% of the headline step (2.37M -> 2.26M ex/s).
    # The historical name is kept for CLI compatibility.
    "criteo_singlepass": dict(
        batch_size=16384, learning_rate=2e-3, static_fields=13,
        compute_dtype="bfloat16", packed_cache=True, slim_transfer=True,
        steps_per_dispatch=8, sparse_table_update=True, pallas_expand=True,
        sparse_catchup=True,
    ),
    # Ali-CCP ESMM/DeepCvrMTL at multi-million vocab (the reference's
    # "very slow, 20 GB RAM" case): lazy sparse + VMEM kernels + COO
    # multi-hot + live-width buckets + bf16 tables/moments + slim wire.
    # multi_hot_pad=0 auto-sizes to the per-field p99 — generous pads
    # are ~free under mh_coo/mh_bucket and truncation costs AUC
    # (TRUNCATION.md).
    # fused_table ([V,3K] w|m|v, 1 gather + 1 scatter) replaced
    # fused_moments in round 5 once it became mesh-aware ([V_local,3K]
    # per shard; parallel/sparse_step.py). Adam-only — override
    # --fused_table=false --fused_moments=true for other optimizers.
    # The fastest measured step adds --dma_scatter (ESMM published
    # 58.1 -> 43.9 ms) but forces f32 lane-padded storage — 5.3x the
    # bf16 preset's table HBM/checkpoint at K=16. The preset keeps the
    # bf16 storage default (memory was the reference's stated pain at
    # this vocab); pass --dma_scatter --param_dtype=float32 when step
    # time matters more than capacity.
    "esmm_large_vocab": dict(
        batch_size=4096, sparse_table_update=True, pallas_expand=True,
        mh_coo=True, mh_bucket="pow2", fused_table=True,
        sparse_catchup=True,
        param_dtype="bfloat16", compute_dtype="bfloat16",
        packed_cache=True, slim_transfer=True, steps_per_dispatch=64,
        map_workers=2, multi_hot_pad=0,
    ),
    # DIN at large vocab: same levers; attention rides the COO live
    # slots (models/din.py MH_COO_GROUPS).
    "din_large_vocab": dict(
        batch_size=4096, sparse_table_update=True, pallas_expand=True,
        mh_coo=True, mh_bucket="pow2", fused_table=True,
        sparse_catchup=True,
        param_dtype="bfloat16", compute_dtype="bfloat16",
        packed_cache=True, steps_per_dispatch=8, map_workers=2,
        multi_hot_pad=0,
    ),
    # Multi-host SPMD: every host must dispatch identical collective
    # sequences; sparse_table_update carries the cross-host uid/width
    # consensus, scan-K amortizes the per-dispatch fixed cost.
    "multihost": dict(
        sparse_table_update=True, steps_per_dispatch=8, map_workers=2,
        packed_cache=True,
    ),
}


def expand_preset(name: str) -> dict:
    if name not in PRESETS:
        raise ValueError(
            f"unknown --preset {name!r}; available: {', '.join(sorted(PRESETS))}"
        )
    # copy: callers must not be able to mutate the shared PRESETS entry
    return dict(PRESETS[name])


def add_config_args(
    parser: argparse.ArgumentParser, suppress_defaults: bool = False
) -> None:
    """Register every Config field as a --flag (reference flag names).

    suppress_defaults: unpassed flags are ABSENT from the namespace
    (argparse.SUPPRESS) — parse_config uses this so --preset expansion
    can tell explicit flags (which override the preset) from defaults."""
    for f in dataclasses.fields(Config):
        default = argparse.SUPPRESS if suppress_defaults else f.default
        if f.type == "bool" or f.type is bool:
            parser.add_argument(
                f"--{f.name}", type=_str2bool, default=default, help=f"(default: {f.default})"
            )
        else:
            parser.add_argument(
                f"--{f.name}", type=type(f.default), default=default, help=f"(default: {f.default})"
            )


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes", "y", "t")


def parse_config(argv: Optional[List[str]] = None) -> Config:
    parser = argparse.ArgumentParser(description="tf_repos_tpu")
    add_config_args(parser, suppress_defaults=True)
    args, _ = parser.parse_known_args(argv)
    explicit = vars(args)  # only flags the user actually passed
    values = {}
    preset = explicit.get("preset", "")
    if preset:
        values.update(expand_preset(preset))
    values.update(explicit)
    return Config(**values)


def echo_config(cfg: Config, log=print) -> None:
    """Hyperparameter echo at startup (reference: DeepFM.py:291-307)."""
    for f in dataclasses.fields(Config):
        log(f"{f.name} = {getattr(cfg, f.name)}")
