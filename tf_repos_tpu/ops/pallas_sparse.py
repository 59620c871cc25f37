"""Pallas TPU kernels: VMEM-resident expand/accumulate for the dedup
(sparse) embedding path.

The sparse path (train/sparse.py) already reduces the HBM working set to
S unique rows per step (host dedup, data/sparse_batch.py), but its two
inner ops still pay XLA's random-row transaction rate (~12 ns/row on
v5e, PERF.md "speed-of-light" table):

  expand      rows[inv[i], :]            forward lookup of remapped ids
  accumulate  d_rows[inv[i], :] += g[i]  its AD transpose (segment-sum)

Both ops touch only the COMPACT [S, K] array (S ~ tens of KB rows at
the headline point, ~1.6 MB of payload), yet XLA keeps it in HBM and
issues one DMA descriptor per row — the per-ROW cost is identical to
gathering from the full [V, K] table, which is why the sparse path
measured only parity at 117k vocab (CLAUDE.md round-2 notes).

These kernels exploit what XLA cannot: the compact array FITS IN VMEM.
The table block is pinned in VMEM across the whole grid (constant index
map), the remapped indices arrive in SMEM one 32 KB block per grid step
(v5e SMEM is 1 MiB, so the full index array cannot scalar-prefetch),
and each row move is a scalar-addressed VPU vector load/store — no DMA
descriptor, no HBM transaction. The backward accumulate keeps the [S, K] f32
accumulator VMEM-resident across all batch chunks and flushes it to HBM
once.

Measured (v5e, headline point: S_pad=32k, N=426k rows, K=17, f32 — see
scripts/bench_pallas_sparse.py, unroll=16):

    expand      1.55 ms (3.6 ns/row)  vs XLA standalone 1.60 ms (tie)
    accumulate  3.28 ms (7.7 ns/row)  vs XLA standalone 7.38 ms (2.3x)

Standalone, XLA's own gather from a VMEM-sized operand is already fast
(the 12 ns/row figure is the [117k,17]-operand gather); the decisive
number is END-TO-END, where XLA's in-graph scatter formulation inside
the real training step does not reach its standalone small-operand
speed. With the kernels tied into the sparse lookup via jax.custom_vjp
(``make_vmem_expand_lookup``), gated by ``--pallas_expand`` +
``--sparse_table_update`` (scripts/bench_sparse.py --headline, Zipf
ids, B=16384, bf16 towers):

    dense + static_fields (prior headline)   10.6 ms/step  1.54M ex/s
    sparse + static, XLA inner ops           12.1 ms/step  1.36M ex/s
    sparse + static, Pallas inner ops         7.2 ms/step  2.27M ex/s

i.e. 1.47x over the dense headline. Under uniform ids (dedup 2.8x,
S_pad 262k > cap) the lookup falls back to XLA at trace time and
matches sparse_static exactly — the flag never regresses.

Capacity rule: the f32 VMEM footprint of a [S, K<=128] block is
S * 512 B (lane padding to 128), so S_pad <= VMEM_ROW_CAP keeps
table + chunk buffers inside VMEM; the lookup falls back to the XLA
ops above the cap at trace time (per pow2 bucket).

Reference behavior being accelerated: the async-PS sparse push/pull of
lambdaji/tf_repos (DeepCvrMTL.py:122, DeepMTL/README.md:43-45) — the
reference never materializes dense [V,K] traffic either; this is the
TPU-native equivalent of its row-granular parameter server.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# [S, K<=128] f32 rows cost 512 B each in VMEM (lane padding); 48k rows
# = 24 MB table + ~8 MB chunk/output buffers fits v5e's VMEM with room
# for Pallas's double-buffered pipeline. Above this, fall back to XLA.
VMEM_ROW_CAP = 49_152

# v5e VMEM is 128 MiB; the kernels' worst case (49k-row f32 table/
# accumulator + double-buffered chunk blocks) is ~34 MB — declare a
# 64 MB budget so XLA's scoped-vmem accounting (default 16 MB inside
# scan bodies) admits the kernel while leaving pipeline headroom.
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _default_interpret() -> bool:
    # Mosaic compiles only for TPU; interpret on the CPU test rig
    return jax.default_backend() == "cpu"


def _resolve_interpret(interpret, vma, chunk: int, unroll: int):
    """Pick the interpreter and cap the chunk for the CPU rig.

    Outside shard_map the fast generic HLO interpreter (interpret=True)
    is used. Inside shard_map(check_vma=True) (vma nonempty) it mis-
    tracks vma through its internal grid scan ("Scan carry ... mismatched
    varying manual axes"), so the TPU-semantics simulator
    (pltpu.InterpretParams) is substituted — it is ~1 ms per simulated
    row move, so the chunk is capped to bound the index-pad waste;
    row-processing ORDER is chunk-invariant, so results are unchanged."""
    if interpret is None:
        interpret = _default_interpret()
    if interpret is True and vma:
        interpret = pltpu.InterpretParams()
    if interpret is not False:
        chunk = min(chunk, 256)
        unroll = min(unroll, 8)
    return interpret, chunk, unroll


def _expand_kernel(idx_ref, table_ref, out_ref, *, chunk: int, unroll: int):
    """out[c*chunk + r, :] = table[idx[c*chunk + r], :] for one chunk.

    idx_ref is the chunk's index block, pipelined into SMEM by its
    BlockSpec (v5e SMEM is 1 MiB — the FULL index array does not fit,
    which rules out scalar prefetch; a 32 KB block does) so each row
    index is a plain scalar-register read. table_ref is the whole
    compact array, pinned in VMEM by its constant index map. The row
    move is one vector load + one vector store at a dynamic sublane
    address — the unrolled body gives Mosaic `unroll` independent
    load/store pairs to schedule per loop iteration, amortizing the
    loop carry."""

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            out_ref[pl.ds(r, 1), :] = table_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _accumulate_kernel(idx_ref, g_ref, out_ref, *, chunk: int, unroll: int):
    """out[idx[c*chunk + r], :] += g[c*chunk + r, :]; out is the [S, K]
    f32 accumulator, VMEM-resident across ALL grid steps (constant index
    map) and flushed to HBM once after the last chunk. Duplicate indices
    inside an unrolled group are correct: each += is an ordered VMEM
    read-modify-write on the same ref, which Mosaic may not reorder."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            out_ref[pl.ds(i, 1), :] = (
                out_ref[pl.ds(i, 1), :] + g_ref[pl.ds(r, 1), :]
            )
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(
    jax.jit, static_argnames=("chunk", "unroll", "interpret")
)
def expand_rows(
    table: jax.Array,  # [S, K] float
    idx: jax.Array,  # [N] int32, values in [0, S)
    chunk: int = 8192,
    unroll: int = 16,
    interpret: bool | None = None,
) -> jax.Array:  # [N, K], table.dtype
    """Pallas row expand: rows = table[idx]. See module docstring."""
    S, K = table.shape
    # inside shard_map(check_vma=True) the out aval must declare which
    # mesh axes it varies over: the union of the operands' (e.g. ids
    # shard over "data", the compact table is replicated)
    vma = jax.typeof(idx).vma | jax.typeof(table).vma
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (N,) = idx.shape
    Np = _round_up(N, chunk)
    if Np != N:
        idx = jnp.pad(idx, (0, Np - N))  # harmless extra reads of row 0

    out = pl.pallas_call(
        functools.partial(_expand_kernel, chunk=chunk, unroll=unroll),
        grid=(Np // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, K), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, K), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, K), table.dtype, vma=vma),
        # the pinned table + double-buffered chunks exceed XLA's default
        # 16 MB scoped-vmem accounting inside lax.scan bodies; declare
        # the kernel's true budget so scan-dispatch paths compile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, table)
    return out[:N]


@functools.partial(
    jax.jit, static_argnames=("s", "chunk", "unroll", "interpret")
)
def accumulate_rows(
    g: jax.Array,  # [N, K] float cotangent rows
    idx: jax.Array,  # [N] int32, values in [0, s)
    s: int,
    chunk: int = 8192,
    unroll: int = 16,
    interpret: bool | None = None,
) -> jax.Array:  # [s, K] float32
    """Pallas segment accumulate: out[i] = sum over {r: idx[r] == i} of
    g[r]. The AD transpose of expand_rows."""
    vma = jax.typeof(idx).vma | jax.typeof(g).vma  # see expand_rows
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (N, K) = g.shape
    Np = _round_up(N, chunk)
    if Np != N:
        # padded rows add zeros into row 0 — harmless
        idx = jnp.pad(idx, (0, Np - N))
        g = jnp.pad(g, ((0, Np - N), (0, 0)))
    g = g.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_accumulate_kernel, chunk=chunk, unroll=unroll),
        grid=(Np // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, K), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (s, K), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, K), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, g)


def _accumulate_packed_kernel(
    idx_ref, g_ref, out_ref, *, chunk: int, unroll: int, k: int, pack: int
):
    """Lane-packed segment accumulate: out is [ceil(S/pack), 128] f32
    holding `pack` logical K-wide table rows per 128-lane VMEM row —
    logical row i lives at [i // pack, (i % pack)*k : +k]. Cuts the
    pinned accumulator's VMEM footprint from S*512B (lane padding of a
    [S, K<=64] block) to S*K*4B, raising the row cap 128/K-fold — at
    K=16 from 49k to ~390k rows, which covers the published Ali-CCP
    operating point (~108k-260k unique ids/batch at B=4096, zipf
    1.05-1.2). Mosaic rejects dynamic-LANE-offset slices, so the inner
    RMW is a full 128-lane row op: pad the K-wide cotangent to 128
    lanes and place it with a dynamic `pltpu.roll` (lane rotate is a
    native TPU vector op); the dynamic SUBLANE (row) offset is fine."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    zpad = jnp.zeros((1, 128 - k), jnp.float32)

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            row = i // pack
            lane = (i % pack) * k
            grow = jnp.concatenate([g_ref[pl.ds(r, 1), :], zpad], axis=1)
            out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + pltpu.roll(
                grow, lane, axis=1
            )
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(
    jax.jit, static_argnames=("s", "chunk", "unroll", "interpret")
)
def accumulate_rows_packed(
    g: jax.Array,  # [N, K] float cotangent rows, K must divide 128
    idx: jax.Array,  # [N] int32, values in [0, s)
    s: int,
    chunk: int = 16384,
    unroll: int = 128,
    interpret: bool | None = None,
) -> jax.Array:  # [s, K] float32
    """accumulate_rows with a lane-packed VMEM accumulator (see the
    kernel docstring) — the above-49k-rows variant for K <= 64."""
    vma = jax.typeof(idx).vma | jax.typeof(g).vma
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (N, K) = g.shape
    pack = 128 // K
    rows = _round_up(s, pack) // pack
    Np = _round_up(N, chunk)
    if Np != N:
        idx = jnp.pad(idx, (0, Np - N))
        g = jnp.pad(g, ((0, Np - N), (0, 0)))
    g = g.astype(jnp.float32)

    packed = pl.pallas_call(
        functools.partial(
            _accumulate_packed_kernel, chunk=chunk, unroll=unroll,
            k=K, pack=pack,
        ),
        grid=(Np // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, K), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, g)
    # [rows, 128] -> [rows, pack, K] -> [rows*pack, K] -> [s, K]
    return packed.reshape(rows * pack, K)[:s]


# bytes cap for the PACKED accumulator: S*K*4 <= 24 MB (same VMEM budget
# as VMEM_ROW_CAP's S*512B <= 24 MB, without the lane padding)
_PACKED_BYTES_CAP = VMEM_ROW_CAP * 512


def fits_vmem_packed(s_pad: int, k: int) -> bool:
    return (
        k <= 64 and 128 % k == 0 and s_pad * k * 4 <= _PACKED_BYTES_CAP
    )


_warned_shapes: set = set()


def _warn_fallback(kind: str, s_pad: int, k: int, n_out: int = 0) -> None:
    """One loud trace-time warning per (kind, shape) when a Pallas sparse
    path silently degrades to XLA because the uids/COO bucket exceeds
    even the lane-packed VMEM cap — the footgun VERDICT r3 flagged:
    uniform ids at large vocab have no batch duplication, the bucket
    blows past the cap, and the step quietly runs ~2-3x slower.
    n_out > 0 flags the other blocker: the pooled output exceeds
    COO_OUT_CAP (huge batch x group count), which the rows-cap text
    would misdiagnose."""
    key = (kind, s_pad, k, n_out)
    if key in _warned_shapes:
        return
    _warned_shapes.add(key)
    import warnings

    if n_out > COO_OUT_CAP:
        warnings.warn(
            f"pallas {kind}: pooled output {n_out} rows exceeds the pinned-"
            f"VMEM output cap COO_OUT_CAP={COO_OUT_CAP}; falling back to "
            f"XLA gather/scatter. Cause: batch_size x n_groups too large "
            f"for the pinned [G,K] output. Remedy: smaller batch.",
            stacklevel=2,
        )
        return
    cap = VMEM_ROW_CAP if (k > 64 or 128 % k) else _PACKED_BYTES_CAP // (k * 4)
    warnings.warn(
        f"pallas {kind}: uids bucket {s_pad} rows (K={k}) exceeds the VMEM "
        f"cap {cap}; falling back to XLA gather/scatter (~2-3x slower row "
        f"ops). Causes: low batch id duplication (uniform/unsorted ids) or "
        f"huge batches. Remedies: frequency-sorted remap output, smaller "
        f"batch, or --mh_bucket/--mh_coo to cut live slots.",
        stacklevel=2,
    )


# --------------------------------------------------------------- COO pool
#
# The multi-hot combiner (ESMM's sum-pool over user-behavior fields,
# reference DeepCvrMTL.py:152-164 embedding_lookup_sparse) was measured
# as the DOMINANT device cost at Ali-CCP scale: at pad=64 the padded
# expand+accumulate over [B, 5*pad] slots is 19.6 ms of the 30.7 ms
# sparse step (ablation, round 3) — and ~85-90% of those slots are DEAD
# padding (true lengths ~4-8). The reference never paid for padding:
# tf.nn.embedding_lookup_sparse consumes COO sp_ids. These kernels
# restore that: the HOST packs live slots as a COO triplet
# (idx, dest, w) — data/sparse_batch.MhCooPacker, pipelined on the
# prefetch thread — and the device pools them with VMEM-resident
# read-modify-writes whose cost is proportional to LIVE slots, not pad:
#
#   fwd  out[dest[i], :] += w[i] * table[idx[i], :]     out [G,K] pinned
#   bwd  d_table[idx[i], :] += w[i] * d_out[dest[i], :] d_table [S,K] pinned
#
# Also slims the wire: [B, 5*pad] ids + [B, 4*pad] vals become ~3
# values per LIVE slot (9.4 MB -> ~1.6 MB per pad-64 batch at B=4096).


# the pooled output [G=B*n_groups, K] is pinned in VMEM alongside the
# compact table; B=4096 * 5 groups = 20480 rows = 10 MB f32 at K<=128
COO_OUT_CAP = 32_768


def _coo_pool_kernel(idx_ref, dest_ref, w_ref, table_ref, out_ref, *, chunk: int, unroll: int):
    """out[dest[r], :] += w[r] * table[idx[r], :] for one COO chunk; out
    is VMEM-pinned across all grid steps (constant index map) and flushed
    once. Padded COO entries carry idx=dest=0, w=0 — they add zero to
    row 0. Duplicate dests inside an unrolled group are ordered VMEM
    read-modify-writes on the same ref (Mosaic may not reorder them)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            d = dest_ref[r]
            out_ref[pl.ds(d, 1), :] = (
                out_ref[pl.ds(d, 1), :] + w_ref[r] * table_ref[pl.ds(i, 1), :]
            )
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _coo_pool_bwd_kernel(idx_ref, dest_ref, w_ref, dp_ref, out_ref, *, chunk: int, unroll: int):
    """d_table[idx[r], :] += w[r] * dp[dest[r], :] — the AD transpose of
    _coo_pool_kernel w.r.t. the table rows. dp ([G,K]) and the [S,K]
    accumulator are both VMEM-pinned."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            d = dest_ref[r]
            out_ref[pl.ds(i, 1), :] = (
                out_ref[pl.ds(i, 1), :] + w_ref[r] * dp_ref[pl.ds(d, 1), :]
            )
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_out", "chunk", "unroll", "interpret")
)
def coo_pool_rows(
    table: jax.Array,  # [S, K] float
    idx: jax.Array,  # [M] int32, values in [0, S)
    dest: jax.Array,  # [M] int32, values in [0, n_out)
    w: jax.Array,  # [M] float32 per-slot weights (vals * live mask)
    n_out: int,
    chunk: int = 8192,
    unroll: int = 16,
    interpret: bool | None = None,
) -> jax.Array:  # [n_out, K] float32
    """Pallas COO segment pool: out[d] = sum over {r: dest[r]==d} of
    w[r] * table[idx[r]]. See the COO-pool section comment."""
    S, K = table.shape
    vma = (
        jax.typeof(idx).vma | jax.typeof(dest).vma | jax.typeof(w).vma
        | jax.typeof(table).vma
    )
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (M,) = idx.shape
    Mp = _round_up(max(M, chunk), chunk)
    if Mp != M:
        # padded entries: idx=dest=0, w=0 -> add zero into out row 0
        idx = jnp.pad(idx, (0, Mp - M))
        dest = jnp.pad(dest, (0, Mp - M))
        w = jnp.pad(w, (0, Mp - M))
    table = table.astype(jnp.float32)
    w = w.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_coo_pool_kernel, chunk=chunk, unroll=unroll),
        grid=(Mp // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, K), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_out, K), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, K), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, dest, w, table)


@functools.partial(
    jax.jit, static_argnames=("s", "chunk", "unroll", "interpret")
)
def coo_accumulate_rows(
    dp: jax.Array,  # [G, K] float cotangent of the pooled output
    idx: jax.Array,  # [M] int32
    dest: jax.Array,  # [M] int32
    w: jax.Array,  # [M] float32
    s: int,
    chunk: int = 8192,
    unroll: int = 16,
    interpret: bool | None = None,
) -> jax.Array:  # [s, K] float32
    """d_table[i] = sum over {r: idx[r]==i} of w[r] * dp[dest[r]] — the
    AD transpose of coo_pool_rows."""
    vma = (
        jax.typeof(idx).vma | jax.typeof(dest).vma | jax.typeof(w).vma
        | jax.typeof(dp).vma
    )
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (M,) = idx.shape
    Mp = _round_up(max(M, chunk), chunk)
    if Mp != M:
        idx = jnp.pad(idx, (0, Mp - M))
        dest = jnp.pad(dest, (0, Mp - M))
        w = jnp.pad(w, (0, Mp - M))
    G, K = dp.shape
    dp = dp.astype(jnp.float32)
    w = w.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_coo_pool_bwd_kernel, chunk=chunk, unroll=unroll),
        grid=(Mp // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, K), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (s, K), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, K), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, dest, w, dp)


def _coo_accumulate_packed_kernel(
    idx_ref, dest_ref, w_ref, dp_ref, out_ref, *, chunk: int, unroll: int,
    k: int, pack: int
):
    """d_table[idx[r], :] += w[r] * dp[dest[r], :] into a LANE-PACKED
    [ceil(S/pack), 128] accumulator (see _accumulate_packed_kernel) —
    the above-cap COO pool backward. dp ([G,K]) stays VMEM-pinned; the
    packed accumulator covers S up to ~390k rows at K=16."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    zpad = jnp.zeros((1, 128 - k), jnp.float32)

    def body(j, carry):
        r0 = j * unroll
        for u in range(unroll):
            r = r0 + u
            i = idx_ref[r]
            d = dest_ref[r]
            row = i // pack
            lane = (i % pack) * k
            grow = jnp.concatenate(
                [w_ref[r] * dp_ref[pl.ds(d, 1), :], zpad], axis=1
            )
            out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + pltpu.roll(
                grow, lane, axis=1
            )
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(
    jax.jit, static_argnames=("s", "chunk", "unroll", "interpret")
)
def coo_accumulate_rows_packed(
    dp: jax.Array,  # [G, K] float cotangent of the pooled output
    idx: jax.Array,  # [M] int32
    dest: jax.Array,  # [M] int32
    w: jax.Array,  # [M] float32
    s: int,
    chunk: int = 16384,
    unroll: int = 128,
    interpret: bool | None = None,
) -> jax.Array:  # [s, K] float32
    """coo_accumulate_rows with the lane-packed accumulator — the
    above-VMEM_ROW_CAP variant for K <= 64, 128 % K == 0."""
    vma = (
        jax.typeof(idx).vma | jax.typeof(dest).vma | jax.typeof(w).vma
        | jax.typeof(dp).vma
    )
    interpret, chunk, unroll = _resolve_interpret(interpret, vma, chunk, unroll)
    (M,) = idx.shape
    Mp = _round_up(max(M, chunk), chunk)
    if Mp != M:
        idx = jnp.pad(idx, (0, Mp - M))
        dest = jnp.pad(dest, (0, Mp - M))
        w = jnp.pad(w, (0, Mp - M))
    G, K = dp.shape
    pack = 128 // K
    rows = _round_up(s, pack) // pack
    dp = dp.astype(jnp.float32)
    w = w.astype(jnp.float32)

    packed = pl.pallas_call(
        functools.partial(
            _coo_accumulate_packed_kernel, chunk=chunk, unroll=unroll,
            k=K, pack=pack,
        ),
        grid=(Mp // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, K), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(idx, dest, w, dp)
    return packed.reshape(rows * pack, K)[:s]


def coo_pool_reference(table, idx, dest, w, n_out: int) -> jax.Array:
    """XLA baseline / fallback for coo_pool_rows (autodiff provides the
    transpose). Used for tests, the CPU rig, and above-cap shapes."""
    rows = table[idx].astype(jnp.float32) * w.astype(jnp.float32)[:, None]
    return jnp.zeros((n_out, table.shape[-1]), jnp.float32).at[dest].add(rows)


def make_coo_pool(chunk: int = 8192, unroll: int = 16):
    """pool(rows, idx, dest, w, n_out) -> [n_out, K] f32 with the Pallas
    kernels above; trace-time XLA fallback when the compact table or the
    pooled output exceeds the VMEM caps. custom_vjp: the cotangent flows
    to the TABLE ROWS only — idx/dest are ints, and w is batch DATA (the
    multi-hot vals), never a differentiation target in any step builder;
    its returned cotangent is zeros.

    Inside shard_map(check_vma=True) the bwd psums d_rows over the mesh
    axes the COO arrays vary on but the replicated rows do not (the
    pbroadcast transpose JAX cannot see through a custom_vjp) — same
    plumbing as make_vmem_expand_lookup.

    Two tiers by compact-table size S (per pow2/quarter-pow2 bucket, at
    trace time):
      S <= VMEM_ROW_CAP: both directions fully VMEM-pinned (tier 1).
      S <= packed cap (~390k rows at K=16): XLA gathers forward into the
        plain streamed accumulate over the SMALL pinned [n_out, K]
        output; the backward runs the fused lane-packed accumulate —
        measured at the published Ali-CCP point (S=131k, M=2M, K=16):
        fwd 22.4 vs XLA-pool 24.5 ms, bwd ~30 vs XLA-scatter 35 ms.
    Above both caps: XLA with a one-time warning (_warn_fallback)."""

    def _make(extra_axes):
        @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
        def pool(rows, idx, dest, w, n_out):
            return coo_pool_rows(
                rows, idx, dest, w, n_out, chunk=chunk, unroll=unroll
            )

        def fwd(rows, idx, dest, w, n_out):
            return pool(rows, idx, dest, w, n_out), (idx, dest, w, rows.shape)

        def bwd(n_out, res, ct):
            idx, dest, w, (s, k) = res
            d_rows = coo_accumulate_rows(
                ct, idx, dest, w, s, chunk=chunk, unroll=unroll
            )
            if extra_axes:
                d_rows = jax.lax.psum(d_rows, extra_axes)
            return (
                d_rows,
                np.zeros(idx.shape, jax.dtypes.float0),
                np.zeros(dest.shape, jax.dtypes.float0),
                jnp.zeros_like(w),
            )

        pool.defvjp(fwd, bwd)
        return pool

    def _make_packed(extra_axes):
        @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
        def pool(rows, idx, dest, w, n_out):
            # above the row cap the table stays in HBM: XLA's gather is
            # the fastest random-row read there (4.2 ns/row measured);
            # only the segment-sum into the small pinned output is Pallas
            g = rows[idx].astype(jnp.float32) * w.astype(jnp.float32)[:, None]
            return accumulate_rows(g, dest, n_out, chunk=chunk, unroll=unroll)

        def fwd(rows, idx, dest, w, n_out):
            return pool(rows, idx, dest, w, n_out), (idx, dest, w, rows.shape)

        def bwd(n_out, res, ct):
            idx, dest, w, (s, k) = res
            d_rows = coo_accumulate_rows_packed(
                ct, idx, dest, w, s, chunk=chunk, unroll=unroll
            )
            if extra_axes:
                d_rows = jax.lax.psum(d_rows, extra_axes)
            return (
                d_rows,
                np.zeros(idx.shape, jax.dtypes.float0),
                np.zeros(dest.shape, jax.dtypes.float0),
                jnp.zeros_like(w),
            )

        pool.defvjp(fwd, bwd)
        return pool

    cache = {}

    def pool(rows, idx, dest, w, n_out: int):
        s, k = rows.shape
        if fits_vmem(s) and n_out <= COO_OUT_CAP:
            tier = 1
        elif fits_vmem_packed(s, k) and n_out <= COO_OUT_CAP:
            tier = 2
        else:
            _warn_fallback("coo_pool", s, k, n_out=n_out)
            return coo_pool_reference(rows, idx, dest, w, n_out)
        extra = tuple(
            sorted(
                (jax.typeof(idx).vma | jax.typeof(w).vma)
                - jax.typeof(rows).vma
            )
        )
        key = (extra, tier)
        if key not in cache:
            cache[key] = (_make if tier == 1 else _make_packed)(extra)
        return cache[key](rows, idx, dest, w, n_out)

    return pool


def expand_reference(table: jax.Array, idx: jax.Array) -> jax.Array:
    """XLA baseline for expand_rows (tests / fallback)."""
    return jnp.take(table, idx, axis=0)


def accumulate_reference(g: jax.Array, idx: jax.Array, s: int) -> jax.Array:
    """XLA baseline for accumulate_rows (tests / fallback)."""
    return (
        jnp.zeros((s, g.shape[-1]), jnp.float32)
        .at[idx]
        .add(g.astype(jnp.float32))
    )


def fits_vmem(s_pad: int) -> bool:
    return s_pad <= VMEM_ROW_CAP


def make_vmem_expand_lookup(chunk: int = 8192, unroll: int = 16):
    """lookup(rows, ids) for the sparse path's inner (remapped-id) lookup:
    Pallas expand forward, Pallas accumulate backward. Drop-in for
    ops.embedding.dense_lookup when the table argument is the compact
    [S, K] gathered-rows array of train/sparse.py.

    The VMEM capacity rule is applied at TRACE time per rows shape: the
    pow2 uids buckets retrace per bucket anyway, so each bucket size
    independently picks the kernel or the XLA fallback — a vocab-sized
    table (dense path, or a bucket above VMEM_ROW_CAP) silently keeps
    XLA's gather.

    ids of any rank are flattened for the kernel and the result reshaped
    to ids.shape + (K,), matching `table[ids]` semantics. The lookup is
    marked ``static_slice_ok`` — like dense_lookup, the table argument
    is positionally addressed, so models may serve static-id fields from
    a slice (models/deepfm.py static_fields fast path)."""

    def _make(extra_axes):
        # one custom_vjp per psum-axis set: inside
        # shard_map(check_vma=True) the bwd must hand back a cotangent
        # with the PRIMAL's vma — for a replicated rows operand that
        # means psumming over the mesh axes the cotangent picks up from
        # the (sharded) ids. This is exactly the pbroadcast-transpose
        # JAX inserts around plain primitives but cannot see through a
        # custom_vjp; the axis set is a trace-time constant
        # (ids.vma − rows.vma), so it is closed over, not a residual.
        @jax.custom_vjp
        def pl_lookup(rows, ids):
            flat = expand_rows(rows, ids.reshape(-1), chunk=chunk, unroll=unroll)
            return flat.reshape(ids.shape + rows.shape[-1:])

        def fwd(rows, ids):
            return pl_lookup(rows, ids), (ids, rows.shape)

        def bwd(res, ct):
            ids, (s, k) = res
            d_rows = accumulate_rows(
                ct.reshape(-1, k), ids.reshape(-1), s, chunk=chunk, unroll=unroll
            ).astype(jnp.float32)
            if extra_axes:
                d_rows = jax.lax.psum(d_rows, extra_axes)
            return d_rows, np.zeros(ids.shape, jax.dtypes.float0)

        pl_lookup.defvjp(fwd, bwd)
        return pl_lookup

    def _make_packed(extra_axes):
        # above VMEM_ROW_CAP: XLA's HBM gather forward (fastest random-
        # row read at big S, 4.2 ns/row) + the lane-packed Pallas
        # accumulate backward (S*K*4 B accumulator vs XLA scatter's
        # per-row transactions — measured 29.5 vs 35 ms at S=131k,
        # N=2M, K=16)
        @jax.custom_vjp
        def pl_lookup(rows, ids):
            return rows[ids]

        def fwd(rows, ids):
            return rows[ids], (ids, rows.shape)

        def bwd(res, ct):
            ids, (s, k) = res
            d_rows = accumulate_rows_packed(
                ct.reshape(-1, k), ids.reshape(-1), s, chunk=chunk,
                unroll=unroll,
            ).astype(jnp.float32)
            if extra_axes:
                d_rows = jax.lax.psum(d_rows, extra_axes)
            return d_rows, np.zeros(ids.shape, jax.dtypes.float0)

        pl_lookup.defvjp(fwd, bwd)
        return pl_lookup

    cache = {}

    def lookup(rows, ids):
        s, k = rows.shape
        if fits_vmem(s):
            tier = 1
        elif fits_vmem_packed(s, k):
            tier = 2
        else:
            _warn_fallback("expand_lookup", s, k)
            return rows[ids]
        extra = tuple(sorted(jax.typeof(ids).vma - jax.typeof(rows).vma))
        key = (extra, tier)
        if key not in cache:
            cache[key] = (_make if tier == 1 else _make_packed)(extra)
        return cache[key](rows, ids)

    lookup.static_slice_ok = True
    # the COO multi-hot pool rides the same opt-in: models reach it via
    # getattr(lookup, "coo_pool", xla default) — see models/esmm.py
    lookup.coo_pool = make_coo_pool(chunk=chunk, unroll=unroll)
    # sorted-window segment pair (DIN COO attention): same opt-in idiom
    lookup.seg_pool, lookup.seg_select = make_sorted_seg()
    lookup.sorted_bwd_expand = make_sorted_bwd_expand()
    return lookup


# ------------------------------------------- sorted-window segment ops
#
# DIN's published-regime step decomposition (scripts/bench_din_decomp.py,
# PERF.md round 5) showed the remaining time is the per-slot
# scatter/gather CHAIN around the attention MLP, not the MLP itself: one
# [M=1.31M,K]->[G=16k,K] XLA segment-scatter costs 14.6 ms (~11 ns/slot
# — one HBM transaction per slot) and its cotangent gather 5.7 ms, while
# G*K is only ~1 MB. The scalar-loop VMEM kernels above cap that at the
# VPU row-RMW rate (~7-15 ns/slot) — better, but still a scalar loop.
#
# These kernels instead exploit an ORDER invariant the COO packer
# already provides for free: emission is field-major with ascending
# batch rows (data/sparse_batch.MhCooPacker), so the COMPACT segment id
# (the running count of non-empty (field,row) pairs, derived on device
# from the per-(field,row) counts `__mhc_cnt`) is NONDECREASING along
# the slot stream with increments of at most 1. Over any chunk of C
# consecutive slots the segment ids therefore span a window of at most C
# rows starting at d0 = cdest[chunk_start] — which turns the segment sum
# into fully VECTORIZED work with no scalar-indexed loop at all:
#
#   local  = cdest_chunk - d0                      in [0, C)
#   onehot = (iota[W,C] == local[None,:])          W = C
#   out[d0 : d0+W, :] += onehot @ vals_chunk       one MXU matmul +
#                                                  one contiguous
#                                                  dynamic-sublane RMW
#
# and the matching windowed gather (src[cdest]) is the transpose:
# read the [W,K] window at d0, onehot.T-matmul it back to [C,K]. Cost
# per slot is ~W*K*2 MXU FLOPs (trivial) plus streamed VMEM traffic —
# measured on v5e at the DIN point (M=1.31M, G=16k, K=16) the segment
# sum runs ~10x faster than XLA's scatter (see PERF.md). Grid steps on
# a TPU core are SEQUENTIAL, so overlapping windows of consecutive
# chunks do not race.
#
# Contract: cdest int32, nondecreasing, increments <= 1 per slot,
# values in [0, n_out); M-bucket pad slots carry the LAST live slot's
# cdest (jnp.repeat(..., total_repeat_length) pads exactly so) with
# zero vals rows. The [n_out + C, K] f32 accumulator (resp. pinned
# source) lives in VMEM for the whole grid.


def _sorted_segsum_kernel(
    d0_ref, cdest_ref, vals_ref, out_ref, *, chunk: int, sub: int
):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # SUB sub-chunks per grid step: Mosaic block rules want the sublane
    # dim of the int32 cdest block divisible by 8, so the block carries
    # 8 chunk-rows and the kernel walks them (each with its own window)
    w = chunk + 16  # window: 16-aligned start + the <=chunk-1 range
    for u in range(sub):
        # the floor-to-16 happens IN-kernel: Mosaic cannot prove a value
        # loaded from SMEM aligned, but (x // 16) * 16 it can
        d0 = (d0_ref[c * sub + u] // 16) * 16
        local = cdest_ref[u, :] - d0  # [chunk], values in [0, w)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0)
            == local[None, :]
        ).astype(vals_ref.dtype)
        # HIGHEST for f32 operands: TPU DEFAULT matmul precision
        # decomposes f32 into bf16 passes — a 1.6e-3 relative error on
        # the segment sums. bf16 operands keep DEFAULT (Mosaic rejects
        # HIGHEST bf16, and the one-hot products are exact anyway: one
        # side is 1.0 and the accumulate is f32).
        prec = (
            jax.lax.Precision.HIGHEST
            if vals_ref.dtype == jnp.float32
            else None
        )
        partial = jnp.dot(
            onehot,
            vals_ref[pl.ds(u * chunk, chunk), :],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        out_ref[pl.ds(d0, w), :] = out_ref[pl.ds(d0, w), :] + partial


def _sorted_expand_kernel(
    d0_ref, cdest_ref, src_ref, out_ref, *, chunk: int, sub: int
):
    c = pl.program_id(0)
    w = chunk + 16
    for u in range(sub):
        d0 = (d0_ref[c * sub + u] // 16) * 16  # provably 16-aligned
        local = cdest_ref[u, :] - d0
        onehot = (
            local[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)
        ).astype(src_ref.dtype)
        window = src_ref[pl.ds(d0, w), :]  # [w, K]
        prec = (
            jax.lax.Precision.HIGHEST
            if src_ref.dtype == jnp.float32
            else None
        )
        # Mosaic requires a 32-bit matmul accumulator; the selection is
        # 1:1 so the f32->src-dtype cast is exact
        out_ref[pl.ds(u * chunk, chunk), :] = jnp.dot(
            onehot, window, preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(src_ref.dtype)


_SORTED_SUB = 8  # chunk-rows per grid step (sublane-divisibility rule)


def _sorted_prep(cdest: jax.Array, chunk: int):
    """Pad the slot stream to a chunk*sub multiple (edge mode keeps the
    nondecreasing contract), shape it [rows, chunk] for the (8, chunk)
    VMEM blocks, and slice the per-chunk window starts (the FULL [rows]
    d0s array rides in SMEM as one block — block == array shape is
    always legal; per-step size-1 blocks are not)."""
    (m,) = cdest.shape
    mp = _round_up(m, chunk * _SORTED_SUB)
    if mp != m:
        cdest = jnp.pad(cdest, (0, mp - m), mode="edge")
    # raw window starts; the kernels floor them to 16 in-kernel (bf16's
    # (16, 128) tiling demands provably aligned dynamic sublane offsets)
    # and read/RMW a [chunk + 16]-row window
    d0s = cdest[::chunk]
    return cdest.reshape(mp // chunk, chunk), d0s, mp


@functools.partial(
    jax.jit, static_argnames=("n_out", "chunk", "interpret")
)
def sorted_segsum(
    vals: jax.Array,  # [M, K] float
    cdest: jax.Array,  # [M] int32, see contract above
    n_out: int,
    chunk: int = 512,
    interpret: bool | None = None,
) -> jax.Array:  # [n_out, K] f32
    """out[j] = sum over {i: cdest[i] == j} of vals[i] — the windowed
    MXU formulation (module comment)."""
    vma = jax.typeof(cdest).vma | jax.typeof(vals).vma
    interpret, chunk, _ = _resolve_interpret(interpret, vma, chunk, 8)
    (m, k) = vals.shape
    sub = _SORTED_SUB
    cdest2, d0s, mp = _sorted_prep(cdest, chunk)
    if mp != m:
        vals = jnp.pad(vals, ((0, mp - m), (0, 0)))
    grid = mp // (chunk * sub)
    out = pl.pallas_call(
        functools.partial(_sorted_segsum_kernel, chunk=chunk, sub=sub),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (sub, chunk), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sub * chunk, k), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_out + chunk + 16, k), lambda c: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_out + chunk + 16, k), jnp.float32, vma=vma
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(d0s, cdest2, vals)
    return out[:n_out]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def sorted_expand(
    src: jax.Array,  # [n_src, K] float
    cdest: jax.Array,  # [M] int32, see contract above
    chunk: int = 512,
    interpret: bool | None = None,
) -> jax.Array:  # [M, K] src.dtype
    """out[i] = src[cdest[i]] — the windowed transpose of
    sorted_segsum."""
    vma = jax.typeof(cdest).vma | jax.typeof(src).vma
    interpret, chunk, _ = _resolve_interpret(interpret, vma, chunk, 8)
    (m,) = cdest.shape
    n_src, k = src.shape
    sub = _SORTED_SUB
    cdest2, d0s, mp = _sorted_prep(cdest, chunk)
    grid = mp // (chunk * sub)
    src = jnp.pad(src, ((0, chunk + 16), (0, 0)))  # window overhang
    out = pl.pallas_call(
        functools.partial(_sorted_expand_kernel, chunk=chunk, sub=sub),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (sub, chunk), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_src + chunk + 16, k), lambda c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (sub * chunk, k), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, k), src.dtype, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(d0s, cdest2, src)
    return out[:m]


def sorted_segsum_reference(vals, cdest, n_out: int) -> jax.Array:
    """XLA baseline / above-cap fallback (autodiff gives the transpose)."""
    return (
        jnp.zeros((n_out, vals.shape[-1]), jnp.float32)
        .at[cdest]
        .add(vals.astype(jnp.float32), indices_are_sorted=True)
    )


def sorted_expand_reference(src, cdest) -> jax.Array:
    return jnp.take(src, cdest, axis=0, indices_are_sorted=True)


# VMEM bytes cap for the pinned [n_out + chunk, K] f32 accumulator /
# source (512 B/row lane-padded) — beyond it the XLA forms take over at
# trace time. Same 24 MB pinned budget as VMEM_ROW_CAP: ~48k pooled
# rows, covering B=4096 x 4-5 groups with 2-3x headroom.
_SORTED_SEG_BYTES_CAP = VMEM_ROW_CAP * 512


def _sorted_segsum_packed_kernel(
    d0_ref, cdest_ref, vals_ref, out_ref, *, chunk: int, sub: int, k: int,
    pack: int,
):
    """sorted_segsum with a LANE-PACKED accumulator: out is
    [rows, 128] f32 holding `pack` logical K-wide segment rows per
    128-lane VMEM row (the accumulate_rows_packed layout) — raises the
    pinned-output cap 128/K-fold, covering the [M,K]->[S~114k,K]
    backward accumulate of the COO lookup when the slot stream arrives
    idx-sorted. The matmul PRODUCES the packed layout directly: one
    one-hot matmul per lane slot p selects the slots with
    local % pack == p, and the pack results concatenate along lanes —
    same total FLOPs as the unpacked kernel, no relayout."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    align = 8 * pack  # packed-row window start must be 8-sublane aligned
    wp = (chunk + 2 * align) // pack  # window height in packed rows
    for u in range(sub):
        d0 = (d0_ref[c * sub + u] // align) * align  # provably aligned
        pr0 = d0 // pack
        local = cdest_ref[u, :] - d0  # [chunk] in [0, chunk + align)
        lrow = local // pack
        lslot = local % pack
        iota = jax.lax.broadcasted_iota(jnp.int32, (wp, chunk), 0)
        vals_u = vals_ref[pl.ds(u * chunk, chunk), :]
        parts = []
        for p in range(pack):
            mask = (
                (iota == lrow[None, :]) & (lslot[None, :] == p)
            ).astype(vals_u.dtype)
            prec = (
                jax.lax.Precision.HIGHEST
                if vals_u.dtype == jnp.float32
                else None
            )
            parts.append(
                jnp.dot(
                    mask, vals_u,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            )
        partial = jnp.concatenate(parts, axis=1)  # [wp, pack*K = 128]
        out_ref[pl.ds(pr0, wp), :] = out_ref[pl.ds(pr0, wp), :] + partial


@functools.partial(
    jax.jit, static_argnames=("n_out", "chunk", "interpret")
)
def sorted_segsum_packed(
    vals: jax.Array,  # [M, K] float, K divides 128
    cdest: jax.Array,  # [M] int32, nondecreasing, increments <= 1
    n_out: int,
    chunk: int = 512,
    interpret: bool | None = None,
) -> jax.Array:  # [n_out, K] f32
    """sorted_segsum for big n_out (lane-packed pinned accumulator)."""
    vma = jax.typeof(cdest).vma | jax.typeof(vals).vma
    interpret, chunk, _ = _resolve_interpret(interpret, vma, chunk, 8)
    (m, k) = vals.shape
    pack = 128 // k
    sub = _SORTED_SUB
    cdest2, d0s, mp = _sorted_prep(cdest, chunk)
    if mp != m:
        vals = jnp.pad(vals, ((0, mp - m), (0, 0)))
    grid = mp // (chunk * sub)
    align = 8 * pack
    rows = _round_up(n_out + chunk + 2 * align, pack) // pack
    out = pl.pallas_call(
        functools.partial(
            _sorted_segsum_packed_kernel, chunk=chunk, sub=sub, k=k,
            pack=pack,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (sub, chunk), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sub * chunk, k), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(d0s, cdest2, vals)
    return out.reshape(rows * pack, k)[:n_out]


def _sorted_seg_fits(n_out: int, k: int, chunk: int = 512) -> bool:
    return (n_out + chunk) * max(k, 128) * 4 <= _SORTED_SEG_BYTES_CAP


def make_sorted_seg(chunk: int = 512):
    """(seg_pool, seg_select) differentiable pair over a sorted compact
    segment stream (contract in the module comment):

      seg_pool(vals, cdest, n_out) -> [n_out, K] f32   segment sum
      seg_select(src, cdest)       -> [M, K]           src[cdest]

    Each is the other's AD transpose, so one custom_vjp closes both
    directions; the usual vma psum plumbing (see make_vmem_expand_lookup)
    applies when the operands' mesh-axis sets differ.

    Direction/dtype tiering, measured at the DIN published point
    (M=1.31M, G=16k, K=16, v5e):

      segsum  XLA 13.9 ms | Pallas f32 7.9 | Pallas bf16 3.0
      expand  XLA  6.8 ms | Pallas f32 9.1 | Pallas bf16 2.9

    The f32 Pallas matmuls pay Precision.HIGHEST (6 MXU passes — TPU
    DEFAULT would bf16-round the operands), so: segment SUMS always take
    the Pallas kernel (wins in both dtypes); the selection side takes
    Pallas for bf16 and XLA's gather for f32. When the primal stream is
    bf16, the pool's backward casts the cotangent to bf16 BEFORE the
    selection — bit-identical to selecting in f32 and casting after
    (selection is 1:1), and 3x faster. Falls back to the XLA forms
    above the VMEM cap."""

    def _make_pool(extra_axes, vdt, packed=False):
        # primal dtype closed over (residuals must be jax types).
        # packed: the lane-packed accumulator mid-tier — raises the
        # pinned-output cap 128/K-fold for big pooled outputs (e.g.
        # B=16384 x ng groups) before the XLA fallback
        seg_fn = sorted_segsum_packed if packed else sorted_segsum

        @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
        def seg_pool(vals, cdest, n_out):
            return seg_fn(vals, cdest, n_out, chunk=chunk)

        def fwd(vals, cdest, n_out):
            return seg_pool(vals, cdest, n_out), cdest

        def bwd(n_out, cdest, ct):
            if vdt == jnp.bfloat16 and not packed:
                d_vals = sorted_expand(
                    ct.astype(jnp.bfloat16), cdest, chunk=chunk
                )
            else:
                # packed tier: the pool output is exactly the size that
                # FAILED the unpacked pinned-VMEM check — the Pallas
                # expand would pin it as its source and blow the VMEM
                # budget at trace time; XLA's gather covers it
                d_vals = sorted_expand_reference(ct, cdest).astype(vdt)
            if extra_axes:
                d_vals = jax.lax.psum(d_vals, extra_axes)
            return d_vals, np.zeros(cdest.shape, jax.dtypes.float0)

        seg_pool.defvjp(fwd, bwd)
        return seg_pool

    def _make_select(extra_axes, n_src, sdt):
        # the source row count is a trace-time constant the transpose
        # needs as a static shape — closed over, like the dtype
        @jax.custom_vjp
        def seg_select(src, cdest):
            if sdt == jnp.bfloat16:
                return sorted_expand(src, cdest, chunk=chunk)
            return sorted_expand_reference(src, cdest)

        def fwd(src, cdest):
            return seg_select(src, cdest), cdest

        def bwd(cdest, ct):
            d_src = sorted_segsum(ct, cdest, n_src, chunk=chunk).astype(sdt)
            if extra_axes:
                d_src = jax.lax.psum(d_src, extra_axes)
            return d_src, np.zeros(cdest.shape, jax.dtypes.float0)

        seg_select.defvjp(fwd, bwd)
        return seg_select

    pool_cache, sel_cache = {}, {}

    def seg_pool(vals, cdest, n_out: int):
        k = vals.shape[-1]
        packed = not _sorted_seg_fits(n_out, k, chunk)
        if packed and not (
            k <= 64 and 128 % k == 0
            and fits_vmem_packed(n_out + chunk + 16 * (128 // k), k)
        ):
            return sorted_segsum_reference(vals, cdest, n_out)
        extra = tuple(
            sorted(jax.typeof(cdest).vma - jax.typeof(vals).vma)
        )
        key = (extra, vals.dtype, packed)
        if key not in pool_cache:
            pool_cache[key] = _make_pool(extra, vals.dtype, packed)
        return pool_cache[key](vals, cdest, n_out)

    def seg_select(src, cdest):
        if not _sorted_seg_fits(src.shape[0], src.shape[-1], chunk):
            return sorted_expand_reference(src, cdest)
        extra = tuple(
            sorted(jax.typeof(cdest).vma - jax.typeof(src).vma)
        )
        key = (extra, src.shape[0], src.dtype)
        if key not in sel_cache:
            sel_cache[key] = _make_select(extra, src.shape[0], src.dtype)
        return sel_cache[key](src, cdest)

    return seg_pool, seg_select


def make_sorted_bwd_expand(chunk: int = 512):
    """expand(rows, ids) whose BACKWARD rides the idx-sorted aux stream
    (data/sparse_batch.MhCooPacker sorted_aux=True):

      fwd: rows[ids]                        (XLA gather — fastest random
                                             row read at any S)
      bwd: sct  = ct[perm], masked to the sorted live prefix
           seg  = sorted_segsum_packed(sct, cidx, su)   (windowed MXU
                                             matmuls into a lane-packed
                                             pinned accumulator)
           out  = zeros([S,K]).at[srows].add(seg)       (Su-row scatter)

    replacing the per-slot scalar-RMW accumulate (accumulate_rows_packed,
    ~15-19 ms at M=1.31M/S=114k) with a [M,K] permutation gather + the
    vectorized segment sum. perm/cidx/srows pad with 0; positions >=
    m_live in the SORTED stream are masked, so 0-sentinel bucket growth
    is harmless (pad segments sum to zero and land additively on row
    srows[pad]=0). Falls back to accumulate_rows_packed when the packed
    run table exceeds the VMEM cap."""

    def _make(extra_axes, su, s_rows, k, cast_bf16):
        fits = fits_vmem_packed(su + chunk + 2 * (8 * (128 // k)), k)

        @jax.custom_vjp
        def expand(rows, ids, perm, cidx, srows, m_live):
            return rows[ids]

        def fwd(rows, ids, perm, cidx, srows, m_live):
            return rows[ids], (ids, perm, cidx, srows, m_live)

        def bwd(res, ct):
            ids, perm, cidx, srows, m_live = res
            if fits:
                # cast_bf16: when the model multiplied the expanded rows
                # in bf16, the arriving cotangent VALUES are exactly
                # bf16-representable (they were produced as bf16 and
                # convert-transposed up) — casting down is lossless and
                # halves the permutation-gather bytes while the packed
                # segsum takes its fast bf16 MXU path (f32 pays 6-pass
                # HIGHEST and measured a wash vs the scalar accumulate)
                sct = (
                    ct.astype(jnp.bfloat16) if cast_bf16
                    else ct.astype(jnp.float32)
                )[perm]
                sct = jnp.where(
                    (jnp.arange(sct.shape[0]) < m_live)[:, None],
                    sct,
                    jnp.zeros((), sct.dtype),
                )
                seg = sorted_segsum_packed(sct, cidx, su, chunk=chunk)
                d_rows = (
                    jnp.zeros((s_rows, k), jnp.float32)
                    .at[srows]
                    .add(seg, mode="drop")
                )
            else:
                d_rows = accumulate_rows_packed(
                    ct.astype(jnp.float32), ids, s_rows
                )
            if extra_axes:
                d_rows = jax.lax.psum(d_rows, extra_axes)
            z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
            return (
                d_rows, z(ids), z(perm), z(cidx), z(srows), z(m_live),
            )

        expand.defvjp(fwd, bwd)
        return expand

    cache = {}

    def expand(rows, ids, perm, cidx, srows, m_live, cast_bf16=False):
        extra = tuple(sorted(jax.typeof(ids).vma - jax.typeof(rows).vma))
        key = (
            extra, srows.shape[0], rows.shape[0], rows.shape[1],
            bool(cast_bf16),
        )
        if key not in cache:
            cache[key] = _make(extra, *key[1:])
        return cache[key](rows, ids, perm, cidx, srows, m_live)

    return expand


# ------------------------------------------------------ DMA row scatter
#
# The vocab-row WRITE-BACK (table.at[u].set(rows)) is the costliest
# single op of the large-vocab sparse step even after --fused_table
# collapses it to one scatter: XLA's scatter measured 15.4-18.7 ms at
# V=4.5M, S=131k on v5e while the same-bytes gather runs 4.5-5.8 ms
# (PERF.md). The uids are UNIQUE by the dedup contract, so the scatter
# is really S independent row copies — no read-modify-write, no
# collision handling. This kernel issues them as per-row async DMA
# copies (rows stay in HBM; indices stream through SMEM blocks; `nsem`
# copies in flight per wave), sidestepping XLA's conservative scatter
# lowering entirely. Out-of-range indices (vocab sentinels, the sharded
# path's OOB slots) are skipped — exactly mode="drop".
#
# Blocked in round 4 (the axon remote-compile helper 500'd on ANY-
# memory-space kernels); the helper was fixed, re-validated round 5.


def _dma_scatter_kernel(
    idx_ref, rows_ref, tin_ref, tout_ref, sems, *, chunk: int, nsem: int,
    v: int,
):
    """tout[idx[r]] = rows[c*chunk + r] for one SMEM index block, as
    waves of `nsem` in-flight row DMAs (start nsem, then wait nsem —
    the wave keeps the DMA queues deep without per-slot ring
    bookkeeping). tin is the aliased input table; only DMA writes touch
    tout."""
    del tin_ref
    c = pl.program_id(0)
    base = c * chunk

    def wave(g, carry):
        r0 = g * nsem
        for j in range(nsem):
            d = idx_ref[r0 + j]

            @pl.when(d < v)
            def _(j=j, d=d):
                pltpu.make_async_copy(
                    rows_ref.at[base + r0 + j], tout_ref.at[d], sems.at[j]
                ).start()

        for j in range(nsem):
            d = idx_ref[r0 + j]

            @pl.when(d < v)
            def _(j=j, d=d):
                pltpu.make_async_copy(
                    rows_ref.at[base + r0 + j], tout_ref.at[d], sems.at[j]
                ).wait()

        return carry

    jax.lax.fori_loop(0, chunk // nsem, wave, 0)


def dma_row_scatter(
    table: jax.Array,  # [V, K]
    u: jax.Array,  # [S] int32, unique; >= V dropped
    rows: jax.Array,  # [S, K], same dtype as table
    chunk: int = 8192,
    nsem: int = 16,
    interpret: bool | None = None,
) -> jax.Array:
    """table.at[u].set(rows, mode="drop", unique_indices=True) as S
    independent per-row DMA copies. The table input is aliased to the
    output (in-place under donation). See the section comment above."""
    V, K = table.shape
    if rows.dtype != table.dtype:
        rows = rows.astype(table.dtype)
    vma = jax.typeof(u).vma | jax.typeof(table).vma | jax.typeof(rows).vma
    interpret, chunk, nsem = _resolve_interpret(interpret, vma, chunk, nsem)
    if isinstance(interpret, pltpu.InterpretParams):
        # shard_map on the CPU rig: the TPU-semantics simulator DEADLOCKS
        # on this kernel's DMA semaphores under multi-device meshes
        # (threads parked in interpret_pallas_call._barrier — the round-4
        # gotcha). The kernel's semantics are exactly the drop-mode row
        # set, so the XLA form is a bit-exact stand-in; sharded CPU tests
        # exercise the lane-padded layout + sharding, and the real kernel
        # is covered single-chip (generic interpreter + real TPU).
        return table.at[u].set(rows, mode="drop", unique_indices=True)
    S = u.shape[0]
    chunk = min(chunk, _round_up(S, nsem))
    if S % chunk:
        pad = _round_up(S, chunk) - S
        u = jnp.pad(u, (0, pad), constant_values=V)
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    return pl.pallas_call(
        functools.partial(
            _dma_scatter_kernel, chunk=chunk, nsem=nsem, v=V
        ),
        grid=(u.shape[0] // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            # rows EXPLICITLY in HBM: ANY lets Mosaic place the [S,K]
            # block in VMEM, whose tiled memref rejects non-128-lane row
            # slices (K=48); HBM memrefs are untiled, so per-row DMA
            # slices of any width are legal
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((V, K), table.dtype, vma=vma),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(u, rows, table)
