"""Pallas TPU kernel: field-partitioned embedding-table gradient scatter.

The hot ops of a CTR step are the embedding gather (forward) and
scatter-add (backward). On the TensorCore both are HBM-transaction-bound
under XLA; the scatter is the worst (measured ~11.6 ms for 640k rows into
a [117k, 17] table at batch 16k on v5e — ~3x the cost of the gather).

This kernel replaces the backward scatter for datasets whose id space is
FIELD-PARTITIONED — each field's ids live in a contiguous [offset,
offset+size) block, which is exactly the layout the Criteo preprocessor
emits (features/criteo.py: per-field offsets; reference
get_criteo_feature.py:120-125). The scatter becomes a one-hot transpose
matmul per (field, vocab-chunk):

    dtable[off_f + v*TV : +TV, :] = Σ_batch-tiles  onehotᵀ(ids_f) @ g_f

with the one-hot tile built on the VPU inside VMEM (never materialized to
HBM) and the contraction on the MXU. Grid order (F, NV, NB) keeps each
[TV, W] output piece resident in VMEM across all batch tiles (written
back exactly once); XLA then adds the dense pieces into the table at
static offsets.

The forward stays XLA's native gather (it is already near its
transaction bound; a Pallas scalar-loop gather measures SLOWER). The two
are tied with jax.custom_vjp in ``make_field_block_lookup``.

Measured on v5e (batch 16k, Criteo shapes): 9.0 ms (bf16) vs 12.0 ms for
XLA's STANDALONE scatter — but inside the real training step XLA fuses
the scatter with the surrounding backward/update graph and wins
end-to-end (15.3 ms/step plain vs 18.8 ms/step with this kernel, because
custom_vjp breaks that fusion and adds two layout transposes). The
kernel therefore stays OPT-IN via --field_blocks: it is the right shape
on hardware where the scatter dominates harder, and documents the
one-hot-matmul technique; on v5e prefer the default XLA path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scatter_kernel(
    offs_ref,  # SMEM [F] int32 — per-field block offset (absolute row)
    sizes_ref,  # SMEM [F] int32 — per-field block size
    ids_ref,  # VMEM (8, TB) int32 — absolute ids, 8-field group x batch tile
    g_ref,  # VMEM (1, TB, W) f32 — grad rows for (field, batch tile)
    out_ref,  # VMEM (1, 1, TV, W) f32 — piece (f, v), resident across b
    *,
    tile_v: int,
    acc_dtype,
):
    f = pl.program_id(0)
    v = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    off = offs_ref[f]
    size = sizes_ref[f]
    base = off + v * tile_v

    @pl.when(v * tile_v < size)
    def _():
        ids = ids_ref[f - (f // 8) * 8, :]  # [TB] (row within the 8-group)
        rel = ids - base  # relative row within this vocab chunk
        col = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], tile_v), 1)
        valid_col = col < (size - v * tile_v)  # stay inside the field block
        onehot = ((rel[:, None] == col) & valid_col).astype(acc_dtype)
        g = g_ref[0].astype(acc_dtype)  # [TB, W]
        piece = jax.lax.dot_general(
            onehot,
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),  # onehotᵀ @ g
            preferred_element_type=jnp.float32,
            # bf16 mode: one MXU pass, grads bf16-rounded pre-sum (f32
            # accumulation). f32 mode: 3-pass for near-exact results.
            precision=(
                jax.lax.Precision.DEFAULT
                if acc_dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            ),
        )
        out_ref[0, 0, :, :] += piece


@functools.partial(
    jax.jit,
    static_argnames=("vocab", "offsets", "sizes", "tile_b", "tile_v", "use_bf16", "interpret"),
)
def field_block_scatter(
    ids: jax.Array,  # [B, F] int32 absolute ids
    g: jax.Array,  # [B, F, W] f32 per-row gradients
    vocab: int,
    offsets: Tuple[int, ...],
    sizes: Tuple[int, ...],
    tile_b: int = 2048,
    tile_v: int = 512,
    use_bf16: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """dtable [vocab, W] = scatter-add of g at ids (field-partitioned).

    use_bf16: build the one-hot and cast g to bf16 for the MXU (f32
    accumulation via preferred_element_type). Gradients are bf16-rounded
    per-row before the sum — within normal gradient noise; pass False for
    bit-accurate f32 (≈3x MXU cost)."""
    if interpret is None:
        # Mosaic compiles only for TPU; interpret on the CPU test rig
        interpret = jax.default_backend() == "cpu"
    B, F = ids.shape
    W = g.shape[-1]
    assert len(offsets) == F and len(sizes) == F
    max_v = max(sizes)
    n_v = pl.cdiv(max_v, tile_v)
    Bp = _round_up(B, tile_b)
    if Bp != B:
        ids = jnp.pad(ids, ((0, Bp - B), (0, 0)), constant_values=-1)
        g = jnp.pad(g, ((0, Bp - B), (0, 0), (0, 0)))
    n_b = Bp // tile_b

    # Mosaic block layouts: ids as [F8, B] (8-field sublane groups x
    # 128-aligned batch lanes), g as [F, B, W] so the (batch, W) tail is
    # (8,128)-tileable
    F8 = _round_up(F, 8)
    ids_t = jnp.pad(ids.T, ((0, F8 - F), (0, 0)), constant_values=-1)
    g_t = jnp.transpose(g, (1, 0, 2))

    acc_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    offs_arr = jnp.asarray(offsets, jnp.int32)
    sizes_arr = jnp.asarray(sizes, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offs, sizes
        grid=(F, n_v, n_b),
        in_specs=[
            pl.BlockSpec(
                (8, tile_b), lambda f, v, b, *_: (f // 8, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_b, W), lambda f, v, b, *_: (f, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_v, W), lambda f, v, b, *_: (f, v, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    pieces = pl.pallas_call(
        functools.partial(_scatter_kernel, tile_v=tile_v, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((F, n_v, tile_v, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs_arr, sizes_arr, ids_t, g_t)

    # assemble: add the dense per-(field, chunk) pieces at static offsets
    dtable = jnp.zeros((vocab + tile_v, W), g.dtype)  # +margin for last chunk
    for f in range(F):
        for v in range(int(np.ceil(sizes[f] / tile_v))):
            base = offsets[f] + v * tile_v
            dtable = dtable.at[base : base + tile_v].add(pieces[f, v])
    return dtable[:vocab]


def scatter_reference(ids, g, vocab):
    """XLA scatter-add baseline (used by tests and as fallback)."""
    W = g.shape[-1]
    return (
        jnp.zeros((vocab, W), g.dtype)
        .at[ids.reshape(-1)]
        .add(g.reshape(-1, W), mode="drop")
    )


def make_field_block_lookup(
    vocab: int,
    offsets: Sequence[int],
    sizes: Sequence[int],
    tile_b: int = 2048,
    tile_v: int = 512,
    use_bf16: bool = True,
):
    """lookup(table, ids) -> rows with XLA-gather forward and the Pallas
    field-block scatter backward. Drop-in for ops.embedding.dense_lookup
    on field-partitioned id spaces (single-chip path)."""
    offsets = tuple(int(o) for o in offsets)
    sizes = tuple(int(s) for s in sizes)

    @jax.custom_vjp
    def lookup(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], (ids, table.shape)

    def bwd(res, ct):
        ids, tshape = res
        if ids.ndim == 2 and ct.ndim == 3:
            dtable = field_block_scatter(
                ids, ct, tshape[0], offsets, sizes, tile_b, tile_v, use_bf16
            )
        else:  # non [B,F] use (e.g. multi-hot fields) — XLA fallback
            dtable = scatter_reference(
                ids.reshape(-1, ids.shape[-1]) if ids.ndim > 2 else ids,
                ct,
                tshape[0],
            )
        return dtable.astype(jnp.float32), np.zeros(ids.shape, jax.dtypes.float0)

    lookup.defvjp(fwd, bwd)
    return lookup
