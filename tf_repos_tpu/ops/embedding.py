"""Embedding-table creation and shard-aware lookup.

Single-chip lookup is a plain XLA gather. Under a multi-chip mesh the
tables are ROW-SHARDED over the "model" axis (the TPU-native replacement
for the reference's parameter-server variable sharding — SURVEY.md §2.5):
each shard gathers the ids that fall in its row range (masked, clamped)
and a psum over the model axis assembles the full embeddings. The psum
rides ICI; its transpose is the local scatter-add, so table gradients
stay shard-local with no extra communication.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

LookupFn = Callable[[jax.Array, jax.Array], jax.Array]


def glorot_normal_init(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """tf.glorot_normal_initializer semantics: truncated normal with
    stddev = sqrt(2/(fan_in+fan_out)); for 1-D shapes TF's compute_fans
    gives fan_in = fan_out = shape[0] (used for FM_W, DeepFM.py:115)."""
    if len(shape) == 1:
        fan_in = fan_out = shape[0]
    else:
        fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    # TF truncates at 2 sigma and rescales by 1/0.87962566 internally
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype) * (std / 0.87962566)


def dense_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Unsharded gather: table:[V,...], ids:int[...] -> [..., ...]."""
    return table[ids]


def xla_coo_pool(table: jax.Array, idx: jax.Array, dest: jax.Array,
                 w: jax.Array, n_out: int) -> jax.Array:
    """COO multi-hot segment pool, XLA form: out[d] = sum over
    {r: dest[r]==d} of w[r] * table[idx[r]]. The default device combiner
    for --mh_coo batches (data/sparse_batch.MhCooPacker); a lookup fn may
    expose a faster drop-in as its ``coo_pool`` attribute (the Pallas
    VMEM kernels of ops/pallas_sparse.make_coo_pool, reached via
    --pallas_expand). Padded COO entries (idx=dest=0, w=0) contribute
    w=0 rows — exactly zero — into output row 0, so padding is
    harmless."""
    rows = table[idx].astype(jnp.float32) * w.astype(jnp.float32)[:, None]
    return jnp.zeros((n_out, table.shape[-1]), jnp.float32).at[dest].add(rows)


def make_sharded_lookup(model_axis: str) -> LookupFn:
    """Lookup for use INSIDE shard_map where ``table`` is the local row
    shard. Shards must be equal-sized (pad the vocab to a multiple of the
    model-axis size; id 0 is reserved padding so clamping is safe)."""

    def lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
        shard = jax.lax.axis_index(model_axis)
        rows = table.shape[0]
        local = ids - shard * rows
        ok = (local >= 0) & (local < rows)
        safe = jnp.clip(local, 0, rows - 1)
        emb = table[safe]
        mask = ok.astype(emb.dtype)
        emb = emb * (mask[..., None] if emb.ndim > ids.ndim else mask)
        return jax.lax.psum(emb, model_axis)

    return lookup


def fused_linear_table_init(
    rng_w: jax.Array, rng_v: jax.Array, feature_size: int, k: int
) -> jax.Array:
    """One [V, 1+K] table: column 0 is the first-order weight (the
    reference's FM_W / linear table), columns 1..K the embedding (FM_V).

    TPU-first optimization: the reference gathers two tables per step
    (e.g. DeepFM.py:126 and :130). Sparse gathers on the TensorCore are
    HBM-transaction-bound, so fusing them into ONE table halves both the
    forward gather and the backward scatter-add transaction count
    (measured ~4ms + ~4ms per step at batch 16k on v5e). Initialization
    matches the separate tables exactly: col 0 uses the 1-D glorot fan
    (fan_in=fan_out=V), cols 1..K the 2-D fan."""
    w = glorot_normal_init(rng_w, (feature_size,))
    v = glorot_normal_init(rng_v, (feature_size, k))
    return jnp.concatenate([w[:, None], v], axis=1)


def fused_linear_lookup(table, ids, vals, lookup: LookupFn = dense_lookup):
    """(y_linear [B], scaled emb [B,F,K]) from one gather of a fused
    [V,1+K] table. y_linear = Σ_f w[id_f]·val_f; emb = V[id]·val."""
    rows = lookup(table, ids)  # [B,F,1+K]
    y_lin = jnp.sum(rows[..., 0] * vals, axis=1)
    emb = rows[..., 1:] * vals[..., None]
    return y_lin, emb


def pad_vocab(feature_size: int, num_shards: int) -> int:
    """Smallest padded vocab divisible by num_shards (and 8-row aligned)."""
    align = num_shards * 8
    return ((feature_size + align - 1) // align) * align


def get_lookup(model_axis: Optional[str]) -> LookupFn:
    return dense_lookup if model_axis is None else make_sharded_lookup(model_axis)
