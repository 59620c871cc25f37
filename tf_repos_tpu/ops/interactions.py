"""Feature-interaction primitives — the distinctive math of each CTR model,
re-derived as pure JAX functions with TPU-friendly (static-shape, MXU/VPU
mappable) formulations.

Each function cites the reference code whose behavior it reproduces.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scaled_embeddings(table: jax.Array, ids: jax.Array, vals: jax.Array) -> jax.Array:
    """emb[b,f,:] = table[ids[b,f]] * vals[b,f] — the shared v_ij*x_i step
    (DeepFM.py:130-132). table:[V,K], ids:[B,F], vals:[B,F] -> [B,F,K]."""
    return table[ids] * vals[..., None]


def first_order(weights: jax.Array, ids: jax.Array, vals: jax.Array) -> jax.Array:
    """y_w[b] = sum_f w[ids[b,f]] * vals[b,f] (DeepFM.py:125-127)."""
    return jnp.sum(weights[ids] * vals, axis=1)


def fm_second_order(emb: jax.Array) -> jax.Array:
    """0.5 * sum_k((sum_f emb)^2 - sum_f emb^2) — the FM sum-square trick
    (DeepFM.py:129-135). emb:[B,F,K] -> [B]."""
    sum_sq = jnp.square(jnp.sum(emb, axis=1))
    sq_sum = jnp.sum(jnp.square(emb), axis=1)
    return 0.5 * jnp.sum(sum_sq - sq_sum, axis=1)


def bi_interaction(emb: jax.Array) -> jax.Array:
    """NFM Bi-Interaction pooling: the same trick but kept as a K-vector
    (NFM.py:122-128). emb:[B,F,K] -> [B,K]."""
    sum_sq = jnp.square(jnp.sum(emb, axis=1))
    sq_sum = jnp.sum(jnp.square(emb), axis=1)
    return 0.5 * (sum_sq - sq_sum)


def _pair_indices(field_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (i<j) field index pairs (PNN.py:143-149)."""
    row, col = np.triu_indices(field_size, k=1)
    return row.astype(np.int32), col.astype(np.int32)


def pairwise_inner(emb: jax.Array) -> jax.Array:
    """IPNN: inner products of all F(F-1)/2 embedding pairs
    (PNN.py:141-153). emb:[B,F,K] -> [B,P].

    Computed as the strict upper triangle of the field Gram matrix
    G = emb @ emb^T — one [B,F,K]x[B,K,F] batched matmul on the MXU instead
    of the reference's gather-and-multiply."""
    gram = jnp.einsum("bik,bjk->bij", emb, emb)
    row, col = _pair_indices(emb.shape[1])
    return gram[:, row, col]


def pairwise_outer(emb: jax.Array) -> jax.Array:
    """OPNN: outer products per pair, flattened (PNN.py:154-167, einsum
    'api,apj->apij'). emb:[B,F,K] -> [B, P*K*K]."""
    row, col = _pair_indices(emb.shape[1])
    p = emb[:, row, :]
    q = emb[:, col, :]
    outer = jnp.einsum("bpi,bpj->bpij", p, q)
    b = emb.shape[0]
    return outer.reshape(b, -1)


def pairwise_elementwise(emb: jax.Array) -> jax.Array:
    """AFM: element-wise products of all pairs (AFM.py:127-139).
    emb:[B,F,K] -> [B,P,K]."""
    row, col = _pair_indices(emb.shape[1])
    return emb[:, row, :] * emb[:, col, :]


def cross_network(x0: jax.Array, cross_w: jax.Array, cross_b: jax.Array) -> jax.Array:
    """DCN cross layers: x_{l+1} = x0 * (x_l . w_l) + x_l + b_l
    (DCN.py:140-145). x0:[B,D], cross_w/cross_b:[L,D] -> [B,D]."""

    def layer(xl, wb):
        w, b = wb
        xlw = jnp.sum(xl * w, axis=1, keepdims=True)  # [B,1]
        return x0 * xlw + xl + b, None

    out, _ = jax.lax.scan(layer, x0, (cross_w, cross_b))
    return out


def mvm(emb: jax.Array, field_bias: jax.Array) -> jax.Array:
    """DeepMVM multi-view machine: element-wise product over ALL fields of
    (emb + per-field bias) (DeepMVM.py:144-150). emb:[B,F,K],
    field_bias:[F,K] -> [B,K]."""
    return jnp.prod(emb + field_bias[None], axis=1)


def attention_pool(
    interactions: jax.Array, att_logits: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """AFM attention-weighted pooling (AFM.py:141-162): softmax the per-pair
    logits over the pair axis, weight the interactions, sum-pool.
    interactions:[B,P,K], att_logits:[B,P,1] -> (pooled [B,K], weights)."""
    aij = jax.nn.softmax(att_logits, axis=1)
    return jnp.sum(aij * interactions, axis=1), aij


def masked_weighted_sum(
    emb: jax.Array, mask: jax.Array, weights: jax.Array | None = None
) -> jax.Array:
    """Sum-combiner over a padded multi-hot axis — the static-shape TPU
    equivalent of tf.nn.embedding_lookup_sparse(combiner='sum')
    (DeepCvrMTL.py:155-159). emb:[B,P,K], mask:[B,P] (1 where id>0,
    DIN.py:157 convention), weights optional [B,P] -> [B,K]."""
    w = mask if weights is None else mask * weights
    return jnp.einsum("bpk,bp->bk", emb, w)
