"""Evaluation metrics: streaming AUC with tf.metrics.auc semantics, exact
(rank-based) AUC, and mean log-loss.

The reference evaluates with tf.metrics.auc (DeepFM.py:193-195), a
200-threshold Riemann/trapezoid approximation of the ROC curve. For parity
claims the same thresholded accumulation is reproduced here (AucState);
exact_auc is the Mann-Whitney statistic used by tests to validate against
sklearn and by the harness when exact numbers are preferred.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

NUM_THRESHOLDS = 200  # tf.metrics.auc default
_KEPS = 1e-7


def _thresholds() -> jnp.ndarray:
    """[-eps, 1/199, 2/199, ..., 198/199, 1+eps] — tf.metrics.auc layout."""
    inner = jnp.arange(1, NUM_THRESHOLDS - 1, dtype=jnp.float32) / (NUM_THRESHOLDS - 1)
    return jnp.concatenate(
        [jnp.array([-_KEPS], jnp.float32), inner, jnp.array([1.0 + _KEPS], jnp.float32)]
    )


class AucState(NamedTuple):
    """Confusion-matrix counts per threshold. Accumulated on device."""

    tp: jnp.ndarray  # [T]
    fp: jnp.ndarray
    tn: jnp.ndarray
    fn: jnp.ndarray

    @classmethod
    def init(cls) -> "AucState":
        # four distinct buffers: the eval step donates its accumulator, and
        # aliased buffers cannot be donated twice
        return cls(*(jnp.zeros((NUM_THRESHOLDS,), jnp.float32) for _ in range(4)))


def auc_update(
    state: AucState,
    labels: jax.Array,
    preds: jax.Array,
    weights: Optional[jax.Array] = None,
) -> AucState:
    """Accumulate one batch. labels/preds/weights: [B]."""
    if weights is None:
        weights = jnp.ones_like(preds)
    t = _thresholds()  # [T]
    above = (preds[:, None] > t[None, :]).astype(jnp.float32)  # [B,T]
    pos = (labels * weights)[:, None]
    neg = ((1.0 - labels) * weights)[:, None]
    return AucState(
        tp=state.tp + jnp.sum(above * pos, axis=0),
        fp=state.fp + jnp.sum(above * neg, axis=0),
        tn=state.tn + jnp.sum((1.0 - above) * neg, axis=0),
        fn=state.fn + jnp.sum((1.0 - above) * pos, axis=0),
    )


def auc_finalize(state: AucState) -> jnp.ndarray:
    """Trapezoidal ROC-AUC over the accumulated counts (thresholds are
    ascending, so FPR/TPR are descending in index)."""
    eps = 1e-7
    tpr = state.tp / (state.tp + state.fn + eps)
    fpr = state.fp / (state.fp + state.tn + eps)
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) * 0.5)


def exact_auc(
    labels: jax.Array, preds: jax.Array, weights: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Exact ROC-AUC (weighted Mann-Whitney U with tie correction), O(n log n).

    Ranks are cumulative WEIGHTS, not indices, so zero-weight rows (batch
    padding masks) occupy no rank mass:

        U = sum_{i in pos} w_i * r_i - (W_pos^2 + sum_{i in pos} w_i^2) / 2
        r_i = A_i + (E_i + w_i) / 2

    with A_i the total weight strictly below p_i and E_i the total weight
    tied at p_i (self included). For unit weights this reduces to the
    classic midrank formula U = sum(rank) - n_pos(n_pos+1)/2; validated
    against sklearn's sample_weight AUC in tests.
    """
    if weights is None:
        weights = jnp.ones_like(preds)
    order = jnp.argsort(preds)
    p = preds[order]
    w = weights[order].astype(jnp.float32)
    y = labels[order].astype(jnp.float32)
    n = p.shape[0]
    is_new = jnp.concatenate([jnp.array([True]), p[1:] != p[:-1]])
    grp = jnp.cumsum(is_new) - 1
    grp_w = jax.ops.segment_sum(w, grp, num_segments=n)  # E per group
    cum_grp_w = jnp.cumsum(grp_w)
    below = cum_grp_w - grp_w  # A per group: weight strictly below
    r = below[grp] + (grp_w[grp] + w) / 2.0
    wpos = w * y
    W_pos = jnp.sum(wpos)
    W_neg = jnp.sum(w) - W_pos
    U = jnp.sum(wpos * r) - (W_pos * W_pos + jnp.sum(wpos * wpos)) / 2.0
    return U / (W_pos * W_neg + 1e-12)


def log_loss(
    labels: jax.Array, preds: jax.Array, weights: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities (tf.losses.log_loss
    semantics, eps-clipped; used for the ESMM CVR head, DeepCvrMTL.py:224)."""
    eps = 1e-7
    p = jnp.clip(preds, eps, 1.0 - eps)
    ll = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    if weights is None:
        return jnp.mean(ll)
    return jnp.sum(ll * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def sigmoid_xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """tf.nn.sigmoid_cross_entropy_with_logits, numerically stable."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def squared_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """The reference's square_loss option on the sigmoid output."""
    return jnp.square(jax.nn.sigmoid(logits) - labels)
