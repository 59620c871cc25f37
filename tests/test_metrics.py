"""AUC / loss metrics vs sklearn ground truth (SURVEY.md §4: metric tests
on synthetic data are part of closing the reference's zero-test gap)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import log_loss as sk_log_loss
from sklearn.metrics import roc_auc_score

from tf_repos_tpu.ops import metrics as M


@pytest.fixture
def labeled_preds(rng):
    n = 4000
    labels = (rng.random(n) < 0.3).astype(np.float32)
    # correlated predictions so AUC is informative
    preds = np.clip(
        0.3 * labels + 0.5 * rng.random(n).astype(np.float32), 1e-4, 1 - 1e-4
    ).astype(np.float32)
    return labels, preds


def test_streaming_auc_matches_sklearn(labeled_preds):
    labels, preds = labeled_preds
    state = M.AucState.init()
    for i in range(0, len(labels), 256):
        state = M.auc_update(state, jnp.array(labels[i : i + 256]), jnp.array(preds[i : i + 256]))
    got = float(M.auc_finalize(state))
    want = roc_auc_score(labels, preds)
    # 200-bucket Riemann approximation: same tolerance class as tf.metrics.auc
    assert abs(got - want) < 0.005


def test_streaming_auc_respects_weights(labeled_preds):
    labels, preds = labeled_preds
    state = M.AucState.init()
    w = np.zeros_like(preds)
    w[: len(w) // 2] = 1.0
    state = M.auc_update(state, jnp.array(labels), jnp.array(preds), jnp.array(w))
    got = float(M.auc_finalize(state))
    want = roc_auc_score(labels[: len(w) // 2], preds[: len(w) // 2])
    assert abs(got - want) < 0.005


def test_exact_auc_matches_sklearn(labeled_preds):
    labels, preds = labeled_preds
    got = float(M.exact_auc(jnp.array(labels), jnp.array(preds)))
    want = roc_auc_score(labels, preds)
    assert abs(got - want) < 1e-5


def test_exact_auc_with_ties(rng):
    labels = (rng.random(1000) < 0.5).astype(np.float32)
    preds = np.round(rng.random(1000).astype(np.float32), 1)  # heavy ties
    got = float(M.exact_auc(jnp.array(labels), jnp.array(preds)))
    want = roc_auc_score(labels, preds)
    assert abs(got - want) < 1e-5


def test_exact_auc_weighted_matches_sklearn(rng):
    """Regression: weighted ranks must be cumulative WEIGHT, not index —
    zero-weight (padding) rows must occupy no rank mass (VERDICT r1 §weak 5)."""
    n = 800
    labels = (rng.random(n) < 0.3).astype(np.float32)
    preds = np.round(rng.random(n).astype(np.float32), 2)  # ties too
    # binary mask weights (batch padding)
    mask = (rng.random(n) < 0.7).astype(np.float32)
    got = float(M.exact_auc(jnp.array(labels), jnp.array(preds), jnp.array(mask)))
    want = roc_auc_score(labels[mask > 0], preds[mask > 0])
    assert abs(got - want) < 1e-5
    # general fractional weights
    w = rng.choice([0.0, 0.5, 1.0, 2.0], size=n).astype(np.float32)
    got = float(M.exact_auc(jnp.array(labels), jnp.array(preds), jnp.array(w)))
    want = roc_auc_score(labels[w > 0], preds[w > 0], sample_weight=w[w > 0])
    assert abs(got - want) < 1e-5


def test_log_loss_matches_sklearn(labeled_preds):
    labels, preds = labeled_preds
    got = float(M.log_loss(jnp.array(labels), jnp.array(preds)))
    want = sk_log_loss(labels, preds, labels=[0.0, 1.0])
    assert abs(got - want) < 1e-5


def test_sigmoid_xent_stable():
    logits = jnp.array([-100.0, 0.0, 100.0])
    labels = jnp.array([0.0, 1.0, 1.0])
    out = M.sigmoid_xent(logits, labels)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[1], np.log(2.0), rtol=1e-6)
