"""Golden math tests for the DIN attention unit and ESMM joint loss —
numpy re-derivations of the reference semantics (DIN.py:152-173,
DeepCvrMTL.py:205-223)."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch
from tf_repos_tpu.models import create_model
from tf_repos_tpu.ops import towers as T


def _np_mlp(params, x):
    for lp in params["layers"]:
        x = np.maximum(x @ np.asarray(lp["dense"]["w"]) + np.asarray(lp["dense"]["b"]), 0.0)
    return x


def test_din_attention_unit_golden():
    cfg = Config(
        model="din", feature_size=500, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", attention_layers="6",
        multi_hot_pad=5,
    )
    model = create_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b, p, k = 3, 5, 4
    demb = rng.normal(size=(b, p, k)).astype(np.float32)
    mask = (rng.random((b, p)) > 0.4).astype(np.float32)
    a_emb = rng.normal(size=(b, k)).astype(np.float32)

    pooled, _ = model._attention_unit(
        params, {"att_mlp": state["att_mlp"]}, jnp.asarray(demb),
        jnp.asarray(mask), jnp.asarray(a_emb), train=False, rng=None,
    )

    # numpy re-derivation: per item x = [u, u-a, a] -> MLP -> dense ->
    # sigmoid weight -> masked weighted sum over the behavior axis
    ub = demb.reshape(b * p, k)
    ax = np.repeat(a_emb[:, None, :], p, axis=1).reshape(b * p, k)
    x = np.concatenate([ub, ub - ax, ax], axis=1)
    h = _np_mlp(params["att_mlp"], x)
    logits = h @ np.asarray(params["att_out"]["w"]) + np.asarray(params["att_out"]["b"])
    wgt = 1.0 / (1.0 + np.exp(-logits)).reshape(b, p, 1)
    want = np.sum(demb * wgt * mask[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(pooled), want, rtol=1e-5, atol=1e-6)


def test_din_plain_pooling_branch():
    """--attention_pooling=False falls back to the masked weighted
    sum-pool (DIN.py:179-183) and drops the attention params."""
    cfg = Config(
        model="din", feature_size=300, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", attention_pooling=False,
        multi_hot_pad=4,
    )
    model = create_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "att_mlp" not in params
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_aliccp_batch(
            np.random.default_rng(0), 8, 300, 11, 4
        ).items()
    }
    out, _ = model.apply(params, state, batch, train=False)
    assert out["prob"].shape == (8,)
    assert np.all(np.isfinite(np.asarray(out["prob"])))


def test_esmm_joint_loss_golden():
    """loss == w*CE(ctr) + (1-w)*log_loss(pctcvr;z) + l2*0.5*||emb||^2
    with eps-clipped probabilities (DeepCvrMTL.py:219-223)."""
    cfg = Config(
        model="esmm", feature_size=300, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", ctr_task_wgt=0.3,
        l2_reg=0.01, multi_hot_pad=4,
    )
    model = create_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_aliccp_batch(
            np.random.default_rng(1), 16, 300, 11, 4
        ).items()
    }
    loss, (out, _) = model.loss(params, state, batch, train=False)

    y = np.asarray(batch["y"]); z = np.asarray(batch["z"])
    logits = np.asarray(out["logits"])
    ctr_per = np.maximum(logits, 0) - logits * y + np.log1p(np.exp(-np.abs(logits)))
    eps = 1e-7
    p = np.clip(np.asarray(out["pctcvr"]), eps, 1 - eps)
    cvr_per = -(z * np.log(p) + (1 - z) * np.log(1 - p))
    l2 = 0.01 * 0.5 * float(np.sum(np.asarray(params["emb"]) ** 2))
    want = 0.3 * ctr_per.mean() + 0.7 * cvr_per.mean() + l2
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    # pctcvr must equal pctr * pcvr (the ESMM identity, DeepCvrMTL.py:205)
    np.testing.assert_allclose(
        np.asarray(out["pctcvr"]),
        np.asarray(out["pctr"]) * np.asarray(out["pcvr"]),
        rtol=1e-6,
    )


def test_deepfm_auc_lift_on_planted_data():
    """Convergence sanity: training on the planted logistic structure
    lifts eval AUC well above chance (the metric-based acceptance the
    reference relies on, SURVEY.md §4)."""
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
    from tf_repos_tpu.ops import metrics as M
    from tf_repos_tpu.train.loop import build_train_step
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(
        model="DeepFM", feature_size=2000, field_size=39, embedding_size=8,
        deep_layers="32,16", dropout="1.0,1.0", batch_size=256,
        learning_rate=0.02, l2_reg=0.0,
    )
    model = create_model(cfg)
    tx = make_optimizer("Adam", cfg.learning_rate)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = tx.init(params)
    step = build_train_step(model, tx)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for i in range(60):
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_criteo_batch(rng, cfg.batch_size, cfg.feature_size).items()
        }
        params, opt, state, loss = step(params, opt, state, batch, key)
    test_batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_criteo_batch(
            np.random.default_rng(99), 2048, cfg.feature_size
        ).items()
    }
    out, _ = model.apply(params, state, test_batch, train=False)
    auc = float(M.exact_auc(test_batch["label"], out["prob"]))
    assert auc > 0.62, f"AUC {auc} did not lift above chance"
