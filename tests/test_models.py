"""Per-model unit tests: shapes, finite loss/grads, golden math checks —
the unit layer the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
from tf_repos_tpu.models import create_model, model_names
from tf_repos_tpu.ops import interactions as I

LIBSVM_MODELS = ["LR", "DeepFM", "FNN", "IPNN", "OPNN", "NFM", "AFM", "DCN", "DeepMVM"]


def make_batch(cfg: Config, n=16, seed=0):
    rng = np.random.default_rng(seed)
    batch = synthetic_criteo_batch(
        rng, n, feature_size=cfg.feature_size, num_continuous=5, num_categorical=8
    )
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture
def cfg(tiny_cfg):
    return tiny_cfg


@pytest.mark.parametrize("name", LIBSVM_MODELS)
def test_forward_shapes_and_loss(name, cfg):
    model = create_model(cfg.replace(model=name))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    out, _ = model.apply(params, state, batch, train=False)
    assert out["logits"].shape == (16,)
    assert out["prob"].shape == (16,)
    assert np.all(np.isfinite(out["prob"]))
    assert np.all((np.asarray(out["prob"]) >= 0) & (np.asarray(out["prob"]) <= 1))
    loss, _ = model.loss(params, state, batch, train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("name", LIBSVM_MODELS)
def test_grads_finite_and_nonzero(name, cfg):
    model = create_model(cfg.replace(model=name))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    grads = jax.grad(
        lambda p: model.loss(p, state, batch, train=True, rng=jax.random.PRNGKey(1))[0]
    )(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)


def test_train_reduces_loss(cfg):
    import optax

    from tf_repos_tpu.train.loop import build_train_step
    from tf_repos_tpu.train.optimizers import make_optimizer

    model = create_model(cfg.replace(model="DeepFM", learning_rate=0.05))
    tx = make_optimizer("Adam", 0.05)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    step = build_train_step(model, tx)
    batch = make_batch(cfg, n=64)
    first = None
    rng = jax.random.PRNGKey(2)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt_state, state, loss = step(params, opt_state, state, batch, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.9


def test_batch_norm_path(cfg):
    cfg = cfg.replace(model="DeepFM", batch_norm=True)
    model = create_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    out, new_state = model.apply(
        params, state, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    # moving stats must move in train mode
    before = state["mlp"]["layers"][0]["bn"]["mean"]
    after = new_state["mlp"]["layers"][0]["bn"]["mean"]
    assert float(jnp.sum(jnp.abs(after - before))) > 0
    # and stay fixed in eval mode
    out2, eval_state = model.apply(params, new_state, batch, train=False)
    same = eval_state["mlp"]["layers"][0]["bn"]["mean"]
    np.testing.assert_array_equal(np.asarray(after), np.asarray(same))


# ---------------------------------------------------------------- golden math
def test_fm_second_order_golden():
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(4, 5, 3)).astype(np.float32))
    got = I.fm_second_order(emb)
    # brute force: sum over i<j of <e_i, e_j>
    e = np.asarray(emb)
    want = np.zeros(4, np.float32)
    for i in range(5):
        for j in range(i + 1, 5):
            want += np.sum(e[:, i] * e[:, j], axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_bi_interaction_is_vector_form_of_fm():
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(4, 5, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(I.bi_interaction(emb), axis=1)),
        np.asarray(I.fm_second_order(emb)),
        rtol=1e-5,
    )


def test_pairwise_inner_golden():
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 3)).astype(np.float32))
    got = np.asarray(I.pairwise_inner(emb))
    e = np.asarray(emb)
    want = []
    for i in range(3):
        for j in range(i + 1, 4):
            want.append(np.sum(e[:, i] * e[:, j], axis=1))
    np.testing.assert_allclose(got, np.stack(want, axis=1), rtol=1e-5)


def test_pairwise_outer_matches_reference_einsum():
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 3)).astype(np.float32))
    got = np.asarray(I.pairwise_outer(emb))  # [B, P*K*K]
    e = np.asarray(emb)
    row, col = np.triu_indices(4, k=1)
    want = np.einsum("api,apj->apij", e[:, row], e[:, col]).reshape(2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_network_golden():
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(3, 6)).astype(np.float32)
    w = rng.normal(size=(2, 6)).astype(np.float32)
    b = rng.normal(size=(2, 6)).astype(np.float32)
    got = np.asarray(I.cross_network(jnp.asarray(x0), jnp.asarray(w), jnp.asarray(b)))
    xl = x0
    for layer in range(2):
        xlw = (xl * w[layer]).sum(axis=1, keepdims=True)
        xl = x0 * xlw + xl + b[layer]
    np.testing.assert_allclose(got, xl, rtol=1e-5)


def test_mvm_golden():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(2, 3, 4)).astype(np.float32)
    fb = rng.normal(size=(3, 4)).astype(np.float32)
    got = np.asarray(I.mvm(jnp.asarray(emb), jnp.asarray(fb)))
    a = emb + fb[None]
    want = a[:, 0] * a[:, 1] * a[:, 2]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_registry_complete():
    names = model_names()
    for expected in ["lr", "deepfm", "fnn", "ipnn", "opnn", "nfm", "afm", "dcn",
                     "deepmvm", "din", "esmm", "wide", "deep", "wide_n_deep"]:
        assert expected in names


def test_deepfm_static_fields_exact():
    """--static_fields N: slicing the constant-id rows must produce
    EXACTLY the same outputs and gradients as the plain gather, given the
    Criteo preprocessor layout (ids[:, :N] == 1..N)."""
    import jax

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.models import create_model

    base = dict(
        model="DeepFM", feature_size=200, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=8, l2_reg=0.01,
    )
    rng = np.random.default_rng(0)
    ids = np.zeros((8, 39), np.int32)
    ids[:, :13] = np.arange(1, 14)
    ids[:, 13:] = rng.integers(14, 200, size=(8, 26))
    vals = np.ones((8, 39), np.float32)
    vals[:, :13] = rng.random((8, 13), dtype=np.float32)
    batch = {
        "feat_ids": ids, "feat_vals": vals,
        "label": (rng.random(8) < 0.5).astype(np.float32),
        "mask": np.ones((8,), np.float32),
    }

    outs, grads = [], []
    for sf in (0, 13):
        m = create_model(Config(**base, static_fields=sf))
        params, mstate = m.init(jax.random.PRNGKey(0))
        out, _ = m.apply(params, mstate, batch, train=False)
        loss_fn = lambda p: m.loss(p, mstate, batch, train=False)[0]
        g = jax.grad(loss_fn)(params)
        outs.append(np.asarray(out["logits"]))
        grads.append(np.asarray(g["fm_wv"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-7)
