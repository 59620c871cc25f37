"""Mesh-sharded execution tests on the 8-virtual-CPU-device rig
(conftest.py) — the JAX analog of the reference's localhost cluster
simulation (run_dist.sh, dist_mode=1; SURVEY.md §4 item 3).

The key invariant: the shard_map step over a data×model mesh computes the
SAME loss/params/metrics as the single-device jitted step (sync SPMD is
deterministic, unlike the reference's async parameter-server training).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
from tf_repos_tpu.models import create_model
from tf_repos_tpu.parallel import step as S
from tf_repos_tpu.parallel.mesh import make_mesh
from tf_repos_tpu.train import loop as L
from tf_repos_tpu.train.optimizers import make_optimizer


def _cfg(**kw) -> Config:
    base = dict(
        model="DeepFM",
        feature_size=1000,
        field_size=39,
        embedding_size=8,
        deep_layers="16,8",
        dropout="1.0,1.0",  # no dropout: exact single-vs-sharded equality
        batch_size=64,
        learning_rate=0.01,
        l2_reg=0.001,
        optimizer="Adam",
    )
    base.update(kw)
    return Config(**base)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return synthetic_criteo_batch(rng, cfg.batch_size, cfg.feature_size)


def _train_n_steps_single(cfg, model, batches):
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
    opt_state = tx.init(params)
    step = L.build_train_step(model, tx)
    rng = jax.random.PRNGKey(123)
    losses = []
    for b in batches:
        params, opt_state, mstate, loss = step(params, opt_state, mstate, b, rng)
        losses.append(float(loss))
    return params, losses


def _train_n_steps_sharded(cfg, model, batches, mesh):
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    ss = S.ShardedState(model, tx, mesh)
    state, specs = ss.init(jax.random.PRNGKey(cfg.seed))
    step = S.build_sharded_train_step(model, tx, mesh, specs)
    rng = jax.random.PRNGKey(123)
    losses = []
    for b in batches:
        state, loss = step(state, ss.place_batch(b), rng)
        losses.append(float(loss))
    return state, specs, losses


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("model_name", ["DeepFM", "dcn"])
def test_sharded_matches_single(model_name, mesh_shape):
    # SGD for exact param equality: Adam's rsqrt amplifies float
    # reduction-order noise on near-eps gradients (rows touched once).
    cfg = _cfg(model=model_name, optimizer="GD", learning_rate=0.1)
    model = create_model(cfg)
    batches = [_batch(cfg, seed=s) for s in range(3)]

    ref_params, ref_losses = _train_n_steps_single(cfg, model, batches)
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    state, specs, sh_losses = _train_n_steps_sharded(cfg, model, batches, mesh)

    np.testing.assert_allclose(ref_losses, sh_losses, rtol=2e-4, atol=2e-5)

    # compare a sharded table (trim padding) and a replicated dense param
    key = "fm_wv" if model_name == "DeepFM" else "emb"
    fm_v = np.asarray(state["params"][key])
    ref_v = np.asarray(ref_params[key])
    np.testing.assert_allclose(fm_v[: ref_v.shape[0]], ref_v, rtol=2e-3, atol=2e-5)
    # padded rows must stay exactly zero under the optimizer
    assert np.all(fm_v[ref_v.shape[0] :] == 0.0)


def test_sharded_adam_loss_trace_matches():
    cfg = _cfg(optimizer="Adam")
    model = create_model(cfg)
    batches = [_batch(cfg, seed=s) for s in range(4)]
    _, ref_losses = _train_n_steps_single(cfg, model, batches)
    mesh = make_mesh(data=2, model=4)
    _, _, sh_losses = _train_n_steps_sharded(cfg, model, batches, mesh)
    np.testing.assert_allclose(ref_losses, sh_losses, rtol=5e-4, atol=5e-5)


def test_sharded_eval_matches_single():
    cfg = _cfg()
    model = create_model(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    batches = [_batch(cfg, seed=s) for s in range(3)]

    # single-device streaming eval
    estep = L.build_eval_step(model)
    acc = L.init_eval_acc(model)
    for b in batches:
        acc = estep(params, mstate, acc, b)
    ref = L.finalize_eval(acc)

    # sharded eval on a 4x2 mesh with padded params
    mesh = make_mesh(data=4, model=2)
    pspec = S._spec_tree_like(params, model.param_spec())
    padded = S.pad_params_for_mesh(params, pspec, 2)
    padded = jax.device_put(padded, S.make_shardings(mesh, pspec))
    specs = {"params": pspec, "mstate": jax.tree.map(lambda _: jax.sharding.PartitionSpec(), mstate)}
    estep_sh = S.build_sharded_eval_step(model, mesh, specs)
    acc = L.init_eval_acc(model)
    for b in batches:
        acc = estep_sh(padded, mstate, acc, b)
    got = L.finalize_eval(acc)

    for k in ref:
        np.testing.assert_allclose(ref[k], got[k], rtol=1e-4, atol=1e-5)


def test_sharded_predict_matches_single():
    cfg = _cfg()
    model = create_model(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    b = _batch(cfg)

    ref = np.asarray(L.build_predict_step(model)(params, mstate, b)["prob"])

    mesh = make_mesh(data=2, model=4)
    pspec = S._spec_tree_like(params, model.param_spec())
    padded = S.pad_params_for_mesh(params, pspec, 4)
    padded = jax.device_put(padded, S.make_shardings(mesh, pspec))
    specs = {"params": pspec, "mstate": jax.tree.map(lambda _: jax.sharding.PartitionSpec(), mstate)}
    got = np.asarray(S.build_sharded_predict_step(model, mesh, specs)(padded, mstate, b)["prob"])
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model_name", ["esmm", "din"])
def test_multihot_models_sharded_step(model_name):
    """DIN/ESMM on a mesh: padded multi-hot lookups through the sharded
    psum lookup match the single-device step (value check vs loss())."""
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch

    cfg = _cfg(model=model_name, field_size=11, multi_hot_pad=8)
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    b = synthetic_aliccp_batch(rng, cfg.batch_size, cfg.feature_size, cfg.field_size, cfg.multi_hot_pad)

    ref_params, ref_losses = _train_n_steps_single(cfg, model, [b])
    mesh = make_mesh(data=4, model=2)
    state, specs, losses = _train_n_steps_sharded(cfg, model, [b], mesh)
    np.testing.assert_allclose(ref_losses, losses, rtol=2e-4, atol=2e-5)


def test_batch_norm_under_mesh():
    """BN on the sharded path: per-shard batch stats are pmean'd over the
    data axis so the carried state stays replicated (sync-BN-lite); the
    step must run, produce finite loss, and move the moving stats."""
    cfg = _cfg(model="DeepFM", batch_norm=True, dropout="0.8,0.8", optimizer="Adam")
    model = create_model(cfg)
    mesh = make_mesh(data=4, model=2)
    batches = [_batch(cfg, seed=s) for s in range(2)]
    state, specs, losses = _train_n_steps_sharded(cfg, model, batches, mesh)
    assert all(np.isfinite(l) for l in losses)
    mean0 = np.asarray(state["mstate"]["mlp"]["layers"][0]["bn"]["mean"])
    assert np.abs(mean0).sum() > 0  # moving stats moved off init
