"""Optimizer parity vs hand-computed TF-semantics updates
(reference switch: DeepFM.py:204-211)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.train.optimizers import make_optimizer


def run_steps(tx, grads_seq, w0):
    w = {"w": jnp.asarray(w0)}
    state = tx.init(w)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, w)
        w = jax.tree.map(lambda p, u: p + u, w, updates)
    return np.asarray(w["w"])


def test_adagrad_matches_tf_formula():
    lr, init_acc = 0.1, 1e-8
    w0 = np.array([1.0, -2.0], np.float32)
    gs = [np.array([0.5, 0.1], np.float32), np.array([-0.2, 0.3], np.float32)]
    got = run_steps(make_optimizer("Adagrad", lr), gs, w0)
    w, acc = w0.copy(), np.full_like(w0, init_acc)
    for g in gs:
        acc = acc + g * g
        w = w - lr * g / np.sqrt(acc)
    np.testing.assert_allclose(got, w, rtol=1e-5)


def test_momentum_matches_tf_formula():
    lr, mom = 0.1, 0.95
    w0 = np.array([1.0, -2.0], np.float32)
    gs = [np.array([0.5, 0.1], np.float32)] * 3
    got = run_steps(make_optimizer("Momentum", lr), gs, w0)
    w, v = w0.copy(), np.zeros_like(w0)
    for g in gs:
        v = mom * v + g
        w = w - lr * v
    np.testing.assert_allclose(got, w, rtol=1e-5)


def test_ftrl_matches_tf_formula():
    lr = 0.1
    w0 = np.zeros(2, np.float32)
    gs = [np.array([0.5, -0.3], np.float32), np.array([0.2, 0.4], np.float32)]
    got = run_steps(make_optimizer("ftrl", lr), gs, w0)
    # FTRL-Proximal with l1=l2=0, power=-0.5, init_acc=0.1
    w, n, z = w0.copy(), np.full_like(w0, 0.1), np.zeros_like(w0)
    for g in gs:
        n_new = n + g * g
        sigma = (np.sqrt(n_new) - np.sqrt(n)) / lr
        z = z + g - sigma * w
        n = n_new
        w = -z / (np.sqrt(n) / lr)
    np.testing.assert_allclose(got, w, rtol=1e-4, atol=1e-7)


def test_adam_converges_on_quadratic():
    tx = make_optimizer("Adam", 0.1)
    w = {"w": jnp.array([5.0])}
    state = tx.init(w)
    for _ in range(200):
        g = jax.tree.map(lambda p: 2 * p, w)
        updates, state = tx.update(g, state, w)
        w = jax.tree.map(lambda p, u: p + u, w, updates)
    assert abs(float(w["w"][0])) < 1e-2


def test_gd_is_plain_sgd():
    got = run_steps(make_optimizer("GD", 0.5), [np.array([1.0], np.float32)], np.array([2.0], np.float32))
    np.testing.assert_allclose(got, [1.5])


def test_unknown_raises():
    with pytest.raises(ValueError):
        make_optimizer("bogus", 0.1)


def test_wdl_composite_per_part_updates():
    """--optimizer=wdl: wide params step with FTRL, deep with Adagrad, at
    the CANNED learning rates (the reference's learning_rate flag is
    commented out, wide_n_deep.py:37, so TF1's canned-estimator formulas
    applied — canned_wdl_rates; the lr argument must be IGNORED)."""
    import jax
    import jax.numpy as jnp

    from tf_repos_tpu.train.optimizers import (
        adagrad_tf,
        canned_wdl_rates,
        ftrl,
        make_optimizer,
    )

    params = {
        "wide_cat": jnp.ones((4,)),
        "emb": jnp.ones((4, 2)),
        "bias": jnp.zeros((1,)),
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    for model_type in ("wide", "wide_n_deep"):
        wide_lr, deep_lr = canned_wdl_rates(model_type)
        tx = make_optimizer("wdl", 999.0, model_type)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)

        ftrl_tx = ftrl(wide_lr)
        fs = ftrl_tx.init({"w": params["wide_cat"]})
        fupd, _ = ftrl_tx.update({"w": grads["wide_cat"]}, fs, {"w": params["wide_cat"]})
        np.testing.assert_allclose(
            np.asarray(upd["wide_cat"]), np.asarray(fupd["w"]), rtol=1e-6
        )

        ag = adagrad_tf(deep_lr, 0.1)
        as_ = ag.init({"e": params["emb"]})
        aupd, _ = ag.update({"e": grads["emb"]}, as_, {"e": params["emb"]})
        np.testing.assert_allclose(
            np.asarray(upd["emb"]), np.asarray(aupd["e"]), rtol=1e-6
        )


def test_canned_wdl_rates_formulas():
    import math

    from tf_repos_tpu.train.optimizers import canned_wdl_rates

    root39 = 1.0 / math.sqrt(39)
    assert canned_wdl_rates("wide") == (min(0.2, root39), 0.05)
    assert canned_wdl_rates("deep") == (min(0.2, root39), 0.05)
    assert canned_wdl_rates("wide_n_deep") == (0.005, 0.001)


def test_wdl_lr_warning_default_silent():
    """ADVICE r4: optimizer=wdl silently ignores --learning_rate. A
    non-default rate must warn (the user tuned a knob with no effect);
    the Config default must stay silent. Also pins _DEFAULT_CLI_LR to
    the real Config default (drift check)."""
    import dataclasses
    import warnings

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.optimizers import _DEFAULT_CLI_LR, make_optimizer

    default_lr = next(
        f.default for f in dataclasses.fields(Config) if f.name == "learning_rate"
    )
    assert _DEFAULT_CLI_LR == default_lr

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_optimizer("wdl", default_lr, "wide_n_deep")  # silent

    with pytest.warns(UserWarning, match="ignores --learning_rate"):
        make_optimizer("wdl", 0.01, "wide_n_deep")
