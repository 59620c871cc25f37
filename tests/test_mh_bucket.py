"""--mh_bucket: host-side live-width slicing of the padded multi-hot
fields (data/sparse_batch.MhPadBucketer).

The reader pads every multi-hot field to the static --multi_hot_pad, and
the device cost downstream — the [B, pad, K] embedding expand, DIN's
attention MLP over [B, pad, 3K] (reference DIN.py:152-173) — scales with
the PADDED width while true Ali-CCP lengths are ~4-8 of pad 64. --mh_coo
fixed this for sum-pooled groups (ESMM); the bucketer covers the rest
(DIN's per-slot attention, the dense path) by slicing the arrays to a
per-field pow2 bucket of the batch's live width. These tests pin the
exactness contract: slicing dead columns computes the identical model
function (id==0 mask convention), buckets grow monotonically, and the
K-dispatch stacker re-pads mid-group growth with zeros.
"""

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.ragged import MH_PAIRS
from tf_repos_tpu.data.sparse_batch import MhPadBucketer, quarter_pow2
from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch, write_synthetic_aliccp
from tf_repos_tpu.models import create_model
from tf_repos_tpu.train.harness import Harness, run_task
from tf_repos_tpu.train.loop import stack_batches


def _batch(pad=64, avg_hot=4, b=16, fs=800, seed=0):
    return synthetic_aliccp_batch(
        np.random.default_rng(seed), b, fs, multi_hot_pad=pad, avg_hot=avg_hot
    )


# ------------------------------------------------------------ bucketer unit
def test_quarter_pow2_ladder():
    # smallest {1,1.25,1.5,1.75,2}x-pow2 value >= m; <=25% padding waste
    assert [quarter_pow2(m) for m in (1, 2, 3, 5, 8, 9, 11, 13, 15, 16)] == [
        1, 2, 4, 5, 8, 10, 12, 14, 16, 16]
    for m in (100, 1000, 1 << 20, 1_201_081):
        q = quarter_pow2(m)
        assert m <= q < m * 1.25 + 4
        # ladder values are closed under max (the multi-host consensus)
        assert quarter_pow2(q) == q


def test_slices_to_pow2_of_live_width():
    b = _batch(pad=64, avg_hot=4)
    widths = {
        f: int(np.max(np.where((b[f] != 0).any(0))[0])) + 1
        for f, _ in MH_PAIRS
    }
    out = MhPadBucketer(MH_PAIRS)(b)
    for ids_f, vals_f in MH_PAIRS:
        w = widths[ids_f]
        expect = quarter_pow2(w)  # quarter-pow2 >= live width
        assert out[ids_f].shape[-1] == min(expect, 64), ids_f
        if vals_f:
            assert out[vals_f].shape == out[ids_f].shape
        # nothing live dropped
        np.testing.assert_array_equal(out[ids_f], b[ids_f][:, : out[ids_f].shape[-1]])
        assert (b[ids_f][:, out[ids_f].shape[-1]:] == 0).all()


def test_monotonic_growth_and_shrink_resistance():
    bk = MhPadBucketer([("xids", None)])
    mk = lambda w, pad=64: {"xids": np.pad(np.ones((4, w), np.int32), [(0, 0), (0, pad - w)])}
    assert bk(mk(3))["xids"].shape[-1] == 4
    assert bk(mk(9))["xids"].shape[-1] == 10  # quarter-pow2 ladder
    # a later narrow batch keeps the grown bucket (one compile, not a flip)
    assert bk(mk(2))["xids"].shape[-1] == 10


def test_floor_mode_skips_growth_ladder():
    bk = MhPadBucketer([("xids", None)], mode="pow2:16")
    b = {"xids": np.pad(np.ones((4, 2), np.int32), [(0, 0), (0, 62)])}
    assert bk(b)["xids"].shape[-1] == 16


def test_width_is_position_based_not_count_based():
    # one live id in the LAST column: nothing may be dropped even though
    # the live COUNT is tiny
    ids = np.zeros((4, 64), np.int32)
    ids[0, 63] = 5
    out = MhPadBucketer([("xids", None)])({"xids": ids})
    assert out["xids"].shape[-1] == 64


def test_all_dead_field_keeps_one_column():
    out = MhPadBucketer([("xids", None)])({"xids": np.zeros((4, 64), np.int32)})
    assert out["xids"].shape[-1] == 1


def test_bad_mode_rejected():
    with pytest.raises(ValueError):
        MhPadBucketer(MH_PAIRS, mode="max")


# ------------------------------------------------------- model exactness
@pytest.mark.parametrize("model_name", ["DIN", "ESMM"])
def test_sliced_batch_computes_identical_model(model_name):
    import jax

    cfg = Config(
        model=model_name, feature_size=800, field_size=11, embedding_size=4,
        deep_layers="8,4", attention_layers="8", dropout="1.0,1.0",
        batch_size=16, multi_hot_pad=64,
    )
    model = create_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    full = _batch(pad=64, fs=cfg.feature_size)
    sliced = MhPadBucketer(MH_PAIRS)(full)
    assert any(sliced[f].shape != full[f].shape for f, _ in MH_PAIRS)
    out_full, _ = model.apply(params, state, full, train=False)
    out_sliced, _ = model.apply(params, state, sliced, train=False)
    for k in out_full:
        np.testing.assert_allclose(
            np.asarray(out_full[k]), np.asarray(out_sliced[k]), rtol=1e-6, atol=1e-7
        )


# ------------------------------------------------------------- stacking
def test_stack_batches_repads_grown_buckets_with_zeros():
    bk = MhPadBucketer(MH_PAIRS)
    b1 = bk(_batch(pad=64, avg_hot=2, seed=1))
    b2 = bk(_batch(pad=64, avg_hot=8, seed=2))  # wider buckets
    sentinels = {}
    for ids_f, vals_f in MH_PAIRS:
        sentinels[ids_f] = 0
        if vals_f:
            sentinels[vals_f] = 0.0
    stacked = stack_batches([b1, b2], sentinels)
    for ids_f, _ in MH_PAIRS:
        assert stacked[ids_f].shape[1:] == b2[ids_f].shape[:1] + (
            max(b1[ids_f].shape[-1], b2[ids_f].shape[-1]),
        )
        pad_w = stacked[ids_f].shape[-1] - b1[ids_f].shape[-1]
        if pad_w:
            assert (stacked[ids_f][0][:, -pad_w:] == 0).all()


# ------------------------------------------------------------- harness e2e
def _write_data(d, fs=800):
    d.mkdir(parents=True, exist_ok=True)
    write_synthetic_aliccp(str(d / "tr.samples.txt"), 120, feature_size=fs, seed=0)
    write_synthetic_aliccp(str(d / "va.samples.txt"), 60, feature_size=fs, seed=1)


def _cfg(tmp_path, **kw):
    base = dict(
        model="ESMM", feature_size=800, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=16, num_epochs=1,
        log_steps=5, learning_rate=0.01, data_dir=str(tmp_path / "data"),
        model_dir=str(tmp_path / "model"), dt_dir="20260101",
        eval_throttle_secs=0, seed=7, multi_hot_pad=32,
    )
    base.update(kw)
    return Config(**base)


def test_harness_dense_path_trains_and_matches_unbucketed(tmp_path):
    _write_data(tmp_path / "data")
    m_off = run_task(_cfg(tmp_path, model_dir=str(tmp_path / "m0")))
    m_on = run_task(_cfg(tmp_path, model_dir=str(tmp_path / "m1"), mh_bucket="pow2"))
    assert np.isfinite(m_on["loss"])
    # identical math, different XLA programs -> float-accumulation tolerance
    np.testing.assert_allclose(m_on["loss"], m_off["loss"], rtol=1e-4)
    for k in ("CTR_AUC", "CVR_AUC", "CTCVR_AUC"):
        np.testing.assert_allclose(m_on[k], m_off[k], atol=1e-4)


def test_harness_composes_with_sparse_and_dispatch_stacking(tmp_path):
    _write_data(tmp_path / "data")
    m = run_task(_cfg(
        tmp_path, mh_bucket="pow2:8", sparse_table_update=True,
        steps_per_dispatch=2,
    ))
    assert np.isfinite(m["loss"]) and 0.0 <= m["CTR_AUC"] <= 1.0


def test_din_harness_with_bucketing(tmp_path):
    _write_data(tmp_path / "data")
    m = run_task(_cfg(tmp_path, model="DIN", attention_layers="8", mh_bucket="pow2"))
    assert np.isfinite(m["loss"])


def test_sharded_step_accepts_bucketed_widths():
    """Mesh coverage: bucketed (and mid-run GROWING) multi-hot widths
    through the sharded dense train step — the [B, w] fields ride the
    leading-batch-axis data sharding at any w, and the loss matches the
    unsharded step on the same sliced batch."""
    import jax

    from tf_repos_tpu.parallel import step as S
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.train import loop as L
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = Config(
        model="ESMM", feature_size=800, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=16,
        learning_rate=0.1, l2_reg=0.0, optimizer="GD", multi_hot_pad=32,
        seed=0,
    )
    model = create_model(cfg)
    bk = MhPadBucketer(MH_PAIRS)
    batches = [bk(_batch(pad=32, avg_hot=2 + 4 * i, b=16, fs=800, seed=i))
               for i in range(2)]  # widths grow between the two batches
    assert batches[0]["u_catids"].shape != batches[1]["u_catids"].shape

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    params, mstate = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    sstep = L.build_train_step(model, tx)
    rng = jax.random.PRNGKey(123)
    ref = []
    p, o, m = params, opt_state, mstate
    for b in batches:
        p, o, m, loss = sstep(p, o, m, b, rng)
        ref.append(float(loss))

    mesh = make_mesh(data=4, model=2)
    ss = S.ShardedState(model, tx, mesh)
    state, specs = ss.init(jax.random.PRNGKey(0))
    mstep = S.build_sharded_train_step(model, tx, mesh, specs)
    got = []
    for b in batches:
        state, loss = mstep(state, ss.place_batch(b), rng)
        got.append(float(loss))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_libsvm_model_rejected():
    cfg = Config(model="DeepFM", feature_size=100, field_size=39, mh_bucket="pow2")
    with pytest.raises(ValueError, match="mh_bucket"):
        Harness(cfg)
