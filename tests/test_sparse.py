"""Lazy touched-rows table updates (train/sparse.py + data/sparse_batch.py).

Exactness contract:
  * optimizers where untouched rows are a fixed point of the dense update
    (SGD/Adagrad/FTRL with l2=0: zero grad -> zero step) must match the
    DENSE path bit-for-bit;
  * Adam (dense moves previously-touched rows via decayed momentum) must
    match a dense-materialized emulation of LAZY semantics exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
from tf_repos_tpu.data.synthetic import synthetic_criteo_batch
from tf_repos_tpu.models import create_model
from tf_repos_tpu.train import loop as L
from tf_repos_tpu.train import sparse as SP


def _cfg(**kw):
    base = dict(
        model="DeepFM",
        feature_size=300,
        field_size=39,
        embedding_size=4,
        deep_layers="8,4",
        dropout="1.0,1.0",
        batch_size=16,
        learning_rate=0.05,
        l2_reg=0.0,
        optimizer="GD",
    )
    base.update(kw)
    return Config(**base)


def _batches(cfg, n, seed0=0):
    """Batches whose id coverage is a strict subset of the vocab, so lazy
    vs dense differences on untouched rows are observable."""
    out = []
    for i in range(n):
        b = synthetic_criteo_batch(
            np.random.default_rng(seed0 + i), cfg.batch_size, cfg.feature_size
        )
        out.append(b)
    return out


def _run_sparse(cfg, batches, steps_rng=100, fused=False, fused_table=False):
    model = create_model(cfg)
    from tf_repos_tpu.train.optimizers import make_optimizer

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    sopt = SP.make_sparse_row_optimizer(
        cfg.optimizer, cfg.learning_rate, fused_moments=fused,
        fused_table=fused_table,
    )
    params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
    opt_state = SP.init_opt_state(model, tx, sopt, params)
    step = SP.build_sparse_train_step(model, tx, sopt)
    mapper = SparseBatchMapper(model.sparse_slots())
    losses = []
    for i, b in enumerate(batches):
        params, opt_state, mstate, loss = step(
            params, opt_state, mstate, mapper(b), jax.random.PRNGKey(steps_rng + i)
        )
        losses.append(float(loss))
    return model, params, opt_state, losses


def _run_dense(cfg, batches, steps_rng=100):
    model = create_model(cfg)
    from tf_repos_tpu.train.optimizers import make_optimizer

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
    opt_state = tx.init(params)
    step = L.build_train_step(model, tx)
    losses = []
    for i, b in enumerate(batches):
        params, opt_state, mstate, loss = step(
            params, opt_state, mstate, b, jax.random.PRNGKey(steps_rng + i)
        )
        losses.append(float(loss))
    return model, params, opt_state, losses


@pytest.mark.parametrize("opt", ["GD", "Adagrad"])
def test_sparse_matches_dense_fixed_point_optimizers(opt):
    """With l2=0 an untouched row has zero gradient and these optimizers
    leave it exactly in place -> sparse must equal dense bit-for-bit.
    (NOT true of FTRL — dense FTRL recomputes w from (z,n) and zeroes
    never-touched rows at step 1; the lazy path keeps their init values,
    matching the reference's sparse PS updates — see the emulation test.)"""
    cfg = _cfg(optimizer=opt)
    batches = _batches(cfg, 3)
    _, p_sparse, _, l_sparse = _run_sparse(cfg, batches)
    _, p_dense, _, l_dense = _run_dense(cfg, batches)
    np.testing.assert_allclose(l_sparse, l_dense, rtol=1e-6)
    flat_s = jax.tree.leaves(p_sparse)
    flat_d = jax.tree.leaves(p_dense)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("opt", ["Adam", "ftrl"])
def test_fused_moments_matches_unfused(opt):
    """fused_moments ([V,2K] m|v resp. n|z storage) is a pure layout
    change: the training trajectory must match the unfused sparse path
    to float tolerance (same math, different memory layout)."""
    cfg = _cfg(optimizer=opt, learning_rate=0.01)
    batches = _batches(cfg, 4)
    _, p_fused, s_fused, l_fused = _run_sparse(cfg, batches, fused=True)
    _, p_unf, s_unf, l_unf = _run_sparse(cfg, batches, fused=False)
    np.testing.assert_allclose(l_fused, l_unf, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_unf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)
    # and the fused state really is fused: one [V,2K] array per table
    for t, aux in s_fused["sparse"].items():
        key = "mv" if opt == "Adam" else "nz"
        assert aux[key].shape[-1] == 2 * p_fused[t].shape[-1]
        assert "m" not in aux and "n" not in aux


def test_fused_table_matches_unfused_adam():
    """--fused_table ([V,3K] w|m|v storage, FusedTableRowOpt: one gather
    + one scatter per step) is a pure layout change over the plain sparse
    Adam path — identical trajectory and final table to float tolerance,
    and the params entry must track the storage's w slice exactly."""
    cfg = _cfg(optimizer="Adam", learning_rate=0.01)
    batches = _batches(cfg, 4)
    _, p_ft, s_ft, l_ft = _run_sparse(cfg, batches, fused_table=True)
    _, p_unf, _, l_unf = _run_sparse(cfg, batches)
    np.testing.assert_allclose(l_ft, l_unf, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ft), jax.tree.leaves(p_unf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)
    for t, aux in s_ft["sparse"].items():
        K = p_ft[t].shape[-1]
        assert aux["wmv"].shape[-1] == 3 * K
        np.testing.assert_array_equal(
            np.asarray(aux["wmv"][..., :K]), np.asarray(p_ft[t])
        )


def test_fused_table_checkpoint_resume(tmp_path):
    """The [V,3K] wmv opt-state tree must round-trip through Orbax and
    resume training (the layout is new; a restore quirk would strand
    every --fused_table run at its first restart)."""
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_libsvm(str(d / "tr.libsvm"), 96, feature_size=300, seed=0)
    write_synthetic_libsvm(str(d / "va.libsvm"), 32, feature_size=300, seed=1)
    cfg = Config(
        model="DeepFM", feature_size=300, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, learning_rate=0.01, data_dir=str(d),
        model_dir=str(tmp_path / "m"), dt_dir="d", eval_throttle_secs=0,
        seed=7, sparse_table_update=True, fused_table=True,
        mesh_data=1, mesh_model=1,
    )
    m1 = run_task(cfg)
    m2 = run_task(cfg)  # restores the wmv tree, trains one more epoch
    assert m2["step"] == 2 * m1["step"]
    assert np.isfinite(m2["loss"])


def test_fused_table_rejects_non_adam_and_double_fuse():
    with pytest.raises(ValueError, match="Adam"):
        SP.make_sparse_row_optimizer("ftrl", 0.01, fused_table=True)
    with pytest.raises(ValueError, match="supersedes"):
        SP.make_sparse_row_optimizer(
            "Adam", 0.01, fused_moments=True, fused_table=True
        )


@pytest.mark.parametrize("opt", ["Adam", "Adagrad", "ftrl", "GD", "Momentum"])
def test_sparse_matches_dense_lazy_emulation(opt):
    """Sparse path == a dense-materialized emulation of LAZY semantics:
    run the DENSE optimizer (train/optimizers.py, the reference's exact
    hyperparameters) on the full table each step, then keep the new
    value/state ONLY for rows touched this step. Covers touched-rows-only
    L2 (l2_reg > 0)."""
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = _cfg(optimizer=opt, l2_reg=0.01)
    model = create_model(cfg)
    batches = _batches(cfg, 4)
    table_name = next(iter(model.sparse_slots()))

    _, p_sparse, o_sparse, _ = _run_sparse(cfg, batches)

    # ---- dense-materialized lazy emulation
    params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
    tx = make_optimizer(opt, cfg.learning_rate)
    rest = {k: v for k, v in params.items() if k != table_name}
    dense_state = tx.init(rest)
    table = params[table_name]
    table_tx = make_optimizer(opt, cfg.learning_rate)
    table_state = table_tx.init({table_name: table})

    def mask_tree(new, old, tm):
        """Row-masked merge: table-shaped leaves keep old values on
        untouched rows; scalars (e.g. Adam's count) take the new value."""
        def f(n, o):
            if hasattr(n, "shape") and n.shape[: tm.ndim] == tm.shape:
                m = tm.reshape(tm.shape + (1,) * (n.ndim - tm.ndim))
                return jnp.where(m, n, o)
            return n
        return jax.tree.map(f, new, old)

    @jax.jit
    def emu_step(table, table_state, rest, dense_state, mstate, batch, rng):
        # the mapper force-includes id 0 (remap-position invariant), so
        # row 0 is touched every step by contract
        touched = (
            jnp.zeros((cfg.feature_size,), bool)
            .at[batch["feat_ids"].reshape(-1)].set(True)
            .at[0].set(True)
        )

        def loss_fn(table, rest):
            p = dict(rest)
            p[table_name] = table
            out, new_mstate = model.apply(p, mstate, batch, train=True, rng=rng)
            per = model.per_example_loss(out, batch)
            mask = batch["mask"]
            data = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            # touched-rows-only L2 — what the sparse path's l2_loss sees
            l2 = cfg.l2_reg * 0.5 * jnp.sum(
                jnp.square(table) * touched[:, None].astype(table.dtype)
            )
            return data + l2, new_mstate

        (loss, new_mstate), (g_t, g_r) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(table, rest)
        upd, new_dense = tx.update(g_r, dense_state, rest)
        rest = optax.apply_updates(rest, upd)
        t_upd, new_tstate = table_tx.update(
            {table_name: g_t}, table_state, {table_name: table}
        )
        new_table = optax.apply_updates({table_name: table}, t_upd)[table_name]
        table = jnp.where(touched[:, None], new_table, table)
        table_state = mask_tree(new_tstate, table_state, touched)
        return table, table_state, rest, new_dense, new_mstate, loss

    for i, b in enumerate(batches):
        table, table_state, rest, dense_state, mstate, _ = emu_step(
            table, table_state, rest, dense_state, mstate, b,
            jax.random.PRNGKey(100 + i),
        )

    np.testing.assert_allclose(
        np.asarray(p_sparse[table_name]), np.asarray(table), rtol=1e-5, atol=1e-7
    )
    for a, b_ in zip(
        jax.tree.leaves(rest), jax.tree.leaves({k: p_sparse[k] for k in rest})
    ):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_mapper_preserves_lookup_and_zero_position():
    """table[original_ids] == rows[remapped_ids]; id 0 keeps position 0
    so `ids > 0` multi-hot masking survives the remap."""
    cfg = _cfg()
    model = create_model(cfg)
    mapper = SparseBatchMapper(model.sparse_slots(), pad_mode="max")
    rng = np.random.default_rng(0)
    b = synthetic_criteo_batch(rng, 8, cfg.feature_size)
    orig_ids = np.asarray(b["feat_ids"]).copy()
    mb = mapper(b)
    table_name = next(iter(model.sparse_slots()))
    u = mb[SP.UIDS_PREFIX + table_name]
    # "max" pad: total ids + 1 (forced zero), capped at the vocab
    assert u.shape[0] == min(orig_ids.size + 1, cfg.feature_size)
    assert u[0] == 0  # forced zero row
    table = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (cfg.feature_size, 3))
    )
    rows = np.asarray(SP.take_rows(jnp.array(table), jnp.array(u)))
    np.testing.assert_allclose(rows[mb["feat_ids"]], table[orig_ids], rtol=1e-6)
    # remapped 0 <-> original 0, everywhere
    np.testing.assert_array_equal(mb["feat_ids"] == 0, orig_ids == 0)
    # sentinel rows gather as zeros
    np.testing.assert_array_equal(rows[-1], np.zeros(3, np.float32))


def test_esmm_sparse_smoke_and_loss_parity():
    """ESMM (the 4.5M-vocab reference pain point, scaled down): sparse
    step loss == dense step loss with l2=0 and SGD (data loss identical,
    untouched rows are fixed points)."""
    cfg = Config(
        model="ESMM", feature_size=400, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=8, learning_rate=0.05,
        l2_reg=0.0, optimizer="GD", multi_hot_pad=4,
    )
    from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch

    batches = [
        synthetic_aliccp_batch(
            np.random.default_rng(i), 8, cfg.feature_size, multi_hot_pad=4
        )
        for i in range(3)
    ]
    model, p_sparse, _, l_sparse = _run_sparse(cfg, batches)
    _, p_dense, _, l_dense = _run_dense(cfg, batches)
    np.testing.assert_allclose(l_sparse, l_dense, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sparse), jax.tree.leaves(p_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------- bf16 + SR
def test_stochastic_round_bf16_unbiased():
    from tf_repos_tpu.ops.rounding import stochastic_round_bf16

    lo = jnp.bfloat16(1.0)
    hi = jnp.float32(np.nextafter(np.float32(jnp.float32(lo)), np.float32(2.0)))
    # a value 25% of the way from one bf16 to the next
    lo32 = jnp.float32(lo)
    ulp = float(jnp.float32(jnp.bfloat16(1.0078125)) - lo32)  # next bf16 after 1.0
    x = jnp.full((200_000,), lo32 + 0.25 * ulp, jnp.float32)
    r = stochastic_round_bf16(x, jax.random.PRNGKey(0)).astype(jnp.float32)
    uniq = np.unique(np.asarray(r))
    assert len(uniq) == 2  # rounds to exactly the two neighbors
    frac_up = float(jnp.mean((r > lo32).astype(jnp.float32)))
    assert abs(frac_up - 0.25) < 0.01  # unbiased
    # exact bf16 values are fixed points
    exact = jnp.array([0.0, 1.0, -2.5, 384.0], jnp.float32)
    out = stochastic_round_bf16(exact, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), np.asarray(exact))
    # NaN/inf pass through
    special = jnp.array([np.inf, -np.inf, np.nan], jnp.float32)
    s = np.asarray(stochastic_round_bf16(special, jax.random.PRNGKey(2)).astype(jnp.float32))
    assert np.isinf(s[0]) and s[0] > 0 and np.isinf(s[1]) and s[1] < 0 and np.isnan(s[2])


def test_bf16_sparse_training_tracks_f32():
    """bf16 tables + moments with SR: training moves like f32 (loose
    tolerance) and storage dtype is preserved end-to-end."""
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import cast_tables

    cfg = _cfg(optimizer="Adam", l2_reg=0.0, learning_rate=0.05)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    sopt = SP.make_sparse_row_optimizer(cfg.optimizer, cfg.learning_rate)
    batches = _batches(cfg, 5)
    mapper = SparseBatchMapper(model.sparse_slots())
    table_name = next(iter(model.sparse_slots()))

    results = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
        params = cast_tables(model, params, dtype)
        opt_state = SP.init_opt_state(model, tx, sopt, params)
        step = SP.build_sparse_train_step(model, tx, sopt)
        losses = []
        for i, b in enumerate(batches):
            params, opt_state, mstate, loss = step(
                params, opt_state, mstate, mapper(b), jax.random.PRNGKey(100 + i)
            )
            losses.append(float(loss))
        assert params[table_name].dtype == dtype
        assert opt_state["sparse"][table_name]["m"].dtype == dtype
        results[dtype] = (losses, np.asarray(params[table_name], np.float32))

    l32, t32 = results[jnp.float32]
    l16, t16 = results[jnp.bfloat16]
    np.testing.assert_allclose(l16, l32, rtol=0.02)  # loss curve tracks
    # tables agree to bf16-resolution-ish after 5 steps
    assert float(np.max(np.abs(t16 - t32))) < 0.05


def test_pow2_pad_mode_matches_max():
    """uids bucket sizing is invisible to the math: pow2 (tight, grows
    monotonically over the quarter-pow2 ladder since round 4) and max
    (static worst case) give identical trajectories; buckets never
    shrink."""
    cfg = _cfg(optimizer="Adam", learning_rate=0.01, l2_reg=1e-4)
    model = create_model(cfg)
    batches = _batches(cfg, 4)

    traj = {}
    for mode in ("pow2", "max"):
        mapper = SparseBatchMapper(model.sparse_slots(), pad_mode=mode)
        mapped = [mapper(dict(b)) for b in batches]
        if mode == "pow2":
            sizes = [
                m[SP.UIDS_PREFIX + next(iter(model.sparse_slots()))].shape[0]
                for m in mapped
            ]
            from tf_repos_tpu.data.sparse_batch import quarter_pow2

            assert all(
                quarter_pow2(s) == s or s == cfg.feature_size for s in sizes
            )
            assert sizes == sorted(sizes)  # monotonic growth
        from tf_repos_tpu.train.optimizers import make_optimizer

        tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
        sopt = SP.make_sparse_row_optimizer("Adam", 0.01)
        params, mstate = model.init(jax.random.PRNGKey(7))
        o = SP.init_opt_state(model, tx, sopt, params)
        step = SP.build_sparse_train_step(model, tx, sopt)
        losses = []
        for i, b in enumerate(mapped):
            params, o, mstate, loss = step(params, o, mstate, b, jax.random.PRNGKey(9 + i))
            losses.append(float(loss))
        traj[mode] = (losses, params)

    np.testing.assert_allclose(traj["pow2"][0], traj["max"][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(traj["pow2"][1]), jax.tree.leaves(traj["max"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


def test_stack_batches_pads_grown_uids():
    """stack_batches pads shorter __uids_* arrays in a K-group with the
    table's sentinel so scan-batched dispatch survives mid-group bucket
    growth."""
    from tf_repos_tpu.train import loop as LP

    a = {"__uids_emb": np.array([0, 3, 7], np.int32), "x": np.zeros((2,))}
    b = {"__uids_emb": np.array([0, 1, 2, 5, 9], np.int32), "x": np.ones((2,))}
    out = LP.stack_batches([a, b], {"__uids_emb": 11})
    np.testing.assert_array_equal(
        out["__uids_emb"], [[0, 3, 7, 11, 11], [0, 1, 2, 5, 9]]
    )
    assert out["x"].shape == (2, 2)


@pytest.mark.parametrize(
    "mesh_shape,layout",
    [
        ((4, 2), "plain"),
        ((2, 4), "moments"),
        # --fused_table under every dryrun mesh shape (VERDICT r4 item 1):
        # each model shard keeps a [V_local,3K] w|m|v array; vocab 301
        # does not divide the model axis, so padded shards are exercised
        ((8, 1), "table"),
        ((4, 2), "table"),
        ((2, 4), "table"),
        # fused_table + per-row moment catch-up (the [V] last-touched
        # array shards over "model" like every other row-aux array)
        ((4, 2), "table_catchup"),
        # fused_table + DMA write-back: the lane-padded [V_local, L]
        # storage and the per-row DMA scatter must shard like the plain
        # fused layout (interpret-mode kernel on the CPU mesh)
        ((2, 4), "table_dma"),
    ],
)
def test_sharded_sparse_matches_single_chip(mesh_shape, layout):
    """Mesh-sharded lazy updates (parallel/sparse_step.py) == the
    single-chip sparse trajectory to float tolerance, across mesh shapes
    and the fused-moment/fused-table layouts. The vocab here does NOT
    divide the model axis, so the padding path is exercised too."""
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState,
        build_sharded_sparse_train_step,
    )
    from tf_repos_tpu.train.optimizers import make_optimizer

    fused = layout == "moments"
    fused_table = layout.startswith("table")
    catchup = layout.endswith("catchup")
    dma = layout.endswith("dma")
    cfg = _cfg(optimizer="Adam", learning_rate=0.01, l2_reg=1e-4, feature_size=301)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    batches = _batches(cfg, 3)
    mapper = SparseBatchMapper(model.sparse_slots())
    mapped = [mapper(dict(b)) for b in batches]

    sopt1 = SP.make_sparse_row_optimizer(
        "Adam", 0.01, fused_moments=fused, fused_table=fused_table,
        catchup=catchup, dma_scatter=dma,
    )
    params, mstate = model.init(jax.random.PRNGKey(7))
    o1 = SP.init_opt_state(model, tx, sopt1, params)
    step1 = SP.build_sparse_train_step(model, tx, sopt1)
    p1, m1, l1 = params, mstate, []
    for i, b in enumerate(mapped):
        p1, o1, m1, loss = step1(p1, o1, m1, b, jax.random.PRNGKey(100 + i))
        l1.append(float(loss))

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sopt2 = SP.make_sparse_row_optimizer(
        "Adam", 0.01, fused_moments=fused, sorted_indices=False,
        fused_table=fused_table, catchup=catchup, dma_scatter=dma,
    )
    st = ShardedSparseState(model, tx, sopt2, mesh)
    state, specs = st.init(jax.random.PRNGKey(7))
    step2 = build_sharded_sparse_train_step(model, tx, sopt2, mesh, specs)
    l2 = []
    for i, b in enumerate(mapped):
        state, loss = step2(state, st.place_batch(b), jax.random.PRNGKey(100 + i))
        l2.append(float(loss))

    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for t in model.sparse_slots():
        a = np.asarray(p1[t])
        b = np.asarray(state["params"][t])[: a.shape[0]]
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
        # padding rows must stay exactly zero (never touched)
        pad = np.asarray(state["params"][t])[a.shape[0]:]
        assert pad.size == 0 or float(np.max(np.abs(pad))) == 0.0
        if fused_table:
            # the sharded [V_local,3K] w|m|v storage must agree with the
            # single-chip fused tree row-for-row (concatenated shards)
            a3 = np.asarray(o1["sparse"][t]["wmv"])
            b3 = np.asarray(state["opt_state"]["sparse"][t]["wmv"])[
                : a3.shape[0]
            ]
            np.testing.assert_allclose(a3, b3, rtol=2e-5, atol=1e-7)


def test_sharded_sparse_harness_end_to_end(tmp_path):
    """Full lifecycle through the harness with mesh + sparse_table_update
    + bf16 storage: train, periodic checkpoint, eval all run sharded."""
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data = tmp_path / "data"
    data.mkdir()
    write_synthetic_libsvm(str(data / "tr.libsvm"), 256, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data / "va.libsvm"), 128, feature_size=500, seed=1)
    m = run_task(
        Config(
            model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
            deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
            log_steps=4, learning_rate=0.01, data_dir=str(data), dt_dir="x",
            eval_throttle_secs=0, seed=7, sparse_table_update=True,
            param_dtype="bfloat16", mesh_data=4, mesh_model=2,
            fused_table=True, model_dir=str(tmp_path / "m"),
        )
    )
    assert np.isfinite(m["loss"]) and 0.0 <= m["auc"] <= 1.0


@pytest.mark.parametrize("sparse", [False, True])
def test_mesh_steps_per_dispatch_matches_single(tmp_path, sparse):
    """Scan-batched sharded dispatch (dense and sparse mesh paths) ==
    per-step sharded dispatch: same final step/auc/loss."""
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data = tmp_path / "data"
    data.mkdir()
    write_synthetic_libsvm(str(data / "tr.libsvm"), 256, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data / "va.libsvm"), 100, feature_size=500, seed=1)
    base = dict(
        model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=2,
        log_steps=5, learning_rate=0.01, data_dir=str(data), dt_dir="x",
        eval_throttle_secs=0, seed=7, mesh_data=4, mesh_model=2,
        sparse_table_update=sparse,
    )
    m1 = run_task(Config(**base, model_dir=str(tmp_path / "m1")))
    m4 = run_task(
        Config(**base, model_dir=str(tmp_path / "m4"), steps_per_dispatch=4)
    )
    assert m1["step"] == m4["step"]
    assert abs(m1["auc"] - m4["auc"]) < 1e-5
    assert abs(m1["loss"] - m4["loss"]) < 1e-5


def test_param_dtype_requires_sparse_mode(tmp_path):
    from tf_repos_tpu.train.harness import Harness

    cfg = _cfg().replace(param_dtype="bfloat16", sparse_table_update=False)
    with pytest.raises(ValueError, match="sparse_table_update"):
        Harness(cfg)


def test_sparse_steps_per_dispatch_matches_single(tmp_path):
    """Sparse path + lax.scan step batching == per-step sparse dispatch."""
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import run_task

    data = tmp_path / "data"
    data.mkdir()
    write_synthetic_libsvm(str(data / "tr.libsvm"), 200, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data / "va.libsvm"), 100, feature_size=500, seed=1)
    base = dict(
        model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=2,
        log_steps=5, learning_rate=0.01, data_dir=str(data), dt_dir="x",
        eval_throttle_secs=0, seed=7, sparse_table_update=True,
    )
    m1 = run_task(Config(**base, model_dir=str(tmp_path / "m1")))
    m4 = run_task(
        Config(**base, model_dir=str(tmp_path / "m4"), steps_per_dispatch=4)
    )
    assert m1["step"] == m4["step"]
    assert abs(m1["auc"] - m4["auc"]) < 1e-5
    assert abs(m1["loss"] - m4["loss"]) < 1e-5


def test_sparse_composes_with_static_fields():
    """--static_fields + --sparse_table_update (single-chip): the mapper
    seeds ids 0..static (SparseSlot.static) so position == id across the
    static block, and the model's constant-row slice reads the right rows
    off the gathered [S,K] matrix. The trajectory must match the dense
    static path AND the plain dense path (static_fields itself is
    trajectory-exact) to float tolerance."""
    cfg = _cfg(static_fields=13)
    batches = _batches(cfg, 3)
    _, p_s, _, l_s = _run_sparse(cfg, batches)
    _, p_d, _, l_d = _run_dense(cfg, batches)
    _, _, _, l_plain = _run_dense(_cfg(), batches)
    np.testing.assert_allclose(l_s, l_d, rtol=1e-6)
    np.testing.assert_allclose(l_s, l_plain, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)


def test_pow2_floor_pad_mode():
    """pad_mode="pow2:<floor>" starts every uids bucket at <floor> (skips
    the growth-ladder recompiles) and produces identical remapped batches
    to plain pow2 apart from longer sentinel padding."""
    cfg = _cfg(feature_size=5000)
    model = create_model(cfg)
    b = _batches(cfg, 1)[0]
    m_plain = SparseBatchMapper(model.sparse_slots())(dict(b))
    m_floor = SparseBatchMapper(model.sparse_slots(), pad_mode="pow2:2048")(dict(b))
    uids_p = m_plain["__uids_fm_wv"]
    uids_f = m_floor["__uids_fm_wv"]
    assert len(uids_f) == 2048 and len(uids_p) < 2048
    np.testing.assert_array_equal(uids_f[: len(uids_p)], uids_p)
    assert (uids_f[len(uids_p):] == cfg.feature_size).all()  # sentinels
    np.testing.assert_array_equal(m_floor["feat_ids"], m_plain["feat_ids"])


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_sparse_static_fields_matches_single_chip(mesh_shape):
    """--static_fields under the MESH-sharded sparse step (VERDICT r2:
    the old harness guard forbade this; the sharded step applies the
    model to the replicated compact rows with a plain dense lookup, so
    the constant-row slice path is exactly as valid as on one chip).
    Trajectory parity vs the single-chip sparse+static run."""
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState,
        build_sharded_sparse_train_step,
    )
    from tf_repos_tpu.train.optimizers import make_optimizer

    cfg = _cfg(optimizer="Adam", learning_rate=0.01, l2_reg=1e-4,
               feature_size=301, static_fields=13)
    model = create_model(cfg)
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    batches = _batches(cfg, 3)
    mapper = SparseBatchMapper(model.sparse_slots())
    mapped = [mapper(dict(b)) for b in batches]

    _, p1, _, l1 = _run_sparse(cfg, [dict(b) for b in batches],
                               steps_rng=100)

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sopt2 = SP.make_sparse_row_optimizer(
        "Adam", cfg.learning_rate, sorted_indices=False
    )
    st = ShardedSparseState(model, tx, sopt2, mesh)
    state, specs = st.init(jax.random.PRNGKey(cfg.seed))
    step2 = build_sharded_sparse_train_step(model, tx, sopt2, mesh, specs)
    l2 = []
    for i, b in enumerate(mapped):
        state, loss = step2(state, st.place_batch(b), jax.random.PRNGKey(100 + i))
        l2.append(float(loss))

    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for t in model.sparse_slots():
        a = np.asarray(p1[t])
        b = np.asarray(state["params"][t])[: a.shape[0]]
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("layout", ["plain", "moments", "table"])
def test_sparse_catchup_matches_dense_decay_emulation(layout):
    """--sparse_catchup (VERDICT r4 item 2): lazy Adam with per-row
    moment catch-up == a dense-materialized emulation where EVERY row's
    m,v decay by beta each step (dense Adam under zero grad) and weights
    move only on touch — across all three storage layouts."""
    rng = np.random.default_rng(0)
    V, K, steps, lr = 32, 4, 10, 0.05
    b1, b2, eps = 0.9, 0.999, 1e-8
    table0 = rng.normal(size=(V, K)).astype(np.float32)

    sopt = SP.make_sparse_row_optimizer(
        "Adam", lr, fused_moments=layout == "moments",
        fused_table=layout == "table", catchup=True,
    )
    aux = sopt.init(jnp.asarray(table0))
    table = jnp.asarray(table0)

    # emulation state (f32 numpy)
    w = table0.copy()
    m = np.zeros((V, K), np.float32)
    v = np.zeros((V, K), np.float32)

    for t in range(1, steps + 1):
        s = rng.integers(2, 8)
        u = np.sort(rng.choice(V, size=s, replace=False)).astype(np.int32)
        g = rng.normal(size=(s, K)).astype(np.float32)
        if layout == "table":
            su = SP.take_rows_f32(aux["wmv"], jnp.asarray(u))
            table, aux = sopt.apply(
                aux, su, jnp.asarray(u), jnp.asarray(g), jax.random.PRNGKey(t)
            )
        else:
            table, aux = sopt.apply(
                aux, table, jnp.asarray(u), jnp.asarray(g), jax.random.PRNGKey(t)
            )

        # dense emulation: every row decays; touched rows add the grad
        # term and take a weight step
        m *= b1
        v *= b2
        m[u] += (1.0 - b1) * g
        v[u] += (1.0 - b2) * np.square(g)
        m_hat = m[u] / (1.0 - b1**t)
        v_hat = v[u] / (1.0 - b2**t)
        w[u] -= lr * m_hat / (np.sqrt(v_hat) + eps)

    np.testing.assert_allclose(np.asarray(table), w, rtol=1e-4, atol=1e-6)


def test_sparse_catchup_equals_plain_when_every_row_touched():
    """When every step touches every row, catch-up deltas are all 1 and
    the construction must reduce exactly to plain lazy Adam."""
    rng = np.random.default_rng(1)
    V, K, lr = 8, 4, 0.05
    table0 = rng.normal(size=(V, K)).astype(np.float32)
    u = jnp.arange(V, dtype=jnp.int32)
    s1 = SP.make_sparse_row_optimizer("Adam", lr)
    s2 = SP.make_sparse_row_optimizer("Adam", lr, catchup=True)
    a1, a2 = s1.init(jnp.asarray(table0)), s2.init(jnp.asarray(table0))
    t1 = t2 = jnp.asarray(table0)
    for t in range(1, 6):
        g = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
        t1, a1 = s1.apply(a1, t1, u, g, jax.random.PRNGKey(t))
        t2, a2 = s2.apply(a2, t2, u, g, jax.random.PRNGKey(t))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_sparse_catchup_rejects_non_adam():
    with pytest.raises(ValueError, match="sparse_catchup"):
        SP.make_sparse_row_optimizer("Adagrad", 0.05, catchup=True)


def test_dma_scatter_matches_fused_table_trajectory():
    """--dma_scatter (lane-padded [V,L] w|m|v + per-row DMA write-back)
    must reproduce the plain fused-table trajectory: same math, and the
    DMA copies whole padded rows — only XLA fusion-order noise from the
    wider [S,L] gather remains (measured 1 ULP)."""
    cfg = _cfg(optimizer="Adam", learning_rate=0.01, l2_reg=1e-4)
    batches = _batches(cfg, 3)
    _, p_ft, o_ft, l_ft = _run_sparse(cfg, batches, fused_table=True)
    model = create_model(cfg)
    from tf_repos_tpu.train.optimizers import make_optimizer

    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    sopt = SP.make_sparse_row_optimizer(
        cfg.optimizer, cfg.learning_rate, fused_table=True, dma_scatter=True
    )
    params, mstate = model.init(jax.random.PRNGKey(cfg.seed))
    opt_state = SP.init_opt_state(model, tx, sopt, params)
    step = SP.build_sparse_train_step(model, tx, sopt)
    mapper = SparseBatchMapper(model.sparse_slots())
    l_dma = []
    for i, b in enumerate(batches):
        params, opt_state, mstate, loss = step(
            params, opt_state, mstate, mapper(b), jax.random.PRNGKey(100 + i)
        )
        l_dma.append(float(loss))
    np.testing.assert_allclose(l_ft, l_dma, rtol=1e-6)
    for t in model.sparse_slots():
        np.testing.assert_allclose(
            np.asarray(p_ft[t]), np.asarray(params[t]), rtol=1e-6, atol=1e-7
        )
        K3 = np.asarray(o_ft["sparse"][t]["wmv"]).shape[-1]
        np.testing.assert_allclose(
            np.asarray(o_ft["sparse"][t]["wmv"]),
            np.asarray(opt_state["sparse"][t]["wmv"])[..., :K3],
            rtol=1e-6, atol=1e-7,
        )
        # lane padding beyond 3K stays zero
        pad_lanes = np.asarray(opt_state["sparse"][t]["wmv"])[..., K3:]
        assert float(np.abs(pad_lanes).max()) == 0.0


def test_dma_scatter_validation():
    with pytest.raises(ValueError, match="dma_scatter"):
        SP.make_sparse_row_optimizer("Adam", 0.01, dma_scatter=True)
    sopt = SP.make_sparse_row_optimizer(
        "Adam", 0.01, fused_table=True, dma_scatter=True
    )
    with pytest.raises(ValueError, match="f32"):
        sopt.init(jnp.zeros((8, 4), jnp.bfloat16))
