"""Correctness of the VMEM expand/accumulate kernels (interpret mode on
the CPU rig; the same code path compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.ops import pallas_sparse as PS


@pytest.mark.parametrize("n,s,k", [(1000, 64, 17), (8192, 512, 16), (300, 40, 5)])
def test_expand_matches_xla(n, s, k):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, s, size=(n,)), jnp.int32)
    got = PS.expand_rows(table, idx, chunk=256, unroll=8)
    want = PS.expand_reference(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n,s,k", [(1000, 64, 17), (4096, 512, 16)])
def test_accumulate_matches_xla(n, s, k):
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    # heavy duplication (Zipf-ish) to exercise read-modify-write ordering
    idx = jnp.asarray(
        np.minimum(rng.zipf(1.3, size=(n,)) - 1, s - 1), jnp.int32
    )
    got = PS.accumulate_rows(g, idx, s, chunk=256, unroll=8)
    want = PS.accumulate_reference(g, idx, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_accumulate_duplicates_in_one_unroll_group():
    # all indices identical: every += in every unrolled group hits the
    # same row — the strictest ordering case
    n, s, k = 512, 16, 8
    g = jnp.ones((n, k), jnp.float32)
    idx = jnp.full((n,), 3, jnp.int32)
    got = PS.accumulate_rows(g, idx, s, chunk=128, unroll=8)
    assert float(got[3, 0]) == n
    assert float(jnp.sum(got)) == n * k


def test_expand_pad_tail():
    # N not a multiple of chunk: tail is padded internally, sliced away
    table = jnp.arange(40, dtype=jnp.float32).reshape(8, 5)
    idx = jnp.asarray([7, 0, 3], jnp.int32)
    got = PS.expand_rows(table, idx, chunk=256, unroll=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table[idx]))


def test_lookup_custom_vjp_grads():
    rng = np.random.default_rng(2)
    s, k, b, f = 64, 9, 32, 7
    rows = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, s, size=(b, f)), jnp.int32)
    lookup = PS.make_vmem_expand_lookup(chunk=128, unroll=8)
    assert lookup.static_slice_ok

    w = jnp.asarray(rng.standard_normal((f, k)), jnp.float32)

    def loss_pl(rows):
        return jnp.sum(lookup(rows, ids) * w)

    def loss_xla(rows):
        return jnp.sum(rows[ids] * w)

    v_pl, g_pl = jax.value_and_grad(loss_pl)(rows)
    v_xla, g_xla = jax.value_and_grad(loss_xla)(rows)
    np.testing.assert_allclose(float(v_pl), float(v_xla), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-6
    )


def test_lookup_cap_falls_back_to_xla():
    # rows above the VMEM capacity rule silently keep XLA's gather —
    # same values, same grads (the dense path / oversized pow2 buckets)
    lookup = PS.make_vmem_expand_lookup()
    rng = np.random.default_rng(3)
    rows = jnp.asarray(
        rng.standard_normal((PS.VMEM_ROW_CAP + 8, 4)), jnp.float32
    )
    ids = jnp.asarray(rng.integers(0, rows.shape[0], size=(16,)), jnp.int32)

    def loss(r):
        return jnp.sum(lookup(r, ids) ** 2)

    v, g = jax.value_and_grad(loss)(rows)
    v2, g2 = jax.value_and_grad(lambda r: jnp.sum(r[ids] ** 2))(rows)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-6)


@pytest.mark.parametrize("n,s,k", [(4096, 500, 16), (1000, 77, 32), (600, 33, 64)])
def test_accumulate_packed_matches_xla(n, s, k):
    # the lane-packed accumulator ([ceil(s/pack),128] layout, dynamic
    # pltpu.roll placement) — the above-VMEM_ROW_CAP backward
    rng = np.random.default_rng(6)
    g = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    idx = jnp.asarray(
        np.minimum(rng.zipf(1.3, size=(n,)) - 1, s - 1), jnp.int32
    )
    got = PS.accumulate_rows_packed(g, idx, s, chunk=256, unroll=8)
    want = PS.accumulate_reference(g, idx, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_coo_accumulate_packed_matches_reference():
    rng = np.random.default_rng(7)
    m, s, g_out, k = 3000, 200, 48, 16
    dp = jnp.asarray(rng.standard_normal((g_out, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, s, size=(m,)), jnp.int32)
    dest = jnp.asarray(rng.integers(0, g_out, size=(m,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    got = PS.coo_accumulate_rows_packed(dp, idx, dest, w, s, chunk=256, unroll=8)
    want = (
        jnp.zeros((s, k), jnp.float32)
        .at[idx]
        .add(dp[dest] * w[:, None])
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_lookup_tier2_packed_grads_match_xla(monkeypatch):
    # force tier 2 (S above the row cap, inside the packed cap): XLA
    # gather forward + lane-packed accumulate backward
    monkeypatch.setattr(PS, "VMEM_ROW_CAP", 32)
    rng = np.random.default_rng(8)
    s, k, b, f = 64, 16, 16, 5
    rows = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, s, size=(b, f)), jnp.int32)
    lookup = PS.make_vmem_expand_lookup(chunk=128, unroll=8)
    w = jnp.asarray(rng.standard_normal((f, k)), jnp.float32)
    v_pl, g_pl = jax.value_and_grad(lambda r: jnp.sum(lookup(r, ids) * w))(rows)
    v_x, g_x = jax.value_and_grad(lambda r: jnp.sum(r[ids] * w))(rows)
    np.testing.assert_allclose(float(v_pl), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_x), rtol=1e-5, atol=1e-6
    )


def test_coo_pool_tier2_packed_grads_match_reference(monkeypatch):
    monkeypatch.setattr(PS, "VMEM_ROW_CAP", 32)
    rng = np.random.default_rng(9)
    s, k, m, n_out = 80, 16, 500, 24
    rows = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, s, size=(m,)), jnp.int32)
    dest = jnp.asarray(rng.integers(0, n_out, size=(m,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    pool = PS.make_coo_pool(chunk=128, unroll=8)

    def loss_pl(r):
        return jnp.sum(pool(r, idx, dest, w, n_out) ** 2)

    def loss_ref(r):
        return jnp.sum(PS.coo_pool_reference(r, idx, dest, w, n_out) ** 2)

    v_pl, g_pl = jax.value_and_grad(loss_pl)(rows)
    v_x, g_x = jax.value_and_grad(loss_ref)(rows)
    np.testing.assert_allclose(float(v_pl), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_x), rtol=1e-4, atol=1e-5
    )


def test_above_packed_cap_warns_and_falls_back(monkeypatch):
    # K=17 can never lane-pack (128 % 17 != 0): above the row cap the
    # lookup must warn ONCE per shape and keep XLA semantics
    monkeypatch.setattr(PS, "VMEM_ROW_CAP", 32)
    PS._warned_shapes.clear()
    rng = np.random.default_rng(10)
    rows = jnp.asarray(rng.standard_normal((64, 17)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=(12,)), jnp.int32)
    lookup = PS.make_vmem_expand_lookup(chunk=128, unroll=8)
    with pytest.warns(UserWarning, match="falling back to XLA"):
        out = lookup(rows, ids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(rows[ids]))
    # second call with the same shape: no duplicate warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        lookup(rows, ids)
    PS._warned_shapes.clear()


def test_sparse_step_with_pallas_expand_matches_plain():
    # one full sparse train step: --pallas_expand routing vs the XLA
    # inner lookup — identical trajectories to float tolerance
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import (
        build_sparse_train_step, init_opt_state, make_sparse_row_optimizer,
    )

    cfg = Config(
        model="DeepFM", feature_size=512, field_size=8, embedding_size=4,
        deep_layers="16,8", dropout="1.0,1.0", batch_size=32,
        optimizer="Adam", learning_rate=1e-3, l2_reg=1e-5,
        sparse_table_update=True,
    )
    model = create_model(cfg)
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(0)
    params, mstate = model.init(key)
    tx = make_optimizer("Adam", 1e-3)
    sopt = make_sparse_row_optimizer("Adam", 1e-3)

    batch = {
        "feat_ids": jnp.asarray(
            rng.integers(1, 512, size=(32, 8)), jnp.int32
        ),
        "feat_vals": jnp.ones((32, 8), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, size=(32,)), jnp.float32),
        "mask": jnp.ones((32,), jnp.float32),
    }
    mapped = SparseBatchMapper(model.sparse_slots(), pad_mode="pow2")(
        {k: np.asarray(v) for k, v in batch.items()}
    )
    mapped = {k: jnp.asarray(v) for k, v in mapped.items()}

    def run(lookup):
        # fresh buffers per run: the step donates params/opt/mstate
        p0, m0 = model.init(key)
        opt = init_opt_state(model, tx, sopt, p0)
        step = build_sparse_train_step(model, tx, sopt, lookup=lookup)
        p, o, m, loss = step(p0, opt, m0, mapped, jax.random.PRNGKey(7))
        return float(loss), p

    lookup = PS.make_vmem_expand_lookup(chunk=128, unroll=8)
    l_pl, p_pl = run(lookup)
    l_x, p_x = run(None)
    np.testing.assert_allclose(l_pl, l_x, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_pl["fm_wv"]), np.asarray(p_x["fm_wv"]),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("mesh_shape", [(2, 1), (1, 2)])
def test_sharded_sparse_step_with_pallas_expand_matches_xla(mesh_shape):
    """--pallas_expand under the MESH-sharded sparse step (VERDICT r2
    item 2): the replicated [S_pad,K] working set is local to every
    device, so the kernel needs no collective — the sharded trajectory
    with the Pallas inner lookup must match the sharded XLA one to float
    tolerance (interpret mode on the CPU rig; Mosaic on TPU).

    2-device meshes on purpose: the TPU-semantics simulator is ~1 ms per
    row move, and XLA CPU collectives abort the PROCESS when any device
    straggles a rendezvous past its hard 40 s deadline (CLAUDE.md) —
    wider meshes time-slice the simulator on this 4-core box and
    flake-abort. Data sharding (2,1) and model sharding (1,2) are each
    still exercised; wider-mesh parity is covered by the fast XLA inner
    lookup in test_sparse.py."""
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.models import create_model
    from tf_repos_tpu.parallel.mesh import make_mesh
    from tf_repos_tpu.parallel.sparse_step import (
        ShardedSparseState,
        build_sharded_sparse_train_step,
    )
    from tf_repos_tpu.train.optimizers import make_optimizer
    from tf_repos_tpu.train.sparse import make_sparse_row_optimizer

    cfg = Config(
        model="DeepFM", feature_size=512, field_size=8, embedding_size=4,
        deep_layers="16,8", dropout="1.0,1.0", batch_size=32,
        optimizer="Adam", learning_rate=1e-3, l2_reg=1e-5,
        sparse_table_update=True,
    )
    model = create_model(cfg)
    rng = np.random.default_rng(5)
    mapper = SparseBatchMapper(model.sparse_slots())
    mapped = []
    for i in range(2):
        b = {
            "feat_ids": rng.integers(1, 512, size=(32, 8)).astype(np.int32),
            "feat_vals": np.ones((32, 8), np.float32),
            "label": rng.integers(0, 2, size=(32,)).astype(np.float32),
            "mask": np.ones((32,), np.float32),
        }
        mapped.append(mapper(b))

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    tx = make_optimizer("Adam", 1e-3)
    sopt = make_sparse_row_optimizer("Adam", 1e-3, sorted_indices=False)

    def run(inner_lookup):
        st = ShardedSparseState(model, tx, sopt, mesh)
        state, specs = st.init(jax.random.PRNGKey(0))
        step = build_sharded_sparse_train_step(
            model, tx, sopt, mesh, specs, inner_lookup=inner_lookup
        )
        losses = []
        for i, b in enumerate(mapped):
            state, loss = step(state, st.place_batch(b), jax.random.PRNGKey(7 + i))
            losses.append(float(loss))
        return losses, state["params"]

    l_pl, p_pl = run(PS.make_vmem_expand_lookup(chunk=128, unroll=8))
    l_x, p_x = run(None)
    np.testing.assert_allclose(l_pl, l_x, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_pl["fm_wv"]), np.asarray(p_x["fm_wv"]),
        rtol=1e-5, atol=1e-6,
    )
