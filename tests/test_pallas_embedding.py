"""Pallas field-block scatter kernel: correctness vs the XLA scatter-add
reference, run in interpreter mode on the CPU rig. (Performance is
validated on real TPU by bench.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.ops import pallas_embedding as PE


def _field_blocks(num_fields, sizes_pattern, start=0):
    sizes = [sizes_pattern[i % len(sizes_pattern)] for i in range(num_fields)]
    offsets, off = [], start
    for s in sizes:
        offsets.append(off)
        off += s
    return tuple(offsets), tuple(sizes), off


@pytest.mark.parametrize("sizes_pattern", [(64,), (8, 200, 64)])
def test_field_block_scatter_matches_reference(sizes_pattern):
    rng = np.random.default_rng(0)
    F = 5
    offsets, sizes, vocab = _field_blocks(F, sizes_pattern)
    B, W = 48, 9
    ids = np.stack(
        [rng.integers(offsets[f], offsets[f] + sizes[f], size=B) for f in range(F)],
        axis=1,
    ).astype(np.int32)
    g = rng.normal(size=(B, F, W)).astype(np.float32)

    got = PE.field_block_scatter(
        jnp.asarray(ids), jnp.asarray(g), vocab, offsets, sizes,
        tile_b=16, tile_v=32, use_bf16=False, interpret=True,
    )
    want = PE.scatter_reference(jnp.asarray(ids), jnp.asarray(g), vocab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_field_block_scatter_partial_batch_padding():
    """B not divisible by tile_b: padded rows (id = -1) contribute zero."""
    rng = np.random.default_rng(1)
    offsets, sizes, vocab = _field_blocks(3, (40,))
    B, W = 21, 5
    ids = np.stack(
        [rng.integers(offsets[f], offsets[f] + sizes[f], size=B) for f in range(3)],
        axis=1,
    ).astype(np.int32)
    g = rng.normal(size=(B, 3, W)).astype(np.float32)
    got = PE.field_block_scatter(
        jnp.asarray(ids), jnp.asarray(g), vocab, offsets, sizes,
        tile_b=16, tile_v=16, use_bf16=False, interpret=True,
    )
    want = PE.scatter_reference(jnp.asarray(ids), jnp.asarray(g), vocab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_lookup_custom_vjp_grads():
    """End-to-end: grads through make_field_block_lookup == grads through
    the plain gather (f32 path)."""
    rng = np.random.default_rng(2)
    offsets, sizes, vocab = _field_blocks(4, (32, 96))
    B, K = 24, 6
    ids = np.stack(
        [rng.integers(offsets[f], offsets[f] + sizes[f], size=B) for f in range(4)],
        axis=1,
    ).astype(np.int32)
    table = rng.normal(size=(vocab, K)).astype(np.float32)
    w = rng.normal(size=(4, K)).astype(np.float32)

    def loss_with(lookup_fn, t):
        emb = lookup_fn(t, jnp.asarray(ids))
        return jnp.sum(jnp.einsum("bfk,fk->b", emb, jnp.asarray(w)) ** 2)

    # interpret mode for the Pallas path on CPU
    import functools

    lk = PE.make_field_block_lookup(vocab, offsets, sizes, tile_b=16, tile_v=32, use_bf16=False)
    orig = PE.field_block_scatter
    PE_scatter = functools.partial(orig, interpret=True)
    PE.field_block_scatter = PE_scatter
    try:
        g_pallas = jax.grad(lambda t: loss_with(lk, t))(jnp.asarray(table))
    finally:
        PE.field_block_scatter = orig
    g_ref = jax.grad(lambda t: loss_with(lambda t, i: t[i], t))(jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-4, atol=1e-4)
    # forward values identical (same gather)
    np.testing.assert_array_equal(
        np.asarray(lk(jnp.asarray(table), jnp.asarray(ids))),
        np.asarray(jnp.asarray(table)[jnp.asarray(ids)]),
    )


def test_harness_field_blocks_end_to_end(tmp_path):
    """--field_blocks wired through the harness: training runs and the
    final AUC is finite (Pallas scatter in the real train step)."""
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
    from tf_repos_tpu.train.harness import Harness

    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_libsvm(str(d / "tr.libsvm"), 128, feature_size=400, seed=0)
    write_synthetic_libsvm(str(d / "va.libsvm"), 64, feature_size=400, seed=1)
    # synthetic layout: continuous ids 1..13, then equal blocks
    cat_space = 400 - 14
    block = cat_space // 26
    offsets = tuple(range(1, 14)) + tuple(14 + j * block for j in range(26))
    sizes = (1,) * 13 + (block,) * 26
    fb = ",".join(f"{o}:{s}" for o, s in zip(offsets, sizes))
    cfg = Config(
        model="DeepFM", feature_size=400, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=2, data_dir=str(d), model_dir=str(tmp_path / "m"), dt_dir="x",
        eval_throttle_secs=0, field_blocks=fb, mesh_data=1, mesh_model=1,
    )
    h = Harness(cfg)
    if h.mesh is not None:
        import pytest
        pytest.skip("field_blocks applies to the single-device path")
    m = h.train()
    assert np.isfinite(m["loss"])


def test_field_blocks_from_feature_map(tmp_path):
    from tf_repos_tpu.features.criteo import field_blocks_from_feature_map

    fm = tmp_path / "feature_map"
    lines = [f"I{i} {i}" for i in range(1, 14)]
    lines += ["C1|<unk> 13", "C1|a 14", "C1|b 15", "C2|<unk> 16", "C2|x 17"]
    fm.write_text("\n".join(lines) + "\n")
    offsets, sizes = field_blocks_from_feature_map(str(fm))
    assert offsets[:13] == tuple(range(1, 14))
    assert offsets[13:] == (13, 16)
    assert sizes[13:] == (3, 2)
