"""--slim_transfer: slim host->device wire format for the Criteo layout
(data/slim_wire.py). The codec must be EXACT — decode(encode(b)) == b
including zero-padded tail rows — and the full harness must produce the
same trajectory with the flag on vs off to float-accumulation tolerance
(the codec is mathematically exact, but the on-device decode fuses into
a different XLA program, so agreement is last-ulp, not bytes). Also
covers the --sparse_table_update composition: encode runs AFTER the
dedup mapper and both encoder contracts survive the remap."""

import os

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.slim_wire import (
    CAT_IDS,
    CONT_VALS,
    decode_batch,
    encode_batch,
)
from tf_repos_tpu.data.synthetic import synthetic_criteo_batch, write_synthetic_libsvm
from tf_repos_tpu.train.harness import run_task


def _batch_with_padding():
    rng = np.random.default_rng(3)
    b = synthetic_criteo_batch(rng, 8, feature_size=500)
    # zero-pad the last two rows exactly like the libsvm reader's final
    # partial batch (data/libsvm.py np.pad)
    for k in ("feat_ids", "feat_vals", "label", "mask"):
        b[k][-2:] = 0
    return b


def test_encode_decode_roundtrip_exact():
    b = _batch_with_padding()
    slim = encode_batch(b, sf=13)
    assert slim[CONT_VALS].shape == (8, 13) and slim[CAT_IDS].shape == (8, 26)
    assert "feat_ids" not in slim and "feat_vals" not in slim
    # wire bytes: 13*4 + 26*4 + label 4 + mask 4 vs full 39*8 + 8
    slim_bytes = sum(np.asarray(v).nbytes for v in slim.values())
    full_bytes = sum(np.asarray(v).nbytes for v in b.values())
    assert slim_bytes < 0.55 * full_bytes
    dec = decode_batch(slim, sf=13)
    np.testing.assert_array_equal(np.asarray(dec["feat_ids"]), b["feat_ids"])
    np.testing.assert_array_equal(np.asarray(dec["feat_vals"]), b["feat_vals"])
    np.testing.assert_array_equal(np.asarray(dec["label"]), b["label"])
    np.testing.assert_array_equal(np.asarray(dec["mask"]), b["mask"])


def test_encode_rejects_non_criteo_layout():
    b = _batch_with_padding()
    bad = {k: v.copy() for k, v in b.items()}
    bad["feat_ids"][0, 2] = 99  # not the constant continuous id
    with pytest.raises(ValueError):
        encode_batch(bad, sf=13)
    bad2 = {k: v.copy() for k, v in b.items()}
    bad2["feat_vals"][1, 20] = 0.5  # categorical val != 1.0
    with pytest.raises(ValueError):
        encode_batch(bad2, sf=13)


def _cfg(workdir, tag, **kw):
    base = dict(
        model="DeepFM", feature_size=500, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, learning_rate=0.01, static_fields=13,
        data_dir=str(workdir / "data"), model_dir=str(workdir / tag),
        dt_dir="d", eval_throttle_secs=0, seed=7,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("steps_per_dispatch", [1, 2])
def test_harness_trajectory_bit_identical(tmp_path, steps_per_dispatch):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_libsvm(str(data_dir / "tr.part0.libsvm"), 200, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data_dir / "va.part0.libsvm"), 100, feature_size=500, seed=1)
    write_synthetic_libsvm(str(data_dir / "te.part0.libsvm"), 50, feature_size=500, seed=2)

    results = {}
    for slim in (False, True):
        tag = f"m_slim{int(slim)}_k{steps_per_dispatch}"
        cfg = _cfg(
            tmp_path, tag, slim_transfer=slim,
            steps_per_dispatch=steps_per_dispatch,
        )
        tr = run_task(cfg)
        ev = run_task(cfg.replace(task_type="eval"))
        pred_path = run_task(cfg.replace(task_type="infer"))
        preds = np.array([float(x) for x in open(pred_path)])
        results[slim] = (tr["loss"], ev["loss"], ev["auc"], preds)

    # same trajectory: the codec is mathematically exact, but the decode
    # is fused into a different XLA program, so agreement is to float
    # accumulation tolerance (last-ulp), not bytes
    assert abs(results[False][0] - results[True][0]) < 1e-6
    assert abs(results[False][1] - results[True][1]) < 1e-6
    assert abs(results[False][2] - results[True][2]) < 1e-6
    np.testing.assert_allclose(results[False][3], results[True][3], atol=2e-6)


def test_slim_requires_static_fields(tmp_path):
    (tmp_path / "data").mkdir()
    cfg = _cfg(tmp_path, "m", slim_transfer=True, static_fields=0)
    with pytest.raises(ValueError, match="static_fields"):
        run_task(cfg)


def test_encode_decode_after_sparse_mapper():
    """Composition seam (VERDICT r2 item 1): the dedup mapper's remap
    keeps position == id for the static prefix and cat vals at 1.0, so
    encode(mapped) round-trips to exactly the mapped batch and the
    __uids_* array rides the wire untouched."""
    from tf_repos_tpu.data.sparse_batch import SparseBatchMapper
    from tf_repos_tpu.models.base import SparseSlot
    from tf_repos_tpu.train.sparse import UIDS_PREFIX

    b = _batch_with_padding()
    mapper = SparseBatchMapper(
        {"fm_wv": SparseSlot(("feat_ids",), 500, static=13)}
    )
    mapped = mapper({k: v.copy() for k, v in b.items()})
    slim = encode_batch(mapped, sf=13)
    assert UIDS_PREFIX + "fm_wv" in slim
    dec = decode_batch(slim, sf=13)
    for k in mapped:
        np.testing.assert_array_equal(np.asarray(dec[k]), mapped[k])


@pytest.mark.parametrize("pallas", [False, True])
def test_slim_composes_with_sparse_trajectory(tmp_path, pallas):
    """Full harness ON A MESH: sparse_table_update + static_fields with
    slim off vs on — same trajectory to float tolerance (incl. the
    --pallas_expand inner lookup, interpret-mode on the CPU rig). This
    is the composed headline configuration of VERDICT r2 items 1+2.
    The pallas variant uses a 2-device mesh: the TPU-semantics simulator
    plus XLA CPU's hard 40 s collective rendezvous deadline makes wider
    meshes flake-abort on this box (see test_pallas_sparse.py)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # few steps: the pallas variant runs the TPU-semantics simulator on
    # this CPU rig (~1 ms per simulated row move)
    write_synthetic_libsvm(str(data_dir / "tr.part0.libsvm"), 96, feature_size=500, seed=0)
    write_synthetic_libsvm(str(data_dir / "va.part0.libsvm"), 48, feature_size=500, seed=1)
    write_synthetic_libsvm(str(data_dir / "te.part0.libsvm"), 32, feature_size=500, seed=2)

    results = {}
    for slim in (False, True):
        tag = f"sp_slim{int(slim)}_pl{int(pallas)}"
        cfg = _cfg(
            tmp_path, tag, slim_transfer=slim, sparse_table_update=True,
            pallas_expand=pallas,
            mesh_data=1 if pallas else 2, mesh_model=2,
        )
        tr = run_task(cfg)
        ev = run_task(cfg.replace(task_type="eval"))
        pred_path = run_task(cfg.replace(task_type="infer"))
        preds = np.array([float(x) for x in open(pred_path)])
        results[slim] = (tr["loss"], ev["loss"], ev["auc"], preds)

    assert abs(results[False][0] - results[True][0]) < 1e-6
    assert abs(results[False][1] - results[True][1]) < 1e-6
    assert abs(results[False][2] - results[True][2]) < 1e-6
    np.testing.assert_allclose(results[False][3], results[True][3], atol=2e-6)
