"""Cross-topology checkpoint restore (SURVEY §5 slice-restart; VERDICT r3
item 4): a checkpoint written under one device mesh must restore EXACTLY
and CONTINUE TRAINING under a different mesh — the slice-restart reality
(a preempted 4x2 pod slice comes back as 2x4 or degraded) and the
train→serve handoff (train sharded, serve on one chip).

Why it works: restore_or_init builds the NEW topology's abstract state
(init_train_state shards params/opt per the current mesh's specs) and
Orbax StandardRestore reshards the stored arrays onto it.

Asserted here:
  (1) the restored tree under every target mesh is BITWISE equal to the
      tree saved under the source mesh (dense AND sparse/fused-moments
      opt state);
  (2) training continues from the restored step under the new mesh
      (step count advances across the re-topology, finite loss).
One-step loss equality of the sharded step itself across topologies is
asserted by __graft_entry__.dryrun_multichip's mesh sweep (same global
batch -> same loss on (8,1)/(4,2)/(2,4)); batch-for-batch trajectory
equality across RUNS is not well-defined here because the train shuffle
stream restarts with the process."""

import jax
import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.synthetic import write_synthetic_libsvm
from tf_repos_tpu.train.checkpoint import CheckpointManager
from tf_repos_tpu.train.harness import Harness, run_task


@pytest.fixture
def workdir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_libsvm(str(d / "tr.libsvm"), 224, feature_size=512, seed=0)
    write_synthetic_libsvm(str(d / "va.libsvm"), 96, feature_size=512, seed=1)
    return tmp_path


def _cfg(workdir, mesh, tag, **kw):
    base = dict(
        model="DeepFM", feature_size=512, field_size=39, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
        log_steps=5, learning_rate=0.01, data_dir=str(workdir / "data"),
        model_dir=str(workdir / tag), dt_dir="d", eval_throttle_secs=0,
        seed=7, mesh_data=mesh[0], mesh_model=mesh[1],
    )
    base.update(kw)
    return Config(**base)


def _host_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# (4,2) -> each target exercises a different restore reshard:
#   (2,4): both axes change (row-shard split 2->4, data 4->2)
#   (8,1): model axis collapses to replicated (the all-data slice shape)
#   (1,1): single-device-shaped mesh (the train->serve handoff)
TARGETS = [(2, 4), (8, 1), (1, 1)]


EXTRAS = {
    "dense": {},
    "sparse": dict(sparse_table_update=True, fused_moments=True),
    # the [V_local,3K] w|m|v tree (mesh-aware --fused_table, round 5)
    "fused_table": dict(sparse_table_update=True, fused_table=True),
}


@pytest.mark.parametrize("variant", list(EXTRAS))
def test_restore_is_exact_under_every_mesh_and_training_continues(
    workdir, variant
):
    extra = EXTRAS[variant]
    tag = f"m_{variant}"

    # epoch 1 under the source mesh (4,2)
    m1 = run_task(_cfg(workdir, (4, 2), tag, **extra))

    # reference: what the source topology itself restores
    h_src = Harness(_cfg(workdir, (4, 2), tag, **extra))
    ck = CheckpointManager(h_src.model_dir)
    ref = _host_tree(h_src.restore_or_init(ck))
    ck.close()
    assert ref["step"] == m1["step"]

    for target in TARGETS:
        h = Harness(_cfg(workdir, target, tag, **extra))
        ck = CheckpointManager(h.model_dir)
        got = _host_tree(h.restore_or_init(ck))
        ck.close()
        flat_ref, tdef_ref = jax.tree.flatten(ref)
        flat_got, tdef_got = jax.tree.flatten(got)
        assert tdef_ref == tdef_got, target
        for a, b in zip(flat_ref, flat_got):
            np.testing.assert_array_equal(a, b, err_msg=str(target))

    # continuation: one more epoch under the most-different topology
    m2 = run_task(_cfg(workdir, (2, 4), tag, **extra))
    assert m2["step"] == 2 * m1["step"]
    assert np.isfinite(m2["loss"]) and 0.0 <= m2["auc"] <= 1.0

    # train->serve handoff: eval restores the sharded checkpoint on the
    # single-device-shaped mesh
    ev = run_task(_cfg(workdir, (1, 1), tag, task_type="eval", **extra))
    assert np.isfinite(ev["loss"]) and 0.0 <= ev["auc"] <= 1.0
