"""--map_workers: the host map chain on an ordered thread pool
(data/pipeline.parallel_mapped_batches) — the tf.data
map(num_parallel_calls=N) role (reference DeepFM.py:84).

Contract under test: stream order preserved; per-batch content identical
to the sequential chain (the mappers are content-pure; only pad widths
are stateful); output widths re-monotonized with the correct sentinels;
worker exceptions propagate; abandoning the iterator doesn't hang."""

import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.pipeline import parallel_mapped_batches
from tf_repos_tpu.data.sparse_batch import (
    MHC_IDX,
    MhCooPacker,
    SparseBatchMapper,
)
from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch, write_synthetic_aliccp
from tf_repos_tpu.models import create_model
from tf_repos_tpu.train.harness import run_task
from tf_repos_tpu.train.sparse import UIDS_PREFIX


def test_order_and_identity_map():
    it = [{"x": np.full((2,), i)} for i in range(20)]
    out = list(parallel_mapped_batches(iter(it), lambda: (lambda b: b), workers=4))
    assert [int(b["x"][0]) for b in out] == list(range(20))


def test_exception_propagates():
    def boom(b):
        if int(b["x"][0]) == 3:
            raise RuntimeError("boom")
        return b

    it = [{"x": np.full((2,), i)} for i in range(8)]
    with pytest.raises(RuntimeError, match="boom"):
        list(parallel_mapped_batches(iter(it), lambda: boom, workers=3))


def test_abandoned_iterator_does_not_hang():
    it = ({"x": np.full((2,), i)} for i in range(100))
    gen = parallel_mapped_batches(it, lambda: (lambda b: b), workers=3)
    for i, _ in enumerate(gen):
        if i == 5:
            break
    gen.close()  # must join the pool without blocking forever


def test_repad_monotonic_with_sentinels():
    # widths 4, 8, 2: the third batch must re-pad to 8 with the sentinel
    def batch(w):
        return {"u": np.arange(1, w + 1, dtype=np.int32)}

    out = list(parallel_mapped_batches(
        iter([batch(4), batch(8), batch(2)]), lambda: (lambda b: b),
        workers=2, pad_rules={"u": 99},
    ))
    assert [b["u"].shape[-1] for b in out] == [4, 8, 8]
    np.testing.assert_array_equal(out[2]["u"], [1, 2, 99, 99, 99, 99, 99, 99])


def _chain_factory(model, pad_mode="pow2:64"):
    slots = model.sparse_slots()
    groups = model.mh_coo_groups()

    def make():
        stages = [SparseBatchMapper(slots, pad_mode=pad_mode),
                  MhCooPacker(groups, n_data=1, floor=256)]

        def chain(b):
            for s in stages:
                b = s(b)
            return b

        return chain

    return make


def test_parallel_chain_content_matches_sequential():
    cfg = Config(
        model="ESMM", feature_size=800, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=16,
        multi_hot_pad=8, sparse_table_update=True,
    )
    model = create_model(cfg)
    raw = [
        synthetic_aliccp_batch(np.random.default_rng(i), 16, 800, multi_hot_pad=8)
        for i in range(12)
    ]
    # fixed floors force identical widths -> outputs must be bit-identical
    seq_chain = _chain_factory(model)()
    seq = [seq_chain(dict(b)) for b in raw]
    # the FULL harness pad_rules (train/harness._map_pad_rules): all
    # three COO keys re-monotonize — with the quarter-pow2 ladder,
    # worker-local bucket divergence is common, and an idx-only rule
    # leaves dest/w at worker widths (caught when the ladder landed)
    from tf_repos_tpu.data.sparse_batch import MHC_CDEST, MHC_DEST, MHC_W

    par = list(parallel_mapped_batches(
        iter([dict(b) for b in raw]), _chain_factory(model), workers=3,
        pad_rules={UIDS_PREFIX + "emb": 800, MHC_IDX: 0, MHC_DEST: 0,
                   MHC_W: 0.0, MHC_CDEST: 0},
    ))
    assert len(par) == len(seq)
    for s, p in zip(seq, par):
        assert set(s) == set(p)
        for k in s:
            np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(p[k]), err_msg=k)


# ------------------------------------------------------------- harness e2e
def test_harness_map_workers_matches_single(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_aliccp(str(d / "tr.samples.txt"), 200, feature_size=800, seed=0)
    write_synthetic_aliccp(str(d / "va.samples.txt"), 80, feature_size=800, seed=1)

    def run(workers, mdir):
        cfg = Config(
            model="ESMM", feature_size=800, field_size=11, embedding_size=4,
            deep_layers="8,4", dropout="1.0,1.0", batch_size=16, num_epochs=1,
            log_steps=5, learning_rate=0.01, data_dir=str(d),
            model_dir=str(tmp_path / mdir), dt_dir="x", eval_throttle_secs=0,
            # pad 16 with no bucket floor: the bucketer REALLY slices
            # (synthetic lengths 1..4 -> width 4 < pad 16) before the COO
            # packer — the round-3 advisor found the old pow2:8==pad
            # setting masked the mh_bucket x mh_coo composition entirely
            seed=7, multi_hot_pad=16, sparse_table_update=True, mh_coo=True,
            mh_bucket="pow2", steps_per_dispatch=2, map_workers=workers,
        )
        return run_task(cfg)

    m1 = run(1, "m1")
    m3 = run(3, "m3")
    np.testing.assert_allclose(m3["loss"], m1["loss"], rtol=1e-5)
    for k in ("CTR_AUC", "CVR_AUC", "CTCVR_AUC"):
        np.testing.assert_allclose(m3[k], m1[k], atol=1e-5)
