"""--slim_transfer for the Ali-CCP wire (data/slim_wire.py Ali-CCP
section): binary multi-hot vals dropped under a first-batch-committed,
per-batch-validated contract; id fields narrowed to uint16 under the
uids-bucket/vocab bound; label alias rebuilt on device. Mathematically
exact codec; composes with --sparse_table_update and --mh_coo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_repos_tpu.config import Config
from tf_repos_tpu.data.slim_wire import (
    ALICCP_VAL_GROUPS,
    AliccpSlimEncoder,
    decode_aliccp_batch,
)
from tf_repos_tpu.data.sparse_batch import (
    MHC_IDX,
    MHC_W,
    MhCooPacker,
    SparseBatchMapper,
)
from tf_repos_tpu.data.synthetic import synthetic_aliccp_batch, write_synthetic_aliccp
from tf_repos_tpu.models import create_model


def _batch(seed=0, b=8, v=400, pad=4):
    return synthetic_aliccp_batch(np.random.default_rng(seed), b, v, multi_hot_pad=pad)


def _decode_np(wire):
    dec = decode_aliccp_batch({k: jnp.asarray(v) for k, v in wire.items()})
    return {k: np.asarray(v) for k, v in dec.items()}


def test_roundtrip_exact_dense_batch():
    """encode -> decode reproduces the full reader batch EXACTLY
    (synthetic vals are the binary live mask, so they all drop)."""
    b = _batch()
    enc = AliccpSlimEncoder(vocab=400)
    wire = enc(dict(b))
    # binary vals dropped; ids narrowed (vocab 400 < 2^16); label dropped
    for f in ALICCP_VAL_GROUPS:
        assert f + "vals" not in wire
    assert wire["feat_ids"].dtype == np.uint16
    assert "label" not in wire
    dec = _decode_np(wire)
    for k, v in b.items():
        np.testing.assert_array_equal(dec[k], np.asarray(v), err_msg=k)
        assert dec[k].dtype == np.asarray(v).dtype, k


def test_no_narrowing_above_uint16_bound():
    b = _batch(v=200_000)
    wire = AliccpSlimEncoder(vocab=200_000)(dict(b))
    assert wire["feat_ids"].dtype == np.int32
    dec = _decode_np(wire)
    np.testing.assert_array_equal(dec["feat_ids"], b["feat_ids"])


def test_real_valued_vals_ride_the_wire_exactly():
    b = _batch()
    b["u_catvals"] = b["u_catvals"] * np.float32(2.5)  # non-binary
    enc = AliccpSlimEncoder(vocab=400)
    wire = enc(dict(b))
    assert "u_catvals" in wire  # committed non-droppable
    assert "u_shopvals" not in wire  # still binary, still dropped
    dec = _decode_np(wire)
    np.testing.assert_array_equal(dec["u_catvals"], b["u_catvals"])
    np.testing.assert_array_equal(dec["u_shopvals"], b["u_shopvals"])


def test_contract_violation_fails_loudly():
    enc = AliccpSlimEncoder(vocab=400)
    enc(dict(_batch(seed=0)))  # commits u_catvals as droppable
    bad = dict(_batch(seed=1))
    bad["u_catvals"] = bad["u_catvals"] * np.float32(3.0)
    with pytest.raises(ValueError, match="u_catvals"):
        enc(bad)


def test_roundtrip_after_mapper_and_coo_packer():
    """The composed train wire: mapper -> COO packer -> slim encoder;
    decode reproduces the packed batch exactly (w from idx>0 via the
    id0<->position0 seeding)."""
    cfg = Config(
        model="ESMM", feature_size=400, field_size=11, embedding_size=4,
        deep_layers="8,4", dropout="1.0,1.0", batch_size=8, multi_hot_pad=4,
    )
    model = create_model(cfg)
    mapper = SparseBatchMapper(model.sparse_slots())
    packer = MhCooPacker(model.mh_coo_groups())
    enc = AliccpSlimEncoder(vocab=400)
    for seed in range(3):
        packed = packer(mapper(_batch(seed=seed)))
        wire = enc(dict(packed))
        assert MHC_W not in wire  # binary w reconstructs from idx>0
        assert wire[MHC_IDX].dtype == np.uint16
        dec = _decode_np(wire)
        for k, v in packed.items():
            np.testing.assert_array_equal(dec[k], np.asarray(v), err_msg=k)


def test_remainder_pad_rows_roundtrip():
    """Reader-style zero-padded remainder rows (mask=0) survive the
    codec: ids 0 -> vals 0."""
    b = _batch(b=8)
    for k, v in b.items():
        z = np.zeros_like(np.asarray(v))
        b[k] = np.concatenate([np.asarray(v)[:5], z[:3]])
    b["mask"][:5] = 1.0
    wire = AliccpSlimEncoder(vocab=400)(dict(b))
    dec = _decode_np(wire)
    for k, v in b.items():
        np.testing.assert_array_equal(dec[k], np.asarray(v), err_msg=k)


# --------------------------------------------------------------- harness
@pytest.mark.parametrize("model,extra", [
    ("ESMM", dict(sparse_table_update=True, mh_coo=True)),
    ("ESMM", dict(sparse_table_update=True)),
    ("DIN", dict()),
])
def test_harness_slim_aliccp_matches_dense_wire(tmp_path, model, extra):
    """Full-harness training over the Ali-CCP slim wire == the dense
    wire (same seed/data): the codec is exact, trajectories agree to
    float-accumulation tolerance (the decode fuses into a different XLA
    program)."""
    from tf_repos_tpu.train.harness import run_task

    d = tmp_path / "data"
    d.mkdir()
    write_synthetic_aliccp(str(d / "tr.samples.txt"), 192, feature_size=400, seed=0)
    write_synthetic_aliccp(str(d / "va.samples.txt"), 64, feature_size=400, seed=1)

    def run(slim: bool, tag: str):
        return run_task(Config(
            model=model, feature_size=400, field_size=11, embedding_size=4,
            deep_layers="8,4", dropout="1.0,1.0", batch_size=32,
            learning_rate=0.01, l2_reg=1e-4, optimizer="Adam",
            num_epochs=1, multi_hot_pad=4, slim_transfer=slim,
            data_dir=str(d), model_dir=str(tmp_path / tag), dt_dir="x",
            log_steps=4, eval_throttle_secs=0, seed=7, **extra,
        ))

    m_slim = run(True, "slim")
    m_full = run(False, "full")
    assert m_slim["step"] == m_full["step"]
    assert abs(m_slim["loss"] - m_full["loss"]) < 2e-5
    for k in m_full:
        if k.endswith("AUC") or k == "auc":
            assert abs(m_slim[k] - m_full[k]) < 1e-4, k


def test_slim_transfer_rejected_for_csv(tmp_path):
    from tf_repos_tpu.train.harness import Harness

    with pytest.raises(ValueError, match="libsvm and aliccp"):
        Harness(Config(
            model="wide_n_deep", feature_size=0, field_size=39,
            embedding_size=4, deep_layers="8,4", dropout="1.0,1.0",
            slim_transfer=True, model_dir=str(tmp_path), dt_dir="x",
        ))


def test_coo_counts_compression_roundtrip():
    """Round 5 (VERDICT r4 item 4): MHC_DEST replaced by per-(field,row)
    counts; decode rebuilds idx/dest/w BIT-EXACT including pad slots."""
    from tf_repos_tpu.data.slim_wire import MHC_CNT
    from tf_repos_tpu.data.sparse_batch import MHC_DEST

    cfg = Config(model="ESMM", feature_size=400, field_size=11,
                 embedding_size=4, deep_layers="8,4", dropout="1.0,1.0",
                 batch_size=8, multi_hot_pad=4)
    model = create_model(cfg)
    mapper = SparseBatchMapper(model.sparse_slots())
    packer = MhCooPacker(model.mh_coo_groups(), n_data=2, floor=8)
    enc = AliccpSlimEncoder(vocab=400, n_groups=len(model.mh_coo_groups()))
    for seed in range(3):
        b = packer(mapper(_batch(seed)))
        ref = {k: np.asarray(v).copy() for k, v in b.items()}
        wire = enc(dict(b))
        assert MHC_CNT in wire and MHC_DEST not in wire
        assert wire[MHC_CNT].dtype == np.uint16
        assert wire[MHC_CNT].shape == (2, len(model.mh_coo_groups()), 4)
        dec = _decode_np(wire)
        for k in (MHC_IDX, MHC_DEST, MHC_W):
            np.testing.assert_array_equal(dec[k], ref[k], err_msg=k)


@pytest.mark.parametrize("bound,form", [(1 << 17, "bits"), (1 << 20, "u8")])
def test_coo_idx_lo_hi_split_roundtrip(bound, form):
    """idx above the u16 bound splits into u16 low bits + packed (or u8)
    high bits; decode is bit-exact. The bound comes from the uids-array
    SHAPE, so the form is trace-stable per bucket."""
    from tf_repos_tpu.data.slim_wire import MHC_CNT, MHC_HI, MHC_LO
    from tf_repos_tpu.data.sparse_batch import MHC_DEST

    rng = np.random.default_rng(0)
    nd, ngr, bs, m = 1, 3, 4, 64
    counts = rng.integers(0, 5, size=(nd, ngr, bs))
    dv = (np.arange(bs)[None, :] * ngr + np.arange(ngr)[:, None]).reshape(-1)
    live = int(counts[0].sum())
    dest = np.zeros((nd, m), np.int32)
    dest[0, :live] = np.repeat(dv, counts[0].reshape(-1))
    idx = np.zeros((nd, m), np.int32)
    # include a live slot whose LOW 16 bits are zero (the u16-view trap)
    vals = rng.integers(1, bound, size=live)
    if live:
        vals[0] = 1 << 16
    idx[0, :live] = vals
    w = (idx > 0).astype(np.float32)
    batch = {
        "y": np.zeros(nd * bs, np.float32),
        "z": np.zeros(nd * bs, np.float32),
        "__uids_emb": np.zeros(bound, np.int32),  # sets the bound
        MHC_IDX: idx, MHC_DEST: dest, MHC_W: w,
    }
    enc = AliccpSlimEncoder(vocab=bound, n_groups=ngr)
    wire = enc(dict(batch))
    assert MHC_LO in wire and MHC_IDX not in wire and MHC_CNT in wire
    assert wire[MHC_LO].dtype == np.uint16
    if form == "bits":
        assert wire[MHC_HI].shape[-1] == m // 8  # 1 bit/slot
    else:
        assert wire[MHC_HI].shape[-1] == m  # u8/slot
    dec = _decode_np(wire)
    np.testing.assert_array_equal(dec[MHC_IDX], idx)
    np.testing.assert_array_equal(dec[MHC_DEST], dest)
    np.testing.assert_array_equal(dec[MHC_W], w)


def test_coo_counts_multihost_gate_and_fallback():
    """compress_coo=False (multi-host) keeps the raw idx/dest wire (the
    packer's small counts/cdest arrays ride along — they are host-local
    and enable the sorted-window attention path under multi-host); a
    dest stream that is not field-major falls back without committing
    AND drops the packer's counts/cdest (they rest on the same order
    assumption)."""
    from tf_repos_tpu.data.slim_wire import MHC_CNT
    from tf_repos_tpu.data.sparse_batch import MHC_CDEST, MHC_DEST

    cfg = Config(model="ESMM", feature_size=400, field_size=11,
                 embedding_size=4, deep_layers="8,4", dropout="1.0,1.0",
                 batch_size=8, multi_hot_pad=4)
    model = create_model(cfg)
    mapper = SparseBatchMapper(model.sparse_slots())
    packer = MhCooPacker(model.mh_coo_groups(), n_data=1, floor=8)
    b = packer(mapper(_batch(0)))
    wire = AliccpSlimEncoder(
        vocab=400, compress_coo=False, n_groups=len(model.mh_coo_groups())
    )(dict(b))
    assert MHC_DEST in wire and MHC_CNT in wire and MHC_CDEST in wire
    # scrambled dest order -> falls back (dest kept, counts dropped),
    # still decodes
    b2 = packer(mapper(_batch(1)))
    d = np.asarray(b2[MHC_DEST]).copy()
    nlive = int(np.flatnonzero(np.asarray(b2[MHC_IDX])[0]).max()) + 1
    d[0, :nlive] = d[0, :nlive][::-1]  # reverse the live prefix
    b2[MHC_DEST] = d
    wire2 = AliccpSlimEncoder(
        vocab=400, n_groups=len(model.mh_coo_groups())
    )(dict(b2))
    assert MHC_CNT not in wire2 and MHC_DEST in wire2
    assert MHC_CDEST not in wire2


def test_shared_wire_state_across_encoders():
    """--map_workers: per-worker encoders share first-batch commitments
    through SharedWireState — a second encoder must ADOPT the first's
    droppable-vals verdict (and fail loudly on a contradicting stream)
    instead of committing its own."""
    from tf_repos_tpu.data.slim_wire import AliccpSlimEncoder, SharedWireState

    cfg = Config(model="ESMM", feature_size=400, field_size=11,
                 embedding_size=4, deep_layers="8,4", dropout="1.0,1.0",
                 batch_size=8, multi_hot_pad=4)
    model = create_model(cfg)
    mapper = SparseBatchMapper(model.sparse_slots())
    sws = SharedWireState()
    enc1 = AliccpSlimEncoder(400, n_groups=len(model.mh_coo_groups()), shared=sws)
    enc2 = AliccpSlimEncoder(400, n_groups=len(model.mh_coo_groups()), shared=sws)
    b1 = mapper(_batch(0))  # synthetic vals are the binary live mask
    w1 = enc1(dict(b1))
    assert "u_catvals" not in w1  # committed droppable
    # a contradicting batch through the OTHER encoder instance
    b2 = dict(mapper(_batch(1)))
    b2["u_catvals"] = np.asarray(b2["u_catvals"]) * 2.0
    with pytest.raises(ValueError, match="binary live mask"):
        enc2(b2)
    # and a conforming batch through enc2 encodes fine
    w2 = enc2(dict(mapper(_batch(2))))
    assert "u_catvals" not in w2
