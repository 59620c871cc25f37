"""TFRecord container compatibility (data/tfrecord.py): the reference's
materialized format (get_aliccp_tfrecord.py:38-102) must feed
AliccpDataset and produce batches identical to the sample-line path —
the migration path for users holding ~500 GB of reference TFRecords
(DeepMTL/README.md:33)."""

import numpy as np
import pytest

from tf_repos_tpu.data import tfrecord as TFR
from tf_repos_tpu.data.ragged import AliccpDataset, parse_aliccp_lines
from tf_repos_tpu.data.synthetic import write_synthetic_aliccp


def test_record_framing_roundtrip_and_crc(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    payloads = [b"alpha", b"", b"x" * 10_000]
    TFR.write_records(path, payloads)
    assert list(TFR.iter_records(path)) == payloads
    # flip a payload byte -> loud CRC failure
    blob = bytearray(open(path, "rb").read())
    blob[20] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        list(TFR.iter_records(path))


def test_example_roundtrip_matches_line_parser(tmp_path):
    """line -> Example -> batch == line -> batch, row by row (incl.
    absent-field defaults and multi-hot padding)."""
    lines = [
        b"1,1,0,101:7:1.0 121:9:1.0 206:44:1.0 109_14:33:2.3979 "
        b"109_14:35:1.7 210:50:1.0 210:51:1.0",
        b"2,0,0,205:12:1.0 207:88:1.0 216:77:1.0 110_14:40:0.5",
        b"3,1,1,101:5:1.0",
    ]
    examples = [TFR.example_from_sample_line(ln) for ln in lines]
    assert all(e is not None for e in examples)
    got = TFR.parse_aliccp_examples(examples, multi_hot_pad=8)
    want = parse_aliccp_lines(lines, multi_hot_pad=8)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_malformed_line_dropped_like_reference():
    # the reference converter skips lines without 4 comma-fields
    assert TFR.example_from_sample_line(b"no-commas-here") is None


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("packed", [False, True])
def test_aliccp_dataset_tfrecord_batches_identical(tmp_path, shuffle, packed):
    """AliccpDataset over the converted .tfrecord store yields byte-
    identical batches to the sample-line path (same rng stream -> same
    shuffle order), including the padded partial batch, on both the
    streaming and the --packed_cache paths."""
    src = str(tmp_path / "tr.samples")
    write_synthetic_aliccp(src, 300, feature_size=500, multi_hot=3, seed=1)
    (tmp_path / "rec").mkdir(exist_ok=True)
    rec = TFR.convert_sample_file(src, str(tmp_path / "rec" / "tr.tfrecord"))

    kw = dict(
        batch_size=32, num_epochs=2, perform_shuffle=shuffle,
        shuffle_buffer=64, seed=5, multi_hot_pad=8, packed_cache=packed,
    )
    a = list(AliccpDataset([src], **kw))
    b = list(AliccpDataset([rec], **kw))
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_mixed_inputs_rejected(tmp_path):
    src = str(tmp_path / "tr.samples")
    write_synthetic_aliccp(src, 10, feature_size=100, seed=0)
    rec = TFR.convert_sample_file(src)
    with pytest.raises(ValueError, match="mixed"):
        AliccpDataset([src, rec], batch_size=4)


def test_harness_trains_from_tfrecord(tmp_path):
    """End-to-end: ESMM trains from a reference-format .tfrecord store
    with the same trajectory as from the sample lines it was converted
    from."""
    from tf_repos_tpu.config import Config
    from tf_repos_tpu.train.harness import run_task

    lines_dir = tmp_path / "lines"
    rec_dir = tmp_path / "rec"
    lines_dir.mkdir()
    rec_dir.mkdir()
    write_synthetic_aliccp(str(lines_dir / "tr.part0"), 200, feature_size=400, seed=2)
    write_synthetic_aliccp(str(lines_dir / "va.part0"), 80, feature_size=400, seed=3)
    TFR.convert_sample_file(
        str(lines_dir / "tr.part0"), str(rec_dir / "tr.part0.tfrecord")
    )
    TFR.convert_sample_file(
        str(lines_dir / "va.part0"), str(rec_dir / "va.part0.tfrecord")
    )

    res = {}
    for tag, d in (("lines", lines_dir), ("rec", rec_dir)):
        cfg = Config(
            model="esmm", feature_size=400, field_size=11, embedding_size=4,
            deep_layers="8,4", dropout="1.0,1.0", batch_size=32, num_epochs=1,
            log_steps=4, learning_rate=0.01, multi_hot_pad=8,
            data_dir=str(d), model_dir=str(tmp_path / f"m_{tag}"), dt_dir="x",
            eval_throttle_secs=0, seed=9,
        )
        res[tag] = run_task(cfg)
    assert abs(res["lines"]["loss"] - res["rec"]["loss"]) < 1e-6
