"""Native columnar Avro score writer vs the per-record Python datum writer.

The two paths must produce record-identical OCFs (the reference writes the
same files through fastavro, io_utils.py:299-334); the native path is the hot
one for large score sets.
"""
import os
from types import SimpleNamespace

import numpy as np
import pytest

from gdmix_tpu import native
from gdmix_tpu.io import avro, scores

SP = SimpleNamespace(
    uid_column_name="uid",
    prediction_score_column_name="predictionScore",
    label_column_name="response",
    weight_column_name="weight",
    prediction_score_per_coordinate_column_name="predictionScorePerCoordinate",
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _rows(n, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        uids=rng.integers(-2**50, 2**50, n),
        scores=rng.standard_normal(n),
        scores_per_coordinate=rng.standard_normal(n),
        labels=rng.integers(0, 2, n).astype(np.float64),
        weights=rng.random(n) + 0.5,
    )


def test_native_writer_matches_python_writer(tmp_path, monkeypatch):
    rows = _rows(257)  # not a multiple of any block size
    fast = str(tmp_path / "fast.avro")
    slow = str(tmp_path / "slow.avro")
    assert scores.write_scores(fast, SP, **rows) == 257

    # force the per-record Python path for the oracle file
    monkeypatch.setattr(native, "encode_avro_column_blocks",
                        lambda *a, **k: None)
    assert scores.write_scores(slow, SP, **rows) == 257

    got = list(avro.read_records(fast))
    want = list(avro.read_records(slow))
    assert got == want
    # and the native reader agrees with the native writer
    cols = native.read_avro_columns(fast)
    assert np.array_equal(cols["uid"], rows["uids"])
    np.testing.assert_allclose(cols["weight"],
                               rows["weights"].astype(np.float32))


def test_native_writer_multiple_blocks(tmp_path):
    rows = _rows(1000)
    f = str(tmp_path / "b.avro")
    import gdmix_tpu.native as nat
    orig = nat.encode_avro_column_blocks
    nat_blocks = lambda schema, cols, present=None, block_records=65536: \
        orig(schema, cols, present, block_records=64)
    try:
        nat.encode_avro_column_blocks = nat_blocks
        assert scores.write_scores(f, SP, **rows) == 1000
    finally:
        nat.encode_avro_column_blocks = orig
    recs = list(avro.read_records(f))
    assert len(recs) == 1000
    assert recs[-1]["uid"] == int(rows["uids"][-1])


def test_nullable_present_mask_roundtrip(tmp_path):
    schema = {"name": "r", "type": "record", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "v", "type": ["null", "double"], "default": None}]}
    uid = np.arange(6, dtype=np.int64)
    v = np.arange(6, dtype=np.float64) * 1.5
    mask = np.array([1, 0, 1, 1, 0, 1], np.uint8)
    blocks = native.encode_avro_column_blocks(
        schema, {"uid": uid, "v": v}, present={"v": mask})
    f = str(tmp_path / "n.avro")
    avro.write_encoded_blocks(f, schema, blocks)
    recs = list(avro.read_records(f))
    assert [r["v"] for r in recs] == [0.0, None, 3.0, 4.5, None, 7.5]


def test_empty_input(tmp_path):
    f = str(tmp_path / "e.avro")
    assert scores.write_scores(f, SP, np.array([], np.int64),
                               np.array([], np.float64)) == 0
    assert list(avro.read_records(f)) == []


def test_unsupported_schema_falls_back():
    schema = {"name": "r", "type": "record", "fields": [
        {"name": "s", "type": "string"}]}
    assert native.encode_avro_column_blocks(schema, {"s": np.zeros(1)}) is None
