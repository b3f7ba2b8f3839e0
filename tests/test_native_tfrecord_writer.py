"""Native TFRecord encoders must be byte-identical to the python writers
(framing, masked crc32c, proto field order — reference writes these files
through TF's C++ kernels; we assert against our python codec which is itself
TF-interop-tested in test_tfrecord_proto.py)."""
import json
import os

import numpy as np
import pytest

from gdmix_tpu import native
from gdmix_tpu.io import input_pipeline as ip
from gdmix_tpu.io.metadata import DatasetMetadata

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _groups(E, padded, seed=0):
    rng = np.random.RandomState(seed)
    groups, uid = [], 0
    for e in range(E):
        n = int(rng.randint(1, 9))
        g = ip.EntityGroup(
            entity_id=str(e + 50),
            columns={"uid": np.arange(uid, uid + n, dtype=np.int64),
                     "response": rng.randint(0, 2, n).astype(np.float64),
                     "weight": (rng.rand(n) + 0.5)})
        if padded:
            k = 4
            g.padded_indices = rng.randint(0, 100, (n, k)).astype(np.int64)
            g.padded_values = rng.randn(n, k)
            g.rec_nnz = rng.randint(1, k + 1, n).astype(np.int32)
            pad = np.arange(k)[None, :] >= g.rec_nnz[:, None]
            g.padded_indices[pad] = 0
            g.padded_values[pad] = 0.0
        else:
            g.ragged_indices = [
                rng.randint(0, 100, rng.randint(0, 5)).astype(np.int64)
                for _ in range(n)]
            g.ragged_values = [rng.randn(len(i)) for i in g.ragged_indices]
        groups.append(g)
        uid += n
    return groups


@pytest.mark.parametrize("padded", [True, False])
@pytest.mark.parametrize("entity_dtype", ["long", "string"])
def test_grouped_writer_byte_identical(tmp_path, monkeypatch, padded,
                                       entity_dtype):
    groups = _groups(50, padded)
    fast = str(tmp_path / "fast.tfrecord")
    slow = str(tmp_path / "slow.tfrecord")
    assert ip.write_per_entity_grouped(fast, groups, "user_id", entity_dtype,
                                       "bag") == 50
    monkeypatch.setattr(native, "encode_grouped_records",
                        lambda *a, **k: None)
    assert ip.write_per_entity_grouped(slow, groups, "user_id", entity_dtype,
                                       "bag") == 50
    assert open(fast, "rb").read() == open(slow, "rb").read()


def test_grouped_writer_no_bag_byte_identical(tmp_path, monkeypatch):
    groups = _groups(20, padded=True)
    for g in groups:
        g.padded_indices = g.padded_values = g.rec_nnz = None
    fast = str(tmp_path / "f"); slow = str(tmp_path / "s")
    ip.write_per_entity_grouped(fast, groups, "user_id", "long", None)
    monkeypatch.setattr(native, "encode_grouped_records",
                        lambda *a, **k: None)
    ip.write_per_entity_grouped(slow, groups, "user_id", "long", None)
    assert open(fast, "rb").read() == open(slow, "rb").read()


def test_per_record_writer_byte_identical(tmp_path, monkeypatch):
    rng = np.random.RandomState(1)
    md = {"features": [
        {"name": "bag", "dtype": "float", "shape": [100], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "float", "shape": [],
                    "isSparse": False}]}
    mdf = str(tmp_path / "md.json")
    json.dump(md, open(mdf, "w"))
    metadata = DatasetMetadata.from_file(mdf)
    n = 300
    cols = {"uid": np.arange(n, dtype=np.int64),
            "response": rng.randint(0, 2, n).astype(np.float64),
            "weight": rng.rand(n) + 0.5}
    ri = [rng.randint(0, 100, rng.randint(0, 5)).astype(np.int64)
          for _ in range(n)]
    rv = [rng.randn(len(i)) for i in ri]
    fast = str(tmp_path / "f"); slow = str(tmp_path / "s")
    assert ip.write_per_record(fast, metadata, cols, "bag", ri, rv) == n
    monkeypatch.setattr(native, "encode_per_record", lambda *a, **k: None)
    assert ip.write_per_record(slow, metadata, cols, "bag", ri, rv) == n
    assert open(fast, "rb").read() == open(slow, "rb").read()


def test_native_writer_roundtrips_through_native_reader(tmp_path):
    groups = _groups(30, padded=True, seed=7)
    data_dir = tmp_path / "data"   # data dirs hold only record files
    data_dir.mkdir()
    ip.write_per_entity_grouped(str(data_dir / "g.tfrecord"), groups,
                                "user_id", "long", "bag")
    md = {"features": [
        {"name": "bag", "dtype": "float", "shape": [100], "isSparse": True},
        {"name": "user_id", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "float", "shape": [],
                    "isSparse": False}]}
    mdf = str(tmp_path / "md.json")
    json.dump(md, open(mdf, "w"))
    metadata = DatasetMetadata.from_file(mdf)
    fg = ip.load_per_entity_grouped_flat(str(data_dir), metadata, "user_id",
                                         "bag")
    assert fg is not None and len(fg) == 30
    assert list(fg.entity_ids) == [g.entity_id for g in groups]
    np.testing.assert_array_equal(
        fg.counts, [g.sample_count for g in groups])
    np.testing.assert_array_equal(
        fg.columns["uid"], np.concatenate([g.columns["uid"] for g in groups]))
    # float32 wire round trip for values
    want = np.concatenate([g.padded_values for g in groups]).astype(np.float32)
    np.testing.assert_array_equal(fg.values[:, :4].astype(np.float32), want)


def test_corrupt_tfrecords_never_crash(tmp_path):
    """Truncated/corrupted TFRecord buffers must fail cleanly (None), never
    segfault. Regression: pointer-overflow on huge corrupt varints, and
    records with no context field crashed the fill shape assumptions."""
    groups = _groups(3, padded=True, seed=2)
    f = str(tmp_path / "g.tfrecord")
    ip.write_per_entity_grouped(f, groups, "user_id", "string", "bag")
    buf = open(f, "rb").read()
    rng = np.random.RandomState(5)
    for i in range(0, len(buf), 3):
        native.parse_per_entity_grouped(buf[:i], ["uid", "response"],
                                        "user_id", "bag")
        native.parse_per_record(buf[:i], ["uid", "response"], "bag")
    for _ in range(500):
        b = bytearray(buf)
        for _ in range(rng.randint(1, 5)):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        native.parse_per_entity_grouped(bytes(b), ["uid", "response"],
                                        "user_id", "bag")
        native.parse_per_record(bytes(b), ["uid", "response"], "bag")
