"""Native (C++) TFRecord decoder parity tests vs the pure-Python codec."""
import os
import time

import numpy as np
import pytest

from gdmix_tpu import native
from gdmix_tpu.io.input_pipeline import read_per_record, write_per_record
from gdmix_tpu.io.metadata import DatasetMetadata

MD = DatasetMetadata.from_json({
    "features": [
        {"name": "bag", "dtype": "float", "shape": [50], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False},
        {"name": "offset", "dtype": "float", "shape": [], "isSparse": False}],
    "labels": [{"name": "response", "dtype": "int", "shape": [],
                "isSparse": False}]})


def _write(tmp_path, n=500, seed=0, suffix=""):
    rng = np.random.RandomState(seed)
    columns = {
        "uid": rng.randint(0, 2**60, n).astype(np.int64),
        "weight": rng.rand(n).astype(np.float32),
        "offset": rng.randn(n).astype(np.float32),
        "response": rng.randint(0, 2, n).astype(np.int64),
    }
    ragged_idx = []
    ragged_val = []
    for i in range(n):
        k = rng.randint(0, 7)
        ragged_idx.append(np.sort(rng.choice(50, k, replace=False)).astype(np.int64))
        ragged_val.append(rng.randn(k))
    d = str(tmp_path)
    path = os.path.join(d, f"data.tfrecord{suffix}")
    write_per_record(path, MD, columns, "bag", ragged_idx, ragged_val)
    return d


def test_native_builds():
    assert native.available(), "native library failed to build/load"


@pytest.mark.parametrize("suffix", ["", ".gz", ".deflate"])
def test_native_matches_python(tmp_path, suffix):
    d = _write(tmp_path, suffix=suffix)
    py = read_per_record(d, MD, "bag", use_native=False)
    nat = read_per_record(d, MD, "bag", use_native=True)
    assert nat.num_samples == py.num_samples
    for name in py.columns:
        np.testing.assert_array_equal(nat.columns[name], py.columns[name],
                                      err_msg=name)
    np.testing.assert_array_equal(nat.nnz, py.nnz)
    for i in range(py.num_samples):
        m = py.nnz[i]
        np.testing.assert_array_equal(nat.indices[i, :m], py.indices[i, :m])
        np.testing.assert_allclose(nat.values[i, :m], py.values[i, :m],
                                   atol=1e-12)
        assert np.all(nat.values[i, m:] == 0)


def test_native_speedup(tmp_path):
    d = _write(tmp_path, n=5000)
    t0 = time.time()
    read_per_record(d, MD, "bag", use_native=False)
    t_py = time.time() - t0
    t0 = time.time()
    read_per_record(d, MD, "bag", use_native=True)
    t_nat = time.time() - t0
    print(f"python {t_py:.3f}s native {t_nat:.3f}s speedup {t_py / t_nat:.1f}x")
    assert t_nat < t_py  # conservatively: at least not slower


# --- native avro flat-record decoder ------------------------------------------

def test_native_avro_matches_python(tmp_path):
    from gdmix_tpu import native
    from gdmix_tpu.io import avro
    from gdmix_tpu.io.scores import read_scores, write_scores
    from gdmix_tpu.params import SchemaParams
    if native._load_avro() is None:
        pytest.skip("native avro unavailable")
    sp = SchemaParams(uid_column_name="uid", label_column_name="response",
                      weight_column_name="weight",
                      prediction_score_column_name="predictionScore")
    rng = np.random.RandomState(3)
    n = 500
    uids = rng.randint(0, 2**60, n)
    scores = rng.randn(n)
    labels = rng.randint(0, 2, n).astype(float)
    weights = rng.rand(n)
    pc = rng.randn(n)
    f = os.path.join(str(tmp_path), "part-00000.avro")
    write_scores(f, sp, uids, scores, scores_per_coordinate=pc,
                 labels=labels, weights=weights)

    cols = native.read_avro_columns(f)
    assert cols is not None
    np.testing.assert_array_equal(cols["uid"], np.sort(uids)[np.argsort(np.argsort(uids))])
    np.testing.assert_allclose(cols["predictionScore"], np.float32(scores),
                               rtol=1e-6)
    np.testing.assert_allclose(cols["response"], np.float32(labels))
    np.testing.assert_allclose(cols["predictionScorePerCoordinate"],
                               np.float32(pc), rtol=1e-6)

    # the read_scores wrapper returns identical data via either path
    got_native = read_scores(str(tmp_path), sp)
    import gdmix_tpu.native as nat
    saved = nat.read_avro_columns
    nat.read_avro_columns = lambda *_: None   # force python fallback
    try:
        got_py = read_scores(str(tmp_path), sp)
    finally:
        nat.read_avro_columns = saved
    for k in got_py:
        np.testing.assert_allclose(got_native[k].astype(np.float64),
                                   got_py[k].astype(np.float64), rtol=1e-6,
                                   err_msg=k)


def test_native_avro_deflate_and_nulls(tmp_path):
    from gdmix_tpu import native
    from gdmix_tpu.io import avro
    if native._load_avro() is None:
        pytest.skip("native avro unavailable")
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "v", "type": ["null", "float"], "default": None},
        {"name": "tag", "type": "string"}]}
    recs = [{"uid": i, "v": None if i % 3 == 0 else float(i), "tag": f"t{i}"}
            for i in range(100)]
    f = os.path.join(str(tmp_path), "d.avro")
    avro.write_records(f, schema, recs, codec="deflate")
    cols = native.read_avro_columns(f)
    assert cols is not None and "tag" not in cols
    np.testing.assert_array_equal(cols["uid"], np.arange(100))
    for i in range(100):
        if i % 3 == 0:
            assert np.isnan(cols["v"][i])
        else:
            assert cols["v"][i] == float(i)


# --- grouped SequenceExample decoder --------------------------------------

GMD = DatasetMetadata.from_json({
    "features": [
        {"name": "per_user", "dtype": "float", "shape": [40], "isSparse": True},
        {"name": "user_id", "dtype": "string", "shape": [], "isSparse": False},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False},
        {"name": "offset", "dtype": "float", "shape": [], "isSparse": False}],
    "labels": [{"name": "response", "dtype": "int", "shape": [],
                "isSparse": False}]})


def _write_grouped(tmp_path, num_entities=40, seed=3, suffix=""):
    from gdmix_tpu.io.input_pipeline import EntityGroup, write_per_entity_grouped
    rng = np.random.RandomState(seed)
    groups = []
    for e in range(num_entities):
        n = rng.randint(1, 9)
        cols = {
            "uid": rng.randint(0, 2**60, n).astype(np.int64),
            "weight": rng.rand(n).astype(np.float32),
            "offset": rng.randn(n).astype(np.float32),
            "response": rng.randint(0, 2, n).astype(np.int64),
        }
        g = EntityGroup(entity_id=f"user{e}", columns=cols)
        for _ in range(n):
            k = rng.randint(0, 6)
            g.ragged_indices.append(
                np.sort(rng.choice(40, k, replace=False)).astype(np.int64))
            g.ragged_values.append(rng.randn(k))
        groups.append(g)
    d = str(tmp_path)
    path = os.path.join(d, f"grouped.tfrecord{suffix}")
    write_per_entity_grouped(path, groups, "user_id", "string", "per_user")
    return d


def _norm_group(g):
    """(entity_id, columns, per-record (idx, val) lists) in either ragged or
    padded-block form."""
    rows = []
    if g.padded_indices is not None:
        for i in range(len(g.rec_nnz)):
            n = int(g.rec_nnz[i])
            rows.append((g.padded_indices[i, :n].astype(np.int64),
                         np.asarray(g.padded_values[i, :n], np.float64)))
    else:
        rows = [(np.asarray(ri, np.int64), np.asarray(rv, np.float64))
                for ri, rv in zip(g.ragged_indices, g.ragged_values)]
    return g.entity_id, g.columns, rows


@pytest.mark.parametrize("suffix", ["", ".gz"])
def test_native_grouped_matches_python(tmp_path, suffix):
    from gdmix_tpu.io.input_pipeline import read_per_entity_grouped
    d = _write_grouped(tmp_path, suffix=suffix)
    py = read_per_entity_grouped(d, GMD, "user_id", "per_user",
                                 use_native=False)
    nat = read_per_entity_grouped(d, GMD, "user_id", "per_user",
                                  use_native=True)
    assert len(py) == len(nat) and len(py) == 40
    assert nat[0].padded_indices is not None   # the columnar fast path ran
    for gp, gn in zip(py, nat):
        eid_p, cols_p, rows_p = _norm_group(gp)
        eid_n, cols_n, rows_n = _norm_group(gn)
        assert eid_p == eid_n
        assert set(cols_p) == set(cols_n)
        for name in cols_p:
            assert cols_p[name].dtype == cols_n[name].dtype, name
            np.testing.assert_allclose(
                np.asarray(cols_p[name], np.float64),
                np.asarray(cols_n[name], np.float64), rtol=1e-6)
        assert len(rows_p) == len(rows_n)
        for (ip, vp), (iv, vv) in zip(rows_p, rows_n):
            np.testing.assert_array_equal(ip, iv)
            np.testing.assert_allclose(vp, vv, rtol=1e-6)


def test_native_grouped_int_entity_ids(tmp_path):
    """Int64 entity ids decode to the same decimal strings as the python path."""
    from gdmix_tpu.io.input_pipeline import (EntityGroup,
                                             read_per_entity_grouped,
                                             write_per_entity_grouped)
    md = DatasetMetadata.from_json({
        "features": [
            {"name": "bag", "dtype": "float", "shape": [10], "isSparse": True},
            {"name": "movie_id", "dtype": "long", "shape": [], "isSparse": False},
            {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]})
    groups = []
    rng = np.random.RandomState(0)
    for e in (7, 123456789012, 0):
        g = EntityGroup(entity_id=str(e), columns={
            "uid": np.arange(2, dtype=np.int64),
            "response": rng.randint(0, 2, 2).astype(np.int64)})
        g.ragged_indices = [np.array([1, 3], np.int64), np.array([2], np.int64)]
        g.ragged_values = [np.array([0.5, -1.0]), np.array([2.0])]
        groups.append(g)
    d = str(tmp_path)
    write_per_entity_grouped(os.path.join(d, "g.tfrecord"), groups,
                             "movie_id", "long", "bag")
    py = read_per_entity_grouped(d, md, "movie_id", "bag", use_native=False)
    nat = read_per_entity_grouped(d, md, "movie_id", "bag",
                                  use_native=True)
    assert [g.entity_id for g in nat] == [g.entity_id for g in py] \
        == ["7", "123456789012", "0"]
    assert nat[0].padded_indices is not None


def test_native_grouped_falls_back_on_unknown_context(tmp_path):
    """A context column missing from the metadata forces the python path (no
    silent column drop)."""
    from gdmix_tpu.io import proto, tfrecord
    from gdmix_tpu.io.input_pipeline import read_per_entity_grouped
    md = DatasetMetadata.from_json({
        "features": [
            {"name": "bag", "dtype": "float", "shape": [10], "isSparse": True},
            {"name": "ent", "dtype": "string", "shape": [], "isSparse": False},
            {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]})
    payload = proto.encode_sequence_example(
        {"ent": [b"e1"], "uid": [1, 2], "response": [0, 1],
         "surprise": [0.25, 0.5]},
        {"bag_indices": [[1], [2]], "bag_values": [[1.0], [2.0]]})
    d = str(tmp_path)
    tfrecord.write_tfrecords(os.path.join(d, "g.tfrecord"), [payload])
    got = read_per_entity_grouped(d, md, "ent", "bag", use_native=True)
    assert len(got) == 1
    # python fallback decoded the undeclared column instead of dropping it
    assert "surprise" in got[0].columns
    assert got[0].padded_indices is None   # ragged = python path
