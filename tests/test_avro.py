"""Avro OCF codec tests, including interop checks against the photon-ml model schema."""
import numpy as np
import pytest

from gdmix_tpu.io import avro
from gdmix_tpu.io.model_avro import (
    BAYESIAN_LINEAR_MODEL_SCHEMA, export_linear_model_to_avro,
    load_linear_models_from_avro, load_sparse_models_from_avro)
from gdmix_tpu.io.feature_list import write_feature_list


SIMPLE_SCHEMA = {
    "type": "record", "name": "Rec", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "score", "type": "float"},
        {"name": "label", "type": ["null", "float"], "default": None},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "double"}},
        {"name": "blob", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
    ]}


def _records(n=100):
    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        out.append({
            "uid": int(rng.randint(-2**62, 2**62)),
            "score": float(np.float32(rng.randn())),
            "label": None if i % 3 == 0 else float(np.float32(i)),
            "tags": [f"tag{i}", "común"],
            "props": {"a": float(rng.randn()), "b": 1e300},
            "blob": bytes([i % 256, 255]),
            "flag": bool(i % 2),
        })
    return out


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    path = str(tmp_path / "t.avro")
    recs = _records()
    n = avro.write_records(path, SIMPLE_SCHEMA, recs, codec=codec)
    assert n == len(recs)
    got = list(avro.read_records(path))
    assert got == recs


def test_multi_block_roundtrip(tmp_path):
    path = str(tmp_path / "t.avro")
    recs = _records(500)
    avro.write_records(path, SIMPLE_SCHEMA, recs, sync_interval=64)
    assert list(avro.read_records(path)) == recs


def test_append(tmp_path):
    path = str(tmp_path / "t.avro")
    recs = _records(20)
    avro.write_records(path, SIMPLE_SCHEMA, recs[:10])
    avro.append_records(path, recs[10:])
    assert list(avro.read_records(path)) == recs


def test_zigzag_edge_values(tmp_path):
    schema = {"type": "record", "name": "R", "fields": [{"name": "v", "type": "long"}]}
    path = str(tmp_path / "z.avro")
    vals = [0, -1, 1, 2**63 - 1, -2**63, 4711, -4711]
    avro.write_records(path, schema, [{"v": v} for v in vals])
    assert [r["v"] for r in avro.read_records(path)] == vals


def test_photon_ml_model_roundtrip(tmp_path):
    """Dense fixed-effect layout: intercept at the end on load
    (reference io_utils.py:45-83 semantics)."""
    feature_file = str(tmp_path / "features.csv")
    write_feature_list([("f0", ""), ("f1", "t1"), ("f2", "")], feature_file)
    out = str(tmp_path / "model" / "part-00000.avro")
    weights = np.array([0.5, -1.25, 3.0])
    export_linear_model_to_avro(
        model_ids=["global model"],
        list_of_weight_indices=[np.arange(3)],
        list_of_weight_values=[weights],
        biases=[7.5],
        feature_file=feature_file,
        output_file=out)
    (loaded,) = load_linear_models_from_avro(out, feature_file)
    np.testing.assert_allclose(loaded, [0.5, -1.25, 3.0, 7.5])


def test_photon_ml_sparsity_threshold(tmp_path):
    feature_file = str(tmp_path / "features.csv")
    write_feature_list([("f0", ""), ("f1", "")], feature_file)
    out = str(tmp_path / "m.avro")
    export_linear_model_to_avro(
        model_ids=["m"], list_of_weight_indices=[np.arange(2)],
        list_of_weight_values=[np.array([1e-5, 2.0])], biases=[1e-9],
        feature_file=feature_file, output_file=out, sparsity_threshold=1e-4)
    rec = next(avro.read_records(out))
    # intercept always kept, below-threshold coefficient dropped
    names = [m["name"] for m in rec["means"]]
    assert names == ["(INTERCEPT)", "f1"]
    (loaded,) = load_linear_models_from_avro(out, feature_file)
    np.testing.assert_allclose(loaded, [0.0, 2.0, 1e-9])


def test_photon_ml_with_variance_and_sparse_load(tmp_path):
    feature_file = str(tmp_path / "features.csv")
    write_feature_list([("a", ""), ("b", ""), ("c", "")], feature_file)
    out = str(tmp_path / "m.avro")
    # random-effect style: two entities with different support
    export_linear_model_to_avro(
        model_ids=["e1", "e2"],
        list_of_weight_indices=[np.array([0, 2]), np.array([1])],
        list_of_weight_values=[(np.array([1.0, -2.0]), np.array([0.1, 0.2])),
                               (np.array([3.0]), np.array([0.3]))],
        biases=[(0.5, 0.05), (-0.5, 0.06)],
        feature_file=feature_file, output_file=out)
    models = load_sparse_models_from_avro(out, feature_file, has_intercept=True)
    assert set(models) == {"e1", "e2"}
    m1 = models["e1"]
    np.testing.assert_allclose(m1.theta, [0.5, 1.0, -2.0])
    np.testing.assert_allclose(m1.variance, [0.05, 0.1, 0.2])
    np.testing.assert_array_equal(m1.unique_global_indices, [0, 2])
    m2 = models["e2"]
    np.testing.assert_allclose(m2.theta, [-0.5, 3.0])
    np.testing.assert_array_equal(m2.unique_global_indices, [1])


def test_intercept_only_model(tmp_path):
    out = str(tmp_path / "m.avro")
    export_linear_model_to_avro(
        model_ids=["e"], list_of_weight_indices=None, list_of_weight_values=None,
        biases=[2.5], feature_file=None, output_file=out)
    models = load_sparse_models_from_avro(out, None, has_intercept=True)
    np.testing.assert_allclose(models["e"].theta, [2.5, 0.0])
    np.testing.assert_array_equal(models["e"].unique_global_indices, [0])


def test_schema_is_reference_compatible():
    """Our embedded schema must parse and contain the exact reference field set."""
    parsed, names = avro.parse_schema(BAYESIAN_LINEAR_MODEL_SCHEMA)
    assert [f["name"] for f in parsed["fields"]] == \
        ["modelId", "modelClass", "means", "variances", "lossFunction"]
    assert "NameTermValueAvro" in names.named


def test_snappy_decompress():
    """Hand-crafted snappy streams: literals, copies, overlapping runs."""
    from gdmix_tpu.io.snappy import decompress
    # preamble len=5, literal tag (len 5): "hello"
    assert decompress(bytes([5, (5 - 1) << 2]) + b"hello") == b"hello"
    # "abcabcabc": literal "abc" + overlapping copy1 (offset 3, len 6)
    stream = bytes([9, (3 - 1) << 2]) + b"abc" + \
        bytes([((6 - 4) << 2) | 1, 3])
    assert decompress(stream) == b"abcabcabc"
    # long literal (> 60): 61-flag with 1 length byte
    payload = bytes(range(100))
    stream = bytes([100, 60 << 2, 99]) + payload
    assert decompress(stream) == payload
