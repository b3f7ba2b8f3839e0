"""Avro dataset input tests: per-record (indexed + NTV variants) and grouped."""
import os

import numpy as np
import pytest

from gdmix_tpu import constants
from gdmix_tpu.io import avro
from gdmix_tpu.io.avro_dataset import (read_per_entity_grouped_avro,
                                       read_per_record_avro,
                                       write_per_record_avro)
from gdmix_tpu.io.feature_list import write_feature_list
from gdmix_tpu.io.metadata import DatasetMetadata

MD = DatasetMetadata.from_json({
    "features": [
        {"name": "bag", "dtype": "float", "shape": [6], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False}],
    "labels": [{"name": "response", "dtype": "int", "shape": [],
                "isSparse": False}]})


def test_per_record_indexed_roundtrip(tmp_path):
    n = 20
    rng = np.random.RandomState(0)
    columns = {"uid": np.arange(n, dtype=np.int64),
               "weight": np.ones(n, np.float32),
               "response": rng.randint(0, 2, n).astype(np.int64)}
    ragged_idx = [np.sort(rng.choice(6, rng.randint(1, 4), replace=False))
                  for _ in range(n)]
    ragged_val = [rng.randn(len(r)) for r in ragged_idx]
    f = str(tmp_path / "d.avro")
    write_per_record_avro(f, MD, columns, "bag", ragged_idx, ragged_val)
    data = read_per_record_avro(str(tmp_path), MD, "bag")
    assert data.num_samples == n
    np.testing.assert_array_equal(data.columns["uid"], columns["uid"])
    for i in range(n):
        m = data.nnz[i]
        np.testing.assert_array_equal(data.indices[i, :m], ragged_idx[i])
        np.testing.assert_allclose(data.values[i, :m], ragged_val[i])


def test_per_record_ntv_conversion(tmp_path):
    """NameTermValue bags translate through the (name,term) feature map —
    the EffectConfig conversion path."""
    feature_file = str(tmp_path / "features.csv")
    write_feature_list([("f0", ""), ("f1", "t"), ("f2", "")], feature_file)
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "weight", "type": "float"},
        {"name": "response", "type": "int"},
        {"name": "bag", "type": {"type": "array", "items": {
            "type": "record", "name": "NTV", "fields": [
                {"name": "name", "type": "string"},
                {"name": "term", "type": "string"},
                {"name": "value", "type": "double"}]}}}]}
    recs = [
        {"uid": 0, "weight": 1.0, "response": 1,
         "bag": [{"name": "f2", "term": "", "value": 2.0},
                 {"name": "f0", "term": "", "value": 1.0},
                 {"name": "unknown", "term": "", "value": 9.0}]},
        {"uid": 1, "weight": 1.0, "response": 0,
         "bag": [{"name": "f1", "term": "t", "value": -1.0}]},
    ]
    f = str(tmp_path / "ntv.avro")
    avro.write_records(f, schema, recs)
    data = read_per_record_avro(f, MD, "bag", feature_file=feature_file)
    assert data.num_samples == 2
    np.testing.assert_array_equal(data.indices[0, :2], [0, 2])  # sorted
    np.testing.assert_allclose(data.values[0, :2], [1.0, 2.0])
    np.testing.assert_array_equal(data.indices[1, :1], [1])
    np.testing.assert_allclose(data.values[1, :1], [-1.0])


def test_grouped_avro(tmp_path):
    schema = {"type": "record", "name": "G", "fields": [
        {"name": "user_id", "type": "long"},
        {"name": "uid", "type": {"type": "array", "items": "long"}},
        {"name": "response", "type": {"type": "array", "items": "double"}},
        {"name": "bag_indices", "type": {"type": "array", "items":
            {"type": "array", "items": "long"}}},
        {"name": "bag_values", "type": {"type": "array", "items":
            {"type": "array", "items": "double"}}}]}
    recs = [{"user_id": 7, "uid": [1, 2], "response": [0.0, 1.0],
             "bag_indices": [[0, 3], [2]], "bag_values": [[1.0, 2.0], [3.0]]}]
    f = str(tmp_path / "g.avro")
    avro.write_records(f, schema, recs)
    md = DatasetMetadata.from_json({
        "features": [
            {"name": "bag", "dtype": "float", "shape": [6], "isSparse": True},
            {"name": "user_id", "dtype": "long", "shape": [], "isSparse": False},
            {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "float", "shape": [],
                    "isSparse": False}]})
    groups = read_per_entity_grouped_avro(f, md, "user_id", "bag")
    assert len(groups) == 1
    g = groups[0]
    assert g.entity_id == "7"
    np.testing.assert_array_equal(g.columns["uid"], [1, 2])
    assert len(g.ragged_indices) == 2
    np.testing.assert_array_equal(g.ragged_indices[0], [0, 3])


def test_fe_model_trains_from_avro(tmp_path):
    """End-to-end: fixed-effect trainer with data_format=avro."""
    from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
    from gdmix_tpu.params import FixedLRParams, Params
    n = 60
    rng = np.random.RandomState(1)
    X = rng.randn(n, 6) * (rng.rand(n, 6) < 0.5)
    y = (rng.rand(n) < 1 / (1 + np.exp(-X.sum(1)))).astype(np.int64)
    ragged_idx = [np.flatnonzero(X[i]).astype(np.int64) for i in range(n)]
    ragged_val = [X[i][X[i] != 0] for i in range(n)]
    columns = {"uid": np.arange(n, dtype=np.int64),
               "weight": np.ones(n, np.float32), "response": y}
    d = str(tmp_path / "train")
    write_per_record_avro(os.path.join(d, "p.avro"), MD, columns, "bag",
                          ragged_idx, ragged_val)
    md_file = str(tmp_path / "m.json")
    MD.save(md_file)
    feature_file = str(tmp_path / "features.csv")
    write_feature_list([(f"f{i}", "") for i in range(6)], feature_file)
    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    mp = FixedLRParams(metadata_file=md_file, output_model_dir=model_dir,
                       training_data_dir=d, feature_bag="bag",
                       feature_file=feature_file, data_format="avro",
                       regularize_bias=False, dtype="float64",
                       disable_fixed_effect_scoring_after_training=True)
    bp = Params(action="train", stage="fixed_effect",
                label_column_name="response", uid_column_name="uid",
                prediction_score_column_name="predictionScore")
    model = FixedEffectLRModel(mp, bp)
    model.train(d, None, md_file, model_dir,
                {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
                 constants.IS_CHIEF: True}, bp)
    assert model.model_coefficients is not None
    assert np.any(model.model_coefficients != 0)
