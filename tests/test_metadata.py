"""DatasetMetadata tests, mirroring the reference's invalid-metadata cases
(/root/reference/gdmix-trainer/test/io/test_dataset_metadata.py style)."""
import json

import pytest

from gdmix_tpu.io.metadata import DatasetMetadata
from gdmix_tpu.io.shard import shard_input_files

GOOD = {
    "features": [
        {"name": "global", "dtype": "float", "shape": [43], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False},
    ],
    "labels": [{"name": "response", "dtype": "int", "shape": [], "isSparse": False}],
    "numberOfTrainingSamples": 100,
}


def test_parse_good():
    md = DatasetMetadata.from_json(GOOD)
    assert md.feature_names == ["global", "uid", "weight"]
    assert md.label_names == ["response"]
    assert md.num_features("global") == 43
    assert md.num_features(None) == 1  # intercept-only pad
    assert md.number_of_training_samples == 100
    assert md.has_feature("weight") and not md.has_feature("nope")
    assert md.has_label("response")


def test_roundtrip(tmp_path):
    md = DatasetMetadata.from_json(GOOD)
    path = str(tmp_path / "tensor_metadata.json")
    md.save(path)
    md2 = DatasetMetadata.from_file(path)
    assert md2.to_json() == md.to_json()


@pytest.mark.parametrize("bad", [
    {"features": [{"name": "x", "dtype": "quux", "shape": [], "isSparse": False}]},
    {"features": [{"name": None, "dtype": "int", "shape": [], "isSparse": False}]},
    {"features": [{"name": "x", "dtype": "int", "shape": None, "isSparse": False}]},
    {"features": [{"name": "x", "dtype": "int"}]},
    {"features": [{"name": "x", "dtype": "int", "shape": [], "isSparse": False},
                  {"name": "x", "dtype": "int", "shape": [], "isSparse": False}]},
])
def test_invalid_metadata_raises(bad):
    with pytest.raises((ValueError, TypeError)):
        DatasetMetadata.from_json(bad)


def test_duplicate_across_features_labels():
    bad = {"features": [{"name": "x", "dtype": "int", "shape": [], "isSparse": False}],
           "labels": [{"name": "x", "dtype": "int", "shape": [], "isSparse": False}]}
    with pytest.raises(ValueError):
        DatasetMetadata.from_json(bad)


# --- sharding (reference test_distribution_utils.py semantics) -----------------

def test_shard_files_round_robin(tmp_path):
    for i in range(5):
        (tmp_path / f"f{i}.tfrecord").write_text("x")
    files, sample_level = shard_input_files(str(tmp_path), 2, 0)
    assert not sample_level
    assert [f.split("/")[-1] for f in files] == ["f0.tfrecord", "f2.tfrecord", "f4.tfrecord"]
    files1, _ = shard_input_files(str(tmp_path), 2, 1)
    assert [f.split("/")[-1] for f in files1] == ["f1.tfrecord", "f3.tfrecord"]


def test_shard_fewer_files_than_workers(tmp_path):
    (tmp_path / "only.tfrecord").write_text("x")
    files, sample_level = shard_input_files(str(tmp_path), 4, 2)
    assert sample_level and len(files) == 1


def test_shard_empty_raises(tmp_path):
    with pytest.raises(ValueError):
        shard_input_files(str(tmp_path), 1, 0)
