"""Sample-level sharding: when there are fewer input files than workers every
worker reads all files and takes every num_shards-th record (reference
distribution_utils.py:11-47 consumed by input_data_pipeline.py:129-220). Round-1
dropped the flag → every process loaded the full dataset (doubled loss/grad)."""
import json
import os

import numpy as np

from gdmix_tpu.io.input_pipeline import (read_per_entity_grouped,
                                         read_per_record, write_per_record,
                                         write_per_entity_grouped, EntityGroup)
from gdmix_tpu.io.metadata import DatasetMetadata
from gdmix_tpu.io.shard import shard_input_files

N = 21
D = 5


def _one_file_dataset(root):
    rng = np.random.RandomState(0)
    md_json = {"features": [
        {"name": "global", "dtype": "float", "shape": [D], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]}
    md_file = os.path.join(root, "tensor_metadata.json")
    with open(md_file, "w") as f:
        json.dump(md_json, f)
    md = DatasetMetadata.from_file(md_file)
    train_dir = os.path.join(root, "trainingData")
    os.makedirs(train_dir, exist_ok=True)
    cols = {"uid": np.arange(N, dtype=np.int64),
            "response": rng.randint(0, 2, N).astype(np.int64)}
    ragged_idx = [np.sort(rng.choice(D, rng.randint(1, D), replace=False))
                  for _ in range(N)]
    ragged_val = [rng.randn(len(r)) for r in ragged_idx]
    write_per_record(os.path.join(train_dir, "data.tfrecord"), md, cols,
                     "global", ragged_idx, ragged_val)
    return train_dir, md


def test_shard_flag_when_fewer_files_than_workers(tmp_path):
    train_dir, _ = _one_file_dataset(str(tmp_path))
    files, sample_level = shard_input_files(train_dir, 2, 1)
    assert sample_level and len(files) == 1


def test_per_record_sample_sharding_partitions_records(tmp_path):
    train_dir, md = _one_file_dataset(str(tmp_path))
    full = read_per_record(train_dir, md, "global")
    num_shards = 3
    shards = [read_per_record(train_dir, md, "global",
                              num_shards=num_shards, shard_index=i)
              for i in range(num_shards)]
    # disjoint union == full dataset: each record trained exactly once
    all_uids = np.concatenate([s.columns["uid"] for s in shards])
    assert len(all_uids) == N
    np.testing.assert_array_equal(np.sort(all_uids), full.columns["uid"])
    # shard i carries records i, i+3, ... with all columns row-consistent
    for i, s in enumerate(shards):
        sel = np.arange(i, N, num_shards)
        np.testing.assert_array_equal(s.columns["uid"], sel)
        np.testing.assert_array_equal(s.columns["response"],
                                      full.columns["response"][sel])
        np.testing.assert_allclose(s.values, full.values[sel])
        np.testing.assert_array_equal(s.nnz, full.nnz[sel])
        assert s.num_samples == len(sel)


def test_per_record_native_and_python_shard_identically(tmp_path):
    train_dir, md = _one_file_dataset(str(tmp_path))
    nat = read_per_record(train_dir, md, "global", num_shards=2, shard_index=1,
                          use_native=True)
    py = read_per_record(train_dir, md, "global", num_shards=2, shard_index=1,
                         use_native=False)
    np.testing.assert_array_equal(nat.columns["uid"], py.columns["uid"])
    np.testing.assert_allclose(nat.values, py.values)


def test_grouped_sample_sharding_partitions_entities(tmp_path):
    root = str(tmp_path)
    md_json = {"features": [
        {"name": "user", "dtype": "string", "shape": [], "isSparse": False},
        {"name": "bag", "dtype": "float", "shape": [D], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]}
    md_file = os.path.join(root, "md.json")
    with open(md_file, "w") as f:
        json.dump(md_json, f)
    md = DatasetMetadata.from_file(md_file)
    groups = [EntityGroup(entity_id=f"u{e}",
                          columns={"uid": np.arange(2, dtype=np.int64) + 2 * e,
                                   "response": np.array([0, 1])},
                          ragged_indices=[np.array([e % D]), np.array([0])],
                          ragged_values=[np.array([1.0]), np.array([2.0])])
              for e in range(7)]
    gdir = os.path.join(root, "grouped")
    os.makedirs(gdir)
    write_per_entity_grouped(os.path.join(gdir, "data.tfrecord"), groups,
                             "user", "string", "bag")
    shards = [read_per_entity_grouped(gdir, md, "user", "bag",
                                      num_shards=2, shard_index=i)
              for i in range(2)]
    ids = sorted(g.entity_id for s in shards for g in s)
    assert ids == sorted(f"u{e}" for e in range(7))
    assert [g.entity_id for g in shards[0]] == ["u0", "u2", "u4", "u6"]
    assert [g.entity_id for g in shards[1]] == ["u1", "u3", "u5"]


def test_avro_per_record_sample_sharding(tmp_path):
    from gdmix_tpu.io.avro_dataset import (read_per_record_avro,
                                           write_per_record_avro)
    root = str(tmp_path)
    md_json = {"features": [
        {"name": "global", "dtype": "float", "shape": [D], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]}
    md_file = os.path.join(root, "md.json")
    with open(md_file, "w") as f:
        json.dump(md_json, f)
    md = DatasetMetadata.from_file(md_file)
    adir = os.path.join(root, "avro")
    os.makedirs(adir)
    write_per_record_avro(
        os.path.join(adir, "data.avro"), md,
        {"uid": np.arange(9, dtype=np.int64),
         "response": np.zeros(9, np.int64)},
        "global", [np.array([i % D]) for i in range(9)],
        [np.array([1.0]) for _ in range(9)])
    s0 = read_per_record_avro(adir, md, "global", num_shards=2, shard_index=0)
    s1 = read_per_record_avro(adir, md, "global", num_shards=2, shard_index=1)
    np.testing.assert_array_equal(s0.columns["uid"], [0, 2, 4, 6, 8])
    np.testing.assert_array_equal(s1.columns["uid"], [1, 3, 5, 7])


def test_weighted_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    from gdmix_tpu.ops import metrics
    rng = np.random.RandomState(7)
    y = rng.randint(0, 2, 400).astype(np.float64)
    s = np.round(rng.randn(400) + 0.7 * y, 1)      # informative, heavy ties
    w = rng.rand(400) * 3 + 0.1
    np.testing.assert_allclose(float(metrics.auc(s, y, w)),
                               roc_auc_score(y, s, sample_weight=w), atol=1e-10)
    # weights=None unchanged
    np.testing.assert_allclose(float(metrics.auc(s, y)),
                               roc_auc_score(y, s), atol=1e-10)
