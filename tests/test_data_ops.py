"""Data-ops tests: metrics vs sklearn, offset updater, partitioner semantics
(mirrors DataPartitionerTest.scala / EvaluatorTest / LrModelSplitterTest)."""
import json
import os

import numpy as np
import pytest

from gdmix_tpu.data import best_model, evaluator, model_splitter
from gdmix_tpu.data.offset import update_offset
from gdmix_tpu.data.partitioner import (PartitionerConfig, assign_group_ids,
                                        java_string_hash, partition_dataset,
                                        partition_id_of, run_partitioner)
from gdmix_tpu.io import avro
from gdmix_tpu.io.input_pipeline import PerRecordData, read_per_entity_grouped
from gdmix_tpu.io.metadata import DatasetMetadata
from gdmix_tpu.io.model_avro import BAYESIAN_LINEAR_MODEL_SCHEMA
from gdmix_tpu.ops import metrics


# --- metrics ------------------------------------------------------------------

def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.RandomState(0)
    for trial in range(3):
        y = rng.randint(0, 2, 500).astype(np.float64)
        s = rng.randn(500) + y  # informative scores
        np.testing.assert_allclose(float(metrics.auc(s, y)),
                                   roc_auc_score(y, s), atol=1e-10)


def test_auc_with_ties_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.RandomState(1)
    y = rng.randint(0, 2, 300).astype(np.float64)
    s = np.round(rng.randn(300), 1)  # heavy ties
    np.testing.assert_allclose(float(metrics.auc(s, y)), roc_auc_score(y, s),
                               atol=1e-10)


def test_mse():
    s = np.array([1.0, 2.0, 3.0])
    y = np.array([1.5, 2.0, 2.0])
    np.testing.assert_allclose(float(metrics.mse(s, y)), np.mean((s - y) ** 2))


# --- offset updater -----------------------------------------------------------

def test_update_offset_join_and_subtract():
    target = np.array([3, 1, 2], dtype=np.int64)
    score_uids = np.array([1, 2, 3, 4], dtype=np.int64)
    scores = np.array([0.1, 0.2, 0.3, 0.4])
    got = update_offset(target, score_uids, scores)
    np.testing.assert_allclose(got, np.float32([0.3, 0.1, 0.2]))

    pc_uids = np.array([2, 1, 3], dtype=np.int64)
    pc = np.array([0.02, 0.01, 0.03])
    got2 = update_offset(target, score_uids, scores, pc_uids, pc)
    np.testing.assert_allclose(got2, np.float32([0.3, 0.1, 0.2])
                               - np.array([0.03, 0.01, 0.02]))


def test_update_offset_missing_uid_raises():
    with pytest.raises(ValueError):
        update_offset(np.array([9], dtype=np.int64),
                      np.array([1], dtype=np.int64), np.array([0.5]))


# --- group-id assignment (DataPartitioner.getGroupId semantics) ---------------

def test_group_ids_no_bounds_all_active():
    e = np.array(["a", "b", "a"], dtype=object)
    u = np.arange(3)
    np.testing.assert_array_equal(assign_group_ids(e, u, None, None), [0, 0, 0])


def test_group_ids_lower_bound_passive():
    e = np.array(["a", "a", "a", "b"], dtype=object)
    u = np.arange(4)
    got = assign_group_ids(e, u, 2, None)
    # entity b has 1 < 2 samples → -1; entity a active
    np.testing.assert_array_equal(got, [0, 0, 0, -1])


def test_group_ids_upper_bound_split():
    # entity a: 6 samples, upper bound 2 → group_count = 6//2+1 = 4,
    # group = uid % 4 (reference: pmod(uid, count/ub+1))
    e = np.array(["a"] * 6, dtype=object)
    u = np.arange(6)
    got = assign_group_ids(e, u, None, 2)
    np.testing.assert_array_equal(got, np.arange(6) % 4)


def test_java_string_hash():
    # Java "abc".hashCode() == 96354; "user_1".hashCode is stable cross-impl
    assert java_string_hash("abc") == 96354
    assert java_string_hash("") == 0
    assert partition_id_of("abc", 10) == 96354 % 10


# --- in-memory partitioner ----------------------------------------------------

def _per_record_fixture():
    n = 10
    entity = np.array([1, 1, 2, 2, 2, 3, 1, 2, 3, 3], dtype=np.int64)
    uids = np.arange(n, dtype=np.int64)
    columns = {"user_id": entity, "uid": uids,
               "response": np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1], np.int64),
               "weight": np.ones(n, np.float32)}
    indices = np.zeros((n, 4), np.int32)
    values = np.zeros((n, 4))
    nnz = np.zeros(n, np.int32)
    for i in range(n):
        k = (i % 3) + 1
        indices[i, :k] = np.arange(k)
        values[i, :k] = i + 1.0
        nnz[i] = k
    data = PerRecordData(columns=columns, indices=indices, values=values, nnz=nnz,
                         num_samples=n)
    md = DatasetMetadata.from_json({
        "features": [
            {"name": "bag", "dtype": "float", "shape": [4], "isSparse": True},
            {"name": "user_id", "dtype": "long", "shape": [], "isSparse": False},
            {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
            {"name": "weight", "dtype": "float", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]})
    return data, md


def test_partition_dataset_grouping_and_offsets():
    data, md = _per_record_fixture()
    cfg = PartitionerConfig(partition_entity="user_id", num_partitions=2)
    scores = {"uid": np.arange(10, dtype=np.int64),
              "predictionScore": np.linspace(0, 1, 10)}
    parts = partition_dataset(data, md, cfg, "bag", scores=scores)
    all_groups = [g for p in parts.values() for g in p["active"]]
    assert {g.entity_id for g in all_groups} == {"1", "2", "3"}
    # every record present exactly once; offsets joined from scores
    total = sum(g.sample_count for g in all_groups)
    assert total == 10
    for g in all_groups:
        got_off = g.columns["offset"]
        want = np.float32(np.linspace(0, 1, 10))[g.columns["uid"]]
        np.testing.assert_allclose(got_off, want, atol=1e-7)
        # sparse features survived grouping (padded-block fast path)
        assert g.has_sparse
        assert len(list(g.iter_ragged())) == g.sample_count
    # partition routing is by java hash of the entity string
    for pid, groups in parts.items():
        for g in groups["active"]:
            assert partition_id_of(g.entity_id, 2) == pid


def test_partition_dataset_active_passive_bounds():
    data, md = _per_record_fixture()
    # entity counts: 1→3, 2→4, 3→3. lower bound 4 → entities 1,3 passive.
    cfg = PartitionerConfig(partition_entity="user_id", num_partitions=1,
                            min_samples=4)
    parts = partition_dataset(data, md, cfg, "bag")
    active = {g.entity_id for g in parts[0]["active"]}
    passive = {g.entity_id for g in parts[0]["passive"]}
    assert active == {"2"}
    assert passive == {"1", "3"}


def test_run_partitioner_files(tmp_path):
    """File-level partitioner honors the directory contract end to end."""
    from gdmix_tpu.io.input_pipeline import write_per_record
    data, md = _per_record_fixture()
    root = str(tmp_path)
    md_file = os.path.join(root, "metadata.json")
    md.save(md_file)
    train_dir = os.path.join(root, "trainingData")
    os.makedirs(train_dir)
    ragged_idx = [data.indices[i, :data.nnz[i]] for i in range(10)]
    ragged_val = [data.values[i, :data.nnz[i]] for i in range(10)]
    write_per_record(os.path.join(train_dir, "d.tfrecord"), md,
                     data.columns, "bag", ragged_idx, ragged_val)
    score_dir = os.path.join(root, "scores")
    from gdmix_tpu.io.scores import write_scores
    from gdmix_tpu.params import SchemaParams
    sp = SchemaParams(uid_column_name="uid", label_column_name="response",
                      prediction_score_column_name="predictionScore")
    write_scores(os.path.join(score_dir, "part-00000.avro"), sp,
                 np.arange(10), np.linspace(0, 1, 10))

    out_train = os.path.join(root, "partitioned")
    out_md = os.path.join(root, "out_metadata.json")
    plist = os.path.join(root, "partitionList.txt")
    cfg = PartitionerConfig(partition_entity="user_id", num_partitions=2)
    run_partitioner(train_dir, None, md_file, out_md, out_train, None, plist,
                    cfg, "bag", training_score_dir=score_dir)

    with open(plist) as f:
        pids = [int(x) for x in f.read().split(",")]
    assert pids == sorted({partition_id_of(str(e), 2)
                           for e in [1, 2, 3]})
    out_metadata = DatasetMetadata.from_file(out_md)
    assert out_metadata.has_feature("offset")
    # grouped files parse back
    for pid in pids:
        d = os.path.join(out_train, "active", f"partitionId={pid}")
        groups = read_per_entity_grouped(d, out_metadata, "user_id", "bag")
        assert groups
        for g in groups:
            assert "offset" in g.columns


# --- evaluator / best model / splitter ---------------------------------------

def test_evaluator_writes_summary(tmp_path):
    from gdmix_tpu.io.scores import write_scores
    from gdmix_tpu.params import SchemaParams
    sp = SchemaParams(uid_column_name="uid", label_column_name="response",
                      prediction_score_column_name="predictionScore")
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 200).astype(float)
    s = rng.randn(200) + 2 * y
    sdir = str(tmp_path / "scores")
    write_scores(os.path.join(sdir, "part-00000.avro"), sp, np.arange(200), s,
                 labels=y)
    out = str(tmp_path / "metric")
    result = evaluator.run_evaluator(sdir, out, "response", "predictionScore",
                                     "auc", schema_params=sp)
    from sklearn.metrics import roc_auc_score
    np.testing.assert_allclose(result["auc"],
                               roc_auc_score(y, np.float32(s)), atol=1e-6)
    with open(os.path.join(out, "evalSummary.json")) as f:
        assert "auc" in json.load(f)


def test_best_model_selector(tmp_path):
    import base64
    paths = []
    for i, aucv in enumerate([0.6, 0.8, 0.7]):
        d = str(tmp_path / f"m{i}")
        os.makedirs(d)
        with open(os.path.join(d, "evalSummary.json"), "w") as f:
            json.dump({"auc": aucv}, f)
        paths.append(d)
    hp = base64.b64encode(json.dumps(
        {"0": {"l2": 1}, "1": {"l2": 2}, "2": {"l2": 3}}).encode()).decode()
    out = str(tmp_path / "best")
    best = best_model.select_best_model(paths, "auc", out, hyperparameters=hp)
    assert best == 1
    with open(os.path.join(out, "evals.json")) as f:
        evals = json.load(f)
    assert evals["best model index"] == 1


def test_model_splitter(tmp_path):
    rec = {
        "modelId": "global model", "modelClass": "x", "lossFunction": "",
        "variances": None,
        "means": [
            {"name": "u1_gdmixcross_f1", "term": "", "value": 1.0},
            {"name": "u1_gdmixcross_f2", "term": "t", "value": 2.0},
            {"name": "u2_gdmixcross_f1", "term": "", "value": 3.0},
        ]}
    src = str(tmp_path / "in.avro")
    avro.write_records(src, BAYESIAN_LINEAR_MODEL_SCHEMA, [rec])
    out_dir = str(tmp_path / "out")
    n = model_splitter.split_model_file(src, out_dir)
    assert n == 2
    got = {r["modelId"]: r for f in sorted(os.listdir(out_dir))
           for r in avro.read_records(os.path.join(out_dir, f))}
    assert set(got) == {"u1", "u2"}
    assert [m["name"] for m in got["u1"]["means"]] == ["f1", "f2"]
    assert got["u2"]["means"][0]["value"] == 3.0


def test_partition_dataset_flat_matches_object_path(tmp_path):
    """partition_dataset_flat + write_grouped_flat must produce byte-identical
    partition files to the object path (same pairs, same ordering)."""
    import glob

    from gdmix_tpu.data.partitioner import (partition_dataset,
                                            partition_dataset_flat)
    from gdmix_tpu.io.metadata import TensorInfo
    from gdmix_tpu.io.input_pipeline import (write_grouped_flat,
                                             write_per_entity_grouped)
    rng = np.random.RandomState(3)
    n = 400
    ent = rng.randint(0, 37, n)
    data = PerRecordData(
        columns={"uid": np.arange(n, dtype=np.int64),
                 "response": rng.randint(0, 2, n).astype(np.float64),
                 "weight": (rng.rand(n) + 0.5),
                 "user_id": ent.astype(np.int64)},
        indices=rng.randint(0, 50, (n, 4)).astype(np.int64),
        values=rng.randn(n, 4), nnz=np.full(n, 4, np.int32), num_samples=n)
    md = DatasetMetadata(features=[
        TensorInfo(name="bag", dtype="float", shape=[50], is_sparse=True),
        TensorInfo(name="user_id", dtype="long", shape=[], is_sparse=False),
        TensorInfo(name="uid", dtype="long", shape=[], is_sparse=False),
        TensorInfo(name="weight", dtype="float", shape=[], is_sparse=False)],
        labels=[TensorInfo(name="response", dtype="float", shape=[],
                           is_sparse=False)])
    # min/max bounds exercise passive + overflow groups
    cfg = PartitionerConfig(partition_entity="user_id", num_partitions=3,
                            min_samples=4, max_samples=8)
    import copy
    obj = partition_dataset(copy.deepcopy(data), md, cfg, "bag")
    flat = partition_dataset_flat(copy.deepcopy(data), md, cfg, "bag")
    assert set(obj) == set(flat)
    for pid in obj:
        for kind in ("active", "passive"):
            a = str(tmp_path / f"{pid}_{kind}_obj.tfrecord")
            b = str(tmp_path / f"{pid}_{kind}_flat.tfrecord")
            has_obj = bool(obj[pid][kind])
            has_flat = flat[pid][kind] is not None and len(flat[pid][kind])
            assert has_obj == bool(has_flat), (pid, kind)
            if not has_obj:
                continue
            write_per_entity_grouped(a, obj[pid][kind], "user_id", "long",
                                     "bag")
            write_grouped_flat(b, flat[pid][kind], "user_id", "long", "bag")
            assert open(a, "rb").read() == open(b, "rb").read(), (pid, kind)
