"""Columnar bucketizer (FlatGroups → EntityBucket) must produce buckets
byte-identical to the per-entity-object path on the same data."""
from types import SimpleNamespace

import numpy as np
import pytest

from gdmix_tpu.data.bucketing import FlatGroups, bucketize, bucketize_flat
from gdmix_tpu.data.partitioner import (PartitionerConfig, group_by_entity,
                                        group_flat)
from gdmix_tpu.io.input_pipeline import PerRecordData
from gdmix_tpu.io.model_avro import SparseModel

SP = SimpleNamespace(label_column_name="response", weight_column_name="weight",
                     uid_column_name="uid")


def _data(E=400, seed=0, with_weight=True, with_offset=True, max_nnz=5,
          D=60, zero_nnz_frac=0.0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, 70, E)
    N = int(counts.sum())
    ent = np.repeat(rng.permutation(E), counts)  # unsorted entity order
    nnz = rng.integers(0 if zero_nnz_frac else 1, max_nnz + 1, N).astype(np.int32)
    cols = {"uid": rng.integers(0, 1 << 40, N),
            "response": rng.integers(0, 2, N).astype(np.float64),
            "entity": np.asarray([f"e{v}" for v in ent], dtype=object)}
    if with_weight:
        cols["weight"] = rng.random(N) + 0.5
    if with_offset:
        cols["offset"] = rng.standard_normal(N)
    indices = rng.integers(0, D, (N, max_nnz)).astype(np.int64)
    values = rng.standard_normal((N, max_nnz))
    # padding entries must be inert by construction
    pad = np.arange(max_nnz)[None, :] >= nnz[:, None]
    values[pad] = 0.0
    return PerRecordData(columns=cols, indices=indices, values=values,
                         nnz=nnz, num_samples=N)


def _both(data, prior_models=None, has_intercept=True):
    cfg = PartitionerConfig(partition_entity="entity", num_partitions=1,
                            uid_column_name="uid")
    gids = np.zeros(data.num_samples, np.int64)
    groups = [g for _, _, g in group_by_entity(data, cfg, None, gids)]
    slow = bucketize(groups, SP, "offset", has_intercept=has_intercept,
                     prior_models=prior_models)
    fg = group_flat(data, cfg, gids, active_only=True)
    fast = bucketize_flat(fg, SP, "offset", has_intercept=has_intercept,
                          prior_models=prior_models)
    return slow, fast


def _assert_equal(slow, fast):
    assert len(slow) == len(fast)
    for a, b in zip(slow, fast):
        assert a.entity_ids == b.entity_ids
        for f in ("indices", "values", "offsets", "labels", "weights", "uids",
                  "sample_count", "unique_global_indices", "u_count", "theta0"):
            ga, gb = getattr(a, f), getattr(b, f)
            assert ga.shape == gb.shape, (f, ga.shape, gb.shape)
            assert ga.dtype == gb.dtype, (f, ga.dtype, gb.dtype)
            np.testing.assert_array_equal(ga, gb, err_msg=f)


def test_flat_matches_object_path():
    _assert_equal(*_both(_data()))


def test_flat_matches_with_zero_nnz_records():
    _assert_equal(*_both(_data(seed=3, zero_nnz_frac=0.5)))


def test_flat_matches_no_intercept():
    _assert_equal(*_both(_data(seed=5), has_intercept=False))


def test_flat_matches_without_weight_or_offset():
    _assert_equal(*_both(_data(seed=7, with_weight=False, with_offset=False)))


def test_flat_matches_with_priors():
    rng = np.random.default_rng(11)
    data = _data(seed=11)
    priors = {}
    ents = sorted({str(e) for e in data.columns["entity"]})
    for e in ents[::3]:  # a third of entities carry a prior
        idx = np.sort(rng.choice(60, rng.integers(1, 8), replace=False))
        priors[e] = SparseModel(
            model_id=e, theta=rng.standard_normal(len(idx) + 1),
            variance=None, unique_global_indices=idx.astype(np.int64))
    _assert_equal(*_both(data, prior_models=priors))


def test_flat_vectorized_warm_start_matches_dict_prior():
    """ModelTable priors take the vectorized warm-start path; buckets must be
    identical to the per-entity dict-prior path."""
    from gdmix_tpu.io.model_table import ModelTable
    rng = np.random.default_rng(12)
    data = _data(seed=12, zero_nnz_frac=0.2)
    priors = {}
    ents = sorted({str(e) for e in data.columns["entity"]})
    for e in ents[::2]:
        idx = np.sort(rng.choice(60, rng.integers(1, 8), replace=False))
        # include feature 0 sometimes to exercise the zero-nnz dummy rule
        if rng.random() < 0.3:
            idx = np.unique(np.append(idx, 0))
        priors[e] = SparseModel(
            model_id=e, theta=rng.standard_normal(len(idx) + 1),
            variance=None, unique_global_indices=idx.astype(np.int64))
    table = ModelTable.from_models(priors, has_intercept=True)
    _, via_dict = _both(data, prior_models=priors)
    _, via_table = _both(data, prior_models=table)
    _assert_equal(via_dict, via_table)


def test_flat_active_only_drops_other_groups():
    data = _data(E=30, seed=2)
    cfg = PartitionerConfig(partition_entity="entity", num_partitions=1,
                            uid_column_name="uid")
    rng = np.random.default_rng(0)
    gids = rng.integers(0, 2, data.num_samples).astype(np.int64)
    groups = [g for _, gid, g in group_by_entity(data, cfg, None, gids)
              if gid == 0]
    slow = bucketize(groups, SP, "offset")
    fg = group_flat(data, cfg, gids, active_only=True)
    fast = bucketize_flat(fg, SP, "offset")
    _assert_equal(slow, fast)


def test_flat_empty():
    cfg = PartitionerConfig(partition_entity="entity", num_partitions=1,
                            uid_column_name="uid")
    data = _data(E=5, seed=1)
    fg = group_flat(data, cfg, np.ones(data.num_samples, np.int64),
                    active_only=True)
    assert len(fg) == 0
    assert bucketize_flat(fg, SP, "offset") == []


def test_select_entities_round_robin():
    data = _data(E=40, seed=9)
    cfg = PartitionerConfig(partition_entity="entity", num_partitions=1,
                            uid_column_name="uid")
    fg = group_flat(data, cfg, np.zeros(data.num_samples, np.int64),
                    active_only=True)
    from gdmix_tpu.data.bucketing import select_entities
    idx = np.arange(1, len(fg), 3)
    sub = select_entities(fg, idx)
    assert list(sub.entity_ids) == list(np.asarray(fg.entity_ids)[idx])
    np.testing.assert_array_equal(sub.counts, fg.counts[idx])
    # record columns match a manual per-entity slice
    starts = np.cumsum(fg.counts) - fg.counts
    want = np.concatenate([
        fg.columns["uid"][starts[i]:starts[i] + fg.counts[i]] for i in idx])
    np.testing.assert_array_equal(sub.columns["uid"], want)
    want_idx = np.concatenate([
        fg.indices[starts[i]:starts[i] + fg.counts[i]] for i in idx])
    np.testing.assert_array_equal(sub.indices, want_idx)
    # buckets built from the subset equal buckets built from subset groups
    slow = bucketize_flat(sub, SP, "offset")
    assert sum(b.batch for b in slow) == len(idx)


def test_zero_record_entities_match_object_path():
    """Entities with no records bucket as instantly-converged zero-weight
    lanes on both paths (the object path always tolerated them)."""
    from gdmix_tpu.io.input_pipeline import EntityGroup
    cols = lambda n: {"uid": np.arange(n, dtype=np.int64),
                      "response": np.ones(n), "weight": np.ones(n)}
    g_empty = EntityGroup(entity_id="a", columns=cols(0))
    g_empty.padded_indices = np.zeros((0, 4), np.int64)
    g_empty.padded_values = np.zeros((0, 4))
    g_empty.rec_nnz = np.zeros(0, np.int32)
    g_full = EntityGroup(entity_id="b", columns=cols(3))
    g_full.padded_indices = np.tile(np.arange(4), (3, 1))
    g_full.padded_values = np.ones((3, 4))
    g_full.rec_nnz = np.full(3, 4, np.int32)
    slow = bucketize([g_empty, g_full], SP, "offset")
    fg = FlatGroups(
        entity_ids=np.asarray(["a", "b"], object),
        counts=np.array([0, 3], np.int64),
        columns=cols(3),
        indices=np.tile(np.arange(4), (3, 1)),
        values=np.ones((3, 4)),
        rec_nnz=np.full(3, 4, np.int32))
    fast = bucketize_flat(fg, SP, "offset")
    _assert_equal(slow, fast)


def test_warm_start_vectorized_despite_huge_unmatched_prior_fid():
    """The combined-key overflow guard must be computed over MATCHED prior
    rows: a prior model for an entity that is not in this FlatGroups, carrying
    a huge feature id, must not knock the warm start off the vectorized path
    (and either way the warm values must be correct)."""
    from gdmix_tpu.io.model_table import ModelTable
    data = _data(E=60, seed=9, D=40)
    # prior over a few present entities (small fids) + one absent entity with
    # a gigantic feature id that would overflow E * (fid+1) int64 keys
    models = {}
    for e in ("e1", "e2", "e3"):
        models[e] = SparseModel(model_id=e,
                                theta=np.asarray([0.5, 1.5, -2.5]),
                                variance=None,
                                unique_global_indices=np.asarray([2, 7]))
    models["absent"] = SparseModel(
        model_id="absent", theta=np.asarray([0.1, 9.9]), variance=None,
        unique_global_indices=np.asarray([(1 << 61)]))
    prior = ModelTable.from_models(models, has_intercept=True)
    assert prior is not None
    slow, fast = _both(data, prior_models=prior)
    _assert_equal(slow, fast)
    # the warm start actually landed: some bucket has theta0 with 1.5 or -2.5
    hit = any(np.isin([0.5, 1.5, -2.5], b.theta0).all() for b in fast)
    assert hit
