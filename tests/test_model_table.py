"""ModelTable (columnar model store) equivalence with the dict-of-SparseModel
path: Mapping semantics, dict.update merge-order, byte-identical avro export,
round-trip load, dense scoring table."""
import os

import numpy as np
import pytest

from gdmix_tpu.io import model_avro
from gdmix_tpu.io.model_avro import SparseModel
from gdmix_tpu.io.model_table import ModelTable


def _mk_models(n, seed=0, with_var=False, has_intercept=True, D=12):
    rng = np.random.default_rng(seed)
    out = {}
    for i in range(n):
        u = int(rng.integers(1, 6))
        idx = np.sort(rng.choice(D, size=u, replace=False)).astype(np.int64)
        dim = u + (1 if has_intercept else 0)
        theta = rng.normal(size=dim)
        var = np.abs(rng.normal(size=dim)) + 0.1 if with_var else None
        out[f"ent{i:03d}"] = SparseModel(
            model_id=f"ent{i:03d}", theta=theta, variance=var,
            unique_global_indices=idx)
    return out


def _feature_file(tmp_path, D=12):
    p = os.path.join(tmp_path, "features.csv")
    with open(p, "w") as f:
        for i in range(D):
            f.write(f"f{i},t{i}\n")
    return p


def _assert_same_model(a: SparseModel, b: SparseModel):
    np.testing.assert_allclose(a.theta, b.theta, rtol=0, atol=0)
    np.testing.assert_array_equal(a.unique_global_indices,
                                  b.unique_global_indices)
    if a.variance is None:
        assert b.variance is None
    else:
        np.testing.assert_allclose(a.variance, b.variance, rtol=0, atol=0)


@pytest.mark.parametrize("with_var", [False, True])
@pytest.mark.parametrize("has_intercept", [False, True])
def test_from_models_roundtrip_views(with_var, has_intercept):
    models = _mk_models(17, with_var=with_var, has_intercept=has_intercept)
    table = ModelTable.from_models(models, has_intercept)
    assert len(table) == len(models)
    assert list(table) == list(models)
    for mid, sm in models.items():
        assert mid in table
        _assert_same_model(table[mid], sm)


def test_merge_matches_dict_update_order():
    prior = _mk_models(9, seed=1)
    new = _mk_models(6, seed=2)
    # overlap: retrain ent002/ent005 with different supports
    for k in ("ent002", "ent005"):
        new[k] = SparseModel(model_id=k, theta=np.array([9.0, 1.0, 2.0]),
                             variance=None,
                             unique_global_indices=np.array([3, 7]))
    expected = dict(prior)
    expected.update(new)
    t_prior = ModelTable.from_models(prior, True)
    t_new = ModelTable.from_models(new, True)
    merged = t_prior.merged_with(t_new)
    assert list(merged) == list(expected)
    for mid in expected:
        _assert_same_model(merged[mid], expected[mid])


def test_merge_empty_sides():
    m = ModelTable.from_models(_mk_models(4), True)
    e = ModelTable.empty(True, False)
    assert merged_ids(e.merged_with(m)) == merged_ids(m)
    assert merged_ids(m.merged_with(e)) == merged_ids(m)


def merged_ids(t):
    return list(t)


def test_concat_fragments():
    a = ModelTable.from_models(_mk_models(5, seed=3), True)
    b = ModelTable.from_models(_mk_models(4, seed=4), True)
    # rename b's ids to avoid overlap
    b.ids = np.asarray([f"x{i}" for i in range(4)], object)
    b._id2row = None
    cat = ModelTable.concat([a, b], has_intercept=True, with_variance=False)
    assert list(cat) == list(a) + list(b)
    for mid in a:
        _assert_same_model(cat[mid], a[mid])
    for mid in b:
        _assert_same_model(cat[mid], b[mid])


@pytest.mark.parametrize("with_var", [False, True])
def test_export_byte_identical_to_dict_writer(tmp_path, with_var):
    models = _mk_models(23, seed=5, with_var=with_var)
    ff = _feature_file(str(tmp_path))
    table = ModelTable.from_models(models, True)

    f_dict = os.path.join(str(tmp_path), "dict.avro")
    if with_var:
        biases = [(sm.theta[0], sm.variance[0]) for sm in models.values()]
        vals = [(sm.theta[1:], sm.variance[1:]) for sm in models.values()]
    else:
        biases = [sm.theta[0] for sm in models.values()]
        vals = [sm.theta[1:] for sm in models.values()]
    model_avro.export_linear_model_to_avro(
        list(models.keys()),
        [sm.unique_global_indices for sm in models.values()],
        vals, biases, ff, f_dict, sparsity_threshold=0.05)

    f_tab = os.path.join(str(tmp_path), "table.avro")
    model_avro.export_model_table_to_avro(table, ff, f_tab,
                                          sparsity_threshold=0.05)
    from gdmix_tpu.io.avro import read_records
    assert list(read_records(f_tab)) == list(read_records(f_dict))


def test_table_load_matches_dict_load(tmp_path):
    models = _mk_models(15, seed=6)
    ff = _feature_file(str(tmp_path))
    f = os.path.join(str(tmp_path), "m.avro")
    model_avro.export_model_table_to_avro(
        ModelTable.from_models(models, True), ff, f, sparsity_threshold=0.0)
    as_dict = model_avro.load_sparse_models_from_avro(f, ff)
    as_table = model_avro.load_sparse_models_from_avro(f, ff, as_table=True)
    assert isinstance(as_table, ModelTable)
    assert list(as_table) == list(as_dict)
    for mid in as_dict:
        _assert_same_model(as_table[mid], as_dict[mid])


def test_scoring_csr_matches_dense_oracle():
    """scoring_csr must represent exactly the coefficients a dense [E+1, D]
    table would hold (the O(E·D) table it replaced): reconstruct dense from
    the CSR keys and compare against the per-model scatter."""
    models = _mk_models(11, seed=7)
    D = 12
    table = ModelTable.from_models(models, True)
    keys, vals, icpt, uniq = table.scoring_csr()
    assert np.all(np.diff(keys) > 0)          # strictly sorted, unique
    E, U = len(models), len(uniq)
    dense = np.zeros((E + 1, D))
    rows, ranks = keys // (U + 1), keys % (U + 1)
    dense[rows, uniq[ranks]] = vals
    want = np.zeros((E + 1, D))
    eb = np.zeros(E + 1)
    for r, sm in enumerate(models.values()):
        eb[r] = sm.theta[0]
        want[r, sm.unique_global_indices] = sm.theta[1:]
    np.testing.assert_allclose(dense, want)
    np.testing.assert_allclose(icpt, eb)


def test_score_records_intercept_only_table():
    """Scoring against a table whose models carry NO coefficients (an
    intercept-only coordinate): every record scores b[e] + offset — the
    empty support union must not trip the feature-rank join (round-4
    regression guard: U == 0 indexed an empty uniq array)."""
    from gdmix_tpu.io.input_pipeline import PerRecordData
    from gdmix_tpu.models.random_effect_lr import RandomEffectLRModel
    from gdmix_tpu.params import Params, REParams, from_dict

    E, N = 5, 40
    rng = np.random.default_rng(4)
    icpts = rng.normal(size=E)
    table = ModelTable(
        ids=np.array([f"e{i}" for i in range(E)], object),
        offs=np.zeros(E + 1, np.int64),
        coef_ids=np.zeros(0, np.int64), coef_vals=np.zeros(0), icpt=icpts)
    ent = rng.integers(0, E + 2, N)
    offsets = rng.normal(size=N)
    data = PerRecordData(
        columns={"entity": np.array([f"e{i}" for i in ent], object),
                 "uid": np.arange(N, dtype=np.int64), "offset": offsets},
        indices=rng.integers(0, 100, (N, 3)).astype(np.int64),
        values=rng.normal(size=(N, 3)), nnz=np.full(N, 3, np.int64),
        num_samples=N)
    model = RandomEffectLRModel.__new__(RandomEffectLRModel)
    model.model_params = from_dict(REParams, {
        "partition_entity": "entity", "feature_bag": "bag",
        "metadata_file": "unused", "training_data_dir": "unused",
        "output_model_dir": "unused"})
    model.has_intercept = True
    model.dtype = np.float64

    class _Schema:
        label_column_name = None
        weight_column_name = None
        uid_column_name = "uid"

    got = model.score_records(data, table, _Schema())
    want = np.where(ent < E, icpts[np.minimum(ent, E - 1)], 0.0)
    np.testing.assert_allclose(got["per_coordinate"], want, atol=1e-12)
    np.testing.assert_allclose(got["total"], want + offsets, atol=1e-12)


def test_score_records_sparse_at_dense_oom_scale():
    """score_records at an (E, D) where the dense [E+1, D] f64 table would be
    ~1.6 TB (200k entities x 1M features): the sparse CSR path must run in
    O(nnz) and agree with a numpy per-record oracle (reference scores
    per-entity sparse, job_consumers.py:138-152)."""
    from gdmix_tpu.io.input_pipeline import PerRecordData
    from gdmix_tpu.models.random_effect_lr import RandomEffectLRModel
    from gdmix_tpu.params import Params, REParams, from_dict

    rng = np.random.default_rng(11)
    E, D, N, K = 200_000, 1_000_000, 4_096, 4
    supp = 2
    fids = rng.choice(D, size=(E, supp))      # per-entity support (may dup)
    coefs = rng.normal(size=(E, supp))
    icpts = rng.normal(size=E)
    table = ModelTable(
        ids=np.array([f"e{i}" for i in range(E)], object),
        offs=np.arange(E + 1, dtype=np.int64) * supp,
        coef_ids=fids.ravel(), coef_vals=coefs.ravel(), icpt=icpts)

    ent = rng.integers(0, E + 50, N)          # some entities have no model
    idx = rng.integers(0, D, (N, K)).astype(np.int64)
    # make some record features actually hit the entity's support
    hit_rows = rng.random(N) < 0.7
    idx[hit_rows, 0] = fids[np.minimum(ent[hit_rows], E - 1), 0]
    val = rng.normal(size=(N, K))
    offsets = rng.normal(size=N)
    data = PerRecordData(
        columns={"entity": np.array([f"e{i}" for i in ent], object),
                 "uid": np.arange(N, dtype=np.int64),
                 "offset": offsets},
        indices=idx, values=val, nnz=np.full(N, K, np.int64),
        num_samples=N)

    model = RandomEffectLRModel.__new__(RandomEffectLRModel)
    model.model_params = from_dict(REParams, {
        "partition_entity": "entity", "feature_bag": "bag",
        "metadata_file": "unused", "training_data_dir": "unused",
        "output_model_dir": "unused"})
    model.has_intercept = True
    model.dtype = np.float64

    class _Schema:
        label_column_name = None
        weight_column_name = None
        uid_column_name = "uid"

    got = model.score_records(data, table, _Schema())

    # per-record numpy oracle on a sample of rows
    sample = rng.choice(N, 500, replace=False)
    for r in sample:
        e = ent[r]
        z = 0.0
        if e < E:
            z = icpts[e]
            # last-wins on duplicate support ids is irrelevant here: sum of
            # matching coefficients via a dict (first occurrence wins in the
            # CSR join; build the dict the same way)
            coef_of = {}
            for j in range(supp):
                coef_of.setdefault(fids[e, j], coefs[e, j])
            for k in range(K):
                z += val[r, k] * coef_of.get(idx[r, k], 0.0)
        pos = int(np.flatnonzero(got["uid"] == r)[0])
        np.testing.assert_allclose(got["per_coordinate"][pos], z,
                                   rtol=1e-9, atol=1e-11, err_msg=str(r))
        np.testing.assert_allclose(got["total"][pos], z + offsets[r],
                                   rtol=1e-9, atol=1e-11)


def test_intercept_only_with_variance_falls_back(tmp_path):
    # intercept-only models: theta = [b, 0-dummy], variance = [b_var] — not
    # columnar-representable; loaders must return the dict form
    f = os.path.join(str(tmp_path), "io.avro")
    model_avro.export_linear_model_to_avro(
        ["a", "b"], None, None, [(0.5, 0.01), (-0.2, 0.02)], None, f)
    got = model_avro.load_sparse_models_from_avro(f, None, as_table=True)
    assert not isinstance(got, ModelTable)
    assert np.allclose(got["a"].theta, [0.5, 0.0])
    assert np.allclose(got["a"].variance, [0.01])


@pytest.mark.parametrize("with_var", [False, True])
def test_select_rows_and_deduped_last(with_var):
    models = _mk_models(7, with_var=with_var)
    table = ModelTable.from_models(models, True)
    sub = table.select_rows(np.asarray([5, 1, 1, 3]))
    assert list(sub.ids) == ["ent005", "ent001", "ent001", "ent003"]
    _assert_same_model(sub.row_model(0), models["ent005"])
    _assert_same_model(sub.row_model(2), models["ent001"])
    # unique ids → deduped_last is a no-op (same object)
    assert table.deduped_last() is table
    # duplicate ids: keep the LAST row per id, in first-occurrence order
    # (dict last-wins), exactly what repeated out[eid] = sm produced
    dup = ModelTable.concat([table.select_rows(np.asarray([2, 4])),
                             table.select_rows(np.asarray([4, 0]))],
                            has_intercept=True, with_variance=with_var)
    # fake a retrained duplicate: perturb the second ent004 row
    dup.coef_vals[dup.offs[2]:dup.offs[3]] += 1.0
    d = dup.deduped_last()
    assert list(d.ids) == ["ent002", "ent004", "ent000"]
    np.testing.assert_allclose(
        d["ent004"].theta[1:], models["ent004"].theta[1:] + 1.0)
    _assert_same_model(d["ent002"], models["ent002"])


def test_fit_groups_dedups_overflow_group_duplicates():
    """A capped entity whose overflow groups reach fit_groups as separate
    FlatGroups rows must yield ONE model per entity id (the dict path's
    last-wins), not one per group — and the export must write unique
    modelIds (reference writes one BayesianLinearModel record per entity)."""
    from gdmix_tpu.data.bucketing import FlatGroups
    from gdmix_tpu.models.random_effect_lr import RandomEffectLRModel
    from gdmix_tpu.params import Params, REParams, from_dict

    rng = np.random.default_rng(3)
    # entity u1 appears twice (two overflow groups), u0/u2 once
    eids = np.asarray(["u0", "u1", "u1", "u2"], object)
    counts = np.asarray([4, 3, 5, 6], np.int64)
    N = int(counts.sum())
    K, D = 3, 8
    fg = FlatGroups(
        entity_ids=eids, counts=counts,
        columns={"label": rng.integers(0, 2, N).astype(np.float64),
                 "uid": np.arange(N, dtype=np.int64)},
        indices=rng.integers(0, D, (N, K)).astype(np.int64),
        values=rng.normal(size=(N, K)),
        rec_nnz=np.full(N, K, np.int32))
    base = from_dict(Params, {"stage": "random_effect",
                              "label_column_name": "label"})
    mp = from_dict(REParams, {"partition_entity": "entity",
                              "feature_bag": "bag",
                              "metadata_file": "unused",
                              "training_data_dir": "unused",
                              "output_model_dir": "unused"})
    model = RandomEffectLRModel.__new__(RandomEffectLRModel)
    model.model_params = mp
    model.base_params = base
    model.has_intercept = True
    model.variance_mode = None
    model.dtype = np.float64

    class _Schema:
        label_column_name = "label"
        weight_column_name = None
        uid_column_name = "uid"

    out = model.fit_groups(fg, {}, _Schema())
    assert sorted(out) == ["u0", "u1", "u2"]
    assert len(out) == 3  # not 4: the duplicate u1 group deduped last-wins
