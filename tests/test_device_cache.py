"""Multi-sweep device-array reuse (_bucket_device_arrays cache): sweep 2+
re-ships only the dynamic columns (offsets, theta0); the five sweep-static
columns stay resident in HBM. Results must be identical to the uncached
path, and a mismatched bucket must fall back to a full upload."""
import numpy as np

import gdmix_tpu.models.random_effect_lr as RE

from tests.test_random_effect_lr import (_build_model, _make_groups,
                                         _write_dataset)


def _perturb_offsets(groups, delta):
    import copy
    out = copy.deepcopy(groups)
    for g in out:
        g.columns["offset"] = g.columns["offset"] + delta
    return out


def test_cached_refit_matches_uncached(tmp_path, monkeypatch):
    groups, _ = _make_groups(num_entities=9, seed=31)
    md_file, train_dir, feature_file = _write_dataset(tmp_path, groups)
    model, base = _build_model(md_file, train_dir, feature_file, tmp_path)

    cache = {}
    w1 = model.fit_groups(groups, {}, base, device_cache=cache)
    assert cache, "first sweep did not populate the cache"

    # sweep 2: same records, new offsets, warm weights — count uploads of
    # the static columns (must be ZERO on the cached path)
    groups2 = _perturb_offsets(groups, 0.25)
    w_ref = model.fit_groups(groups2, dict(w1), base)       # uncached
    puts = []
    orig_wire = RE._compact_bucket_wire

    def spy(bucket, b_ship, dt=None):
        puts.append(bucket.indices.shape)
        return orig_wire(bucket, b_ship, dt)

    monkeypatch.setattr(RE, "_compact_bucket_wire", spy)
    w_cached = model.fit_groups(groups2, dict(w1), base, device_cache=cache)
    # multi-device meshes take the eager path; 1-device the wire-compact —
    # either way the cached run must not re-ship statics through the
    # wire-compact builder (the 1-device upload funnel)
    import jax
    if len(jax.devices()) == 1:
        assert puts == [], "cached sweep re-uploaded static columns"

    assert set(w_cached) == set(w_ref)
    for eid in w_ref:
        np.testing.assert_allclose(np.asarray(w_cached[eid].theta),
                                   np.asarray(w_ref[eid].theta),
                                   rtol=1e-12, atol=1e-13, err_msg=eid)


def test_changed_data_rejects_cache(tmp_path):
    """A cache entry from different data (entity set / shapes / counts) must
    be ignored — results stay correct, the cache revalidates."""
    groups, _ = _make_groups(num_entities=9, seed=32)
    md_file, train_dir, feature_file = _write_dataset(tmp_path, groups)
    model, base = _build_model(md_file, train_dir, feature_file, tmp_path)
    cache = {}
    model.fit_groups(groups, {}, base, device_cache=cache)

    groups2, _ = _make_groups(num_entities=7, seed=33)   # different data
    want = model.fit_groups(groups2, {}, base)
    got = model.fit_groups(groups2, {}, base, device_cache=cache)
    assert set(got) == set(want)
    for eid in want:
        np.testing.assert_allclose(np.asarray(got[eid].theta),
                                   np.asarray(want[eid].theta),
                                   rtol=1e-12, atol=1e-13, err_msg=eid)


def test_fe_cached_refit_matches_uncached(tmp_path):
    """FixedEffectLRModel fit/score with device_cache: sweep 2 re-ships only
    the offset column; coefficients and scores must equal the uncached
    path, and changed data must reject the cache."""
    from tests.test_fixed_effect_lr import _make_dataset, _params
    from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
    from gdmix_tpu.io.input_pipeline import load_per_record

    ds = _make_dataset(tmp_path, seed=44)
    model_params, base_params = _params(ds, tmp_path)
    model = FixedEffectLRModel(model_params, base_params)
    data = load_per_record(ds["train_dir"], model.metadata, "global")

    cache = {}
    c1 = model.fit_data(data, base_params, device_cache=cache)
    assert "batch" in cache

    import dataclasses
    cols2 = dict(data.columns)
    cols2["offset"] = cols2.get(
        "offset", np.zeros(data.num_samples)) + 0.2
    data2 = dataclasses.replace(data, columns=cols2)
    want = model.fit_data(data2, base_params, warm_start=c1)
    got = model.fit_data(data2, base_params, warm_start=c1,
                         device_cache=cache)
    np.testing.assert_array_equal(got, want)

    s_want = model.score_data(data2, base_params)
    s_got = model.score_data(data2, base_params, device_cache=cache)
    np.testing.assert_array_equal(s_got["total"], s_want["total"])

    # different rows (a slice) must reject the cache
    from gdmix_tpu.io.input_pipeline import slice_rows
    view = slice_rows(data2, np.arange(0, data2.num_samples, 2))
    v_want = model.score_data(view, base_params)
    v_got = model.score_data(view, base_params, device_cache=cache)
    np.testing.assert_array_equal(v_got["total"], v_want["total"])


def test_sharded_cached_refit_matches_uncached(tmp_path, monkeypatch):
    """fit_records_sharded with device_cache: sweep 2 re-routes ONLY the
    offset column (the static routed/packed columns stay in HBM) and must
    reproduce the uncached refit exactly."""
    from gdmix_tpu.io.input_pipeline import PerRecordData
    rng = np.random.default_rng(41)
    E, N, K, D = 37, 400, 3, 40
    ent = rng.integers(0, E, N)
    data = PerRecordData(
        columns={"user_id": np.array([str(e + 100) for e in ent], object),
                 "uid": np.arange(N, dtype=np.int64),
                 "response": rng.integers(0, 2, N).astype(np.float64),
                 "offset": rng.normal(size=N) * 0.1},
        indices=rng.integers(0, D, (N, K)).astype(np.int64),
        values=rng.normal(size=(N, K)), nnz=np.full(N, K, np.int64),
        num_samples=N)
    md_file, train_dir, feature_file = _write_dataset(
        tmp_path, _make_groups(num_entities=3, seed=1)[0], width=D)
    model, base = _build_model(md_file, train_dir, feature_file, tmp_path)

    cache = {}
    w1 = model.fit_records_sharded(data, base, device_cache=cache)
    assert "sharded" in cache

    import dataclasses
    cols2 = dict(data.columns)
    cols2["offset"] = cols2["offset"] + 0.3
    data2 = dataclasses.replace(data, columns=cols2)

    # the cached refit must NOT re-run the support extraction
    import gdmix_tpu.models.random_effect_lr as RE
    calls = []
    orig = RE.RandomEffectLRModel._entity_supports

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(RE.RandomEffectLRModel, "_entity_supports",
                        staticmethod(spy))
    want = model.fit_records_sharded(data2, base, model_weights=dict(w1))
    n_uncached = len(calls)
    calls.clear()
    got = model.fit_records_sharded(data2, base, model_weights=dict(w1),
                                    device_cache=cache)
    assert len(calls) < n_uncached or n_uncached == 0
    assert set(got) == set(want)
    for eid in want:
        np.testing.assert_allclose(np.asarray(got[eid].theta),
                                   np.asarray(want[eid].theta),
                                   rtol=1e-12, atol=1e-13, err_msg=eid)

    # changed data (different entity mix) must reject the cache
    ent3 = rng.integers(0, E + 5, N)
    cols3 = dict(data.columns)
    cols3["user_id"] = np.array([str(e + 100) for e in ent3], object)
    data3 = dataclasses.replace(data, columns=cols3)
    want3 = model.fit_records_sharded(data3, base)
    got3 = model.fit_records_sharded(data3, base, device_cache=cache)
    assert set(got3) == set(want3)
    for eid in want3:
        np.testing.assert_allclose(np.asarray(got3[eid].theta),
                                   np.asarray(want3[eid].theta),
                                   rtol=1e-12, atol=1e-13, err_msg=eid)


def test_pipeline_multi_sweep_uses_cache(tmp_path):
    """A 2-sweep in-memory pipeline run on the host RE plane matches the
    1-sweep-then-1-sweep math while routing sweep 2 through the device
    cache (metrics equal the uncached 2-sweep run)."""
    from gdmix_tpu.data import movielens
    from gdmix_tpu.workflow.pipeline import run_gdmix_in_memory
    from tests.test_e2e_pipeline import _config
    root = str(tmp_path / "ml")
    data = movielens.generate_synthetic(num_users=40, num_movies=50,
                                        num_ratings=1500, seed=9)
    ml = movielens.prepare_gdmix_data(root, data)
    m = run_gdmix_in_memory(_config(ml, str(tmp_path / "o")), num_sweeps=2,
                            re_mode="host")
    assert m["per-movie"] >= m["global"] - 1e-6

def test_hybrid_aux_cached_across_sweeps(tmp_path, monkeypatch):
    """The wide-D hot/cold split depends only on indices/values (static
    across coordinate-descent sweeps), so sweep 2+ must REUSE the cached
    HybridAux — built exactly once per cache — and still match an uncached
    fit on the new offsets."""
    from tests.test_fixed_effect_lr import _make_dataset, _params
    from gdmix_tpu.models import fixed_effect_lr as FE
    from gdmix_tpu.io.input_pipeline import load_per_record

    ds = _make_dataset(tmp_path, seed=45)
    model_params, base_params = _params(ds, tmp_path, grad_mode="hybrid",
                                        hot_features=6,
                                        hybrid_cold_max_frac=1.0,
                                        block_chunk_size=32)
    model = FE.FixedEffectLRModel(model_params, base_params)
    data = load_per_record(ds["train_dir"], model.metadata, "global")

    builds = []
    orig = FE.build_hybrid_aux

    def spy(*a, **kw):
        builds.append(1)
        return orig(*a, **kw)
    monkeypatch.setattr(FE, "build_hybrid_aux", spy)

    cache = {}
    c1 = model.fit_data(data, base_params, device_cache=cache)
    assert len(builds) == 1 and cache.get("hybrid_aux") is not None

    import dataclasses
    cols2 = dict(data.columns)
    cols2["offset"] = cols2.get("offset", np.zeros(data.num_samples)) + 0.3
    data2 = dataclasses.replace(data, columns=cols2)
    got = model.fit_data(data2, base_params, warm_start=c1,
                         device_cache=cache)
    assert len(builds) == 1, "sweep 2 rebuilt the hybrid aux"
    want = model.fit_data(data2, base_params, warm_start=c1)
    np.testing.assert_allclose(got, want, atol=1e-12)
