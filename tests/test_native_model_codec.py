"""Native photon-ml model codec vs the per-record Python writer/readers.

Both directions must be record-identical: files written by the native encoder
read back the same through the Python datum reader, and files written by the
Python writer load the same through the native parser (reference format:
schemas.py + io_utils.py:45-213).
"""
import os
from typing import Optional

import numpy as np
import pytest

from gdmix_tpu import native
from gdmix_tpu.io import avro, model_avro

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture
def flist(tmp_path):
    p = str(tmp_path / "features")
    with open(p, "w") as f:
        for i in range(12):
            f.write(f"name{i},term{i % 4}\n")
    return p


def _export(path, flist, variance: bool, threshold=1e-4, biases_none=False,
            force_python=False, monkeypatch=None):
    rng = np.random.default_rng(7)
    E = 53
    ids = [np.sort(rng.choice(12, rng.integers(0, 12), replace=False))
           for _ in range(E)]
    vals = [rng.standard_normal(len(i)) for i in ids]
    # plant sub-threshold values to exercise the sparsity filter
    for v in vals:
        if len(v) > 1:
            v[0] = threshold / 2
    if variance:
        weights = [(v, np.abs(rng.standard_normal(len(v))) + .1) for v in vals]
        biases = None if biases_none else \
            [(rng.standard_normal(), rng.random() + .1) for _ in range(E)]
    else:
        weights = vals
        biases = None if biases_none else list(rng.standard_normal(E))
    if force_python:
        monkeypatch.setattr(native, "encode_model_blocks", lambda *a, **k: None)
    n = model_avro.export_linear_model_to_avro(
        [f"m{i}" for i in range(E)], ids, weights, biases, flist, path,
        sparsity_threshold=threshold)
    assert n == E
    return ids, weights, biases


@pytest.mark.parametrize("variance", [False, True])
@pytest.mark.parametrize("biases_none", [False, True])
def test_native_writer_record_identical(tmp_path, monkeypatch, flist,
                                        variance, biases_none):
    fast = str(tmp_path / "fast.avro")
    slow = str(tmp_path / "slow.avro")
    _export(fast, flist, variance, biases_none=biases_none)
    _export(slow, flist, variance, biases_none=biases_none,
            force_python=True, monkeypatch=monkeypatch)
    got = list(avro.read_records(fast))
    want = list(avro.read_records(slow))
    assert got == want


@pytest.mark.parametrize("writer_python", [False, True])
def test_sparse_loader_matches_python(tmp_path, monkeypatch, flist,
                                      writer_python):
    f = str(tmp_path / "m.avro")
    if writer_python:
        _export(f, flist, True, force_python=True, monkeypatch=monkeypatch)
        monkeypatch.undo()
    else:
        _export(f, flist, True)
    fast = model_avro.load_sparse_models_from_avro(f, flist)
    monkeypatch.setattr(model_avro, "_parse_native", lambda *a: None)
    slow = model_avro.load_sparse_models_from_avro(f, flist)
    assert fast.keys() == slow.keys()
    for k in fast:
        np.testing.assert_array_equal(fast[k].theta, slow[k].theta)
        np.testing.assert_array_equal(fast[k].unique_global_indices,
                                      slow[k].unique_global_indices)
        if slow[k].variance is None:
            assert fast[k].variance is None
        else:
            np.testing.assert_array_equal(fast[k].variance, slow[k].variance)


def test_dense_loader_matches_python(tmp_path, monkeypatch, flist):
    f = str(tmp_path / "m.avro")
    _export(f, flist, False)
    fast = model_avro.load_linear_models_from_avro(f, flist)
    monkeypatch.setattr(model_avro, "_parse_native", lambda *a: None)
    slow = model_avro.load_linear_models_from_avro(f, flist)
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(a, b)


def test_intercept_only_roundtrip(tmp_path):
    f = str(tmp_path / "io.avro")
    model_avro.export_linear_model_to_avro(
        ["a", "b"], None, None, [0.5, -1.5], None, f)
    models = model_avro.load_sparse_models_from_avro(f, None)
    np.testing.assert_allclose(models["a"].theta, [0.5, 0.0])
    np.testing.assert_array_equal(models["a"].unique_global_indices, [0])
    recs = list(avro.read_records(f))
    assert recs[0]["means"] == [
        {"name": "(INTERCEPT)", "term": "", "value": 0.5}]
    assert recs[0]["variances"] is None
    assert recs[0]["lossFunction"] == ""


def test_unknown_feature_falls_back_to_python_error(tmp_path, flist):
    """A model referencing a feature outside the feature list must raise the
    python loader's KeyError, not silently drop it."""
    f = str(tmp_path / "m.avro")
    recs = [{"modelId": "x", "modelClass": "c",
             "means": [{"name": "(INTERCEPT)", "term": "", "value": 1.0},
                       {"name": "nosuch", "term": "", "value": 2.0}],
             "variances": None, "lossFunction": ""}]
    avro.write_records(f, model_avro.BAYESIAN_LINEAR_MODEL_SCHEMA, recs)
    with pytest.raises(KeyError):
        model_avro.load_sparse_models_from_avro(f, flist)
    # the dense loader skips unknowns (reference io_utils.py:45-83)
    dense = model_avro.load_linear_models_from_avro(f, flist)
    assert dense[0][-1] == 1.0


def test_mixed_variance_uses_python_writer(tmp_path, flist):
    """Models with and without variance in one export must still write (the
    per-record path), matching gen_one_avro_model's per-record decision."""
    f = str(tmp_path / "m.avro")
    ids = [np.array([0]), np.array([1])]
    weights = [(np.array([1.0]), np.array([2.0])), np.array([3.0])]
    biases = [(0.1, 0.2), 0.3]
    model_avro.export_linear_model_to_avro(
        ["a", "b"], ids, weights, biases, flist, f)
    recs = list(avro.read_records(f))
    assert recs[0]["variances"] is not None
    assert recs[1]["variances"] is None
    models = model_avro.load_sparse_models_from_avro(f, flist)
    assert models["a"].variance is not None and models["b"].variance is None


def test_big_uid_and_long_names(tmp_path):
    """Multi-byte varints in names/ids survive the native round trip."""
    p = str(tmp_path / "features")
    long_name = "n" * 300
    with open(p, "w") as f:
        f.write(f"{long_name},{'t' * 200}\n")
    f = str(tmp_path / "m.avro")
    model_avro.export_linear_model_to_avro(
        ["id-" + "x" * 500], [np.array([0])], [np.array([4.25])], [1.0], p, f)
    models = model_avro.load_sparse_models_from_avro(f, p)
    (sm,) = models.values()
    assert sm.model_id == "id-" + "x" * 500
    np.testing.assert_allclose(sm.theta, [1.0, 4.25])


def test_corrupt_files_never_hang_or_crash(tmp_path):
    """Truncations and random byte corruption must yield clean failures
    (None / ValueError), never hangs or native crashes. Regression: corrupt
    negative varint lengths used to rewind the cursor (infinite loop in the
    python header reader, reversed-range UB in the native parser)."""
    import signal
    import time

    fl = [("a", "x"), ("b", "y")]
    p = str(tmp_path / "features")
    with open(p, "w") as f:
        f.write("a,x\nb,y\n")
    m = str(tmp_path / "m.avro")
    model_avro.export_linear_model_to_avro(
        ["m0", "m1"], [np.array([0, 1]), np.array([1])],
        [np.array([1.0, 2.0]), np.array([3.0])], [0.5, 0.6], p, m)
    buf = open(m, "rb").read()
    rng = np.random.default_rng(3)
    bad = str(tmp_path / "bad.avro")

    def attack():
        native.parse_model_file(bad, fl)
        for fn in (native.read_avro_columns,
                   lambda q: list(avro.read_records(q))):
            try:
                fn(bad)
            except Exception:
                pass

    t0 = time.time()
    for i in range(0, len(buf), 7):
        open(bad, "wb").write(buf[:i])
        attack()
    for _ in range(300):
        b = bytearray(buf)
        for _ in range(rng.integers(1, 5)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        open(bad, "wb").write(bytes(b))
        attack()
    assert time.time() - t0 < 60, "corrupt-input handling too slow"
