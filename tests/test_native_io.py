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
