"""REAL two-process jax.distributed fixed-effect training (the multi-host path):
two OS processes, file sharding per process, make_array_from_process_local_data,
cross-process all-reduce — result must equal a single-process run."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from gdmix_tpu.io.feature_list import write_feature_list
from gdmix_tpu.io.input_pipeline import write_per_record
from gdmix_tpu.io.metadata import DatasetMetadata
from gdmix_tpu.io.model_avro import load_linear_models_from_avro
from gdmix_tpu.io.scores import read_scores

from tests.test_fixed_effect_lr import _scipy_fe_oracle

D = 6
N_PER_FILE = 64  # equal shards → identical local padded shapes per process


def _write_two_file_dataset(root):
    from scipy.special import expit
    rng = np.random.RandomState(5)
    md_json = {"features": [
        {"name": "global", "dtype": "float", "shape": [D], "isSparse": True},
        {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
        {"name": "weight", "dtype": "float", "shape": [], "isSparse": False}],
        "labels": [{"name": "response", "dtype": "int", "shape": [],
                    "isSparse": False}]}
    md_file = os.path.join(root, "tensor_metadata.json")
    with open(md_file, "w") as f:
        json.dump(md_json, f)
    md = DatasetMetadata.from_file(md_file)
    train_dir = os.path.join(root, "trainingData")
    os.makedirs(train_dir, exist_ok=True)
    X_all, y_all, w_all = [], [], []
    uid = 0
    w_true = rng.randn(D)
    for fi in range(2):
        X = rng.randn(N_PER_FILE, D) * (rng.rand(N_PER_FILE, D) < 0.6)
        y = (rng.rand(N_PER_FILE) < expit(X @ w_true)).astype(np.int64)
        weight = np.ones(N_PER_FILE, np.float32)
        cols = {"uid": np.arange(uid, uid + N_PER_FILE, dtype=np.int64),
                "weight": weight, "response": y}
        ragged_idx = [np.flatnonzero(X[i]).astype(np.int64)
                      for i in range(N_PER_FILE)]
        ragged_val = [X[i][X[i] != 0] for i in range(N_PER_FILE)]
        write_per_record(os.path.join(train_dir, f"part-{fi}.tfrecord"), md,
                         cols, "global", ragged_idx, ragged_val)
        X_all.append(X)
        y_all.append(y)
        w_all.append(weight)
        uid += N_PER_FILE
    write_feature_list([(f"f{i}", "") for i in range(D)],
                       os.path.join(root, "features.csv"))
    return (np.concatenate(X_all), np.concatenate(y_all).astype(np.float64),
            np.concatenate(w_all).astype(np.float64))


def test_two_process_training_matches_oracle(tmp_path):
    root = str(tmp_path)
    X, y, w = _write_two_file_dataset(root)
    os.makedirs(os.path.join(root, "models_mp"))
    os.makedirs(os.path.join(root, "scores_mp"))

    runner = os.path.join(os.path.dirname(__file__), "multiproc_runner.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, runner, str(pid), "2", root],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in range(2)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"proc {pid} failed:\n{outs[pid]}"

    (coeffs,) = load_linear_models_from_avro(
        os.path.join(root, "models_mp", "part-00000.avro"),
        os.path.join(root, "features.csv"))
    oracle = _scipy_fe_oracle(X, y, np.zeros(len(y)), w, lam=0.7,
                              regularize_bias=False)
    np.testing.assert_allclose(coeffs, oracle, atol=1e-6)

    # each process wrote its own score shard with its local uids
    from gdmix_tpu.params import Params
    sp = Params(action="train", stage="fixed_effect",
                label_column_name="response", uid_column_name="uid",
                weight_column_name="weight",
                prediction_score_column_name="predictionScore")
    got = read_scores(os.path.join(root, "scores_mp"), sp)
    assert len(got["uid"]) == 2 * N_PER_FILE
    np.testing.assert_array_equal(np.sort(got["uid"]),
                                  np.arange(2 * N_PER_FILE))
    wq, b = coeffs[:-1], coeffs[-1]
    order = np.argsort(got["uid"])
    np.testing.assert_allclose(got["predictionScorePerCoordinate"][order],
                               X @ wq + b, atol=1e-6)
