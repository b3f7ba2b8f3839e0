"""In-HBM pipeline tests: must match the file-based workflow's metrics (same
math, no intermediate file I/O) and support multi-sweep coordinate descent."""
import os

import numpy as np
import pytest

from gdmix_tpu.data import movielens
from gdmix_tpu.workflow.config import WorkflowConfig
from gdmix_tpu.workflow.pipeline import run_gdmix_in_memory
from gdmix_tpu.workflow.single_node import run_gdmix_single_node

from tests.test_e2e_pipeline import _config


@pytest.fixture(scope="module")
def ml_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mlmem"))
    data = movielens.generate_synthetic(num_users=100, num_movies=120,
                                        num_ratings=6000, seed=13)
    return movielens.prepare_gdmix_data(root, data)


def test_matches_file_based_workflow(ml_data, tmp_path):
    mem_metrics = run_gdmix_in_memory(_config(ml_data, str(tmp_path / "mem")))
    file_metrics = run_gdmix_single_node(_config(ml_data, str(tmp_path / "file")))
    assert set(mem_metrics) == set(file_metrics)
    for name in mem_metrics:
        # identical math, different plumbing: AUCs agree tightly
        assert abs(mem_metrics[name] - file_metrics[name]) < 2e-3, \
            (name, mem_metrics[name], file_metrics[name])
    # final artifacts exist
    assert os.path.isfile(os.path.join(str(tmp_path / "mem"), "global",
                                       "models", "part-00000.avro"))
    assert os.path.isfile(os.path.join(str(tmp_path / "mem"), "per-movie",
                                       "metric", "evalSummary.json"))


def test_multi_sweep_improves_or_holds(ml_data, tmp_path):
    one = run_gdmix_in_memory(_config(ml_data, str(tmp_path / "s1")),
                              num_sweeps=1)
    two = run_gdmix_in_memory(_config(ml_data, str(tmp_path / "s2")),
                              num_sweeps=2)
    # After a second sweep the final coordinate's AUC must not regress
    # (coordinate descent on a convex-per-block objective).
    assert two["per-movie"] >= one["per-movie"] - 1e-3
