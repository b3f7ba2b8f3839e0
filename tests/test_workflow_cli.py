"""Workflow CLI / job-CLI / DAG tests (reference test_workflow_generator.py style:
job sequences asserted as data) plus a full CLI-driven pipeline run."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from gdmix_tpu.data import movielens
from gdmix_tpu.workflow.config import WorkflowConfig
from gdmix_tpu.workflow.distributed import generate_job_dag

from tests.test_e2e_pipeline import _config


def test_job_dag_sequence(tmp_path):
    cfg = _config("/data/movieLens", str(tmp_path / "out"))
    dag = generate_job_dag(cfg)
    names = [j["name"] for j in dag]
    assert names == [
        "global-tf-train", "global-compute-metric",
        "per-user-partition", "per-user-tf-train", "per-user-compute-metric",
        "per-movie-partition", "per-movie-tf-train", "per-movie-compute-metric",
    ]
    deps = {j["name"]: j["depends_on"] for j in dag}
    assert deps["per-user-partition"] == ["global-compute-metric"]
    assert deps["per-movie-partition"] == ["per-user-compute-metric"]
    assert dag[0]["command"][:3] == ["python", "-m", "gdmix_tpu.gdmix"]


def test_workflow_main_in_memory(tmp_path):
    """End-to-end through the workflow CLI entry (in-process call)."""
    import yaml
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=50, num_movies=60,
                                        num_ratings=3000, seed=21)
    ml = movielens.prepare_gdmix_data(root, data)
    cfg = _config(ml, os.path.join(root, "out"))
    cfg_file = os.path.join(root, "config.yaml")
    with open(cfg_file, "w") as f:
        yaml.safe_dump({"output_dir": cfg.output_dir,
                        "fixed_effect_config": cfg.fixed_effect_config,
                        "random_effect_config": cfg.random_effect_config}, f)

    from gdmix_tpu.workflow.main import main
    metrics = main(["--config_path", cfg_file, "--mode", "in_memory"])
    assert set(metrics) == {"global", "per-user", "per-movie"}
    assert metrics["per-movie"] > metrics["global"]


def test_jobs_cli_evaluator(tmp_path):
    from gdmix_tpu.io.scores import write_scores
    from gdmix_tpu.params import SchemaParams
    sp = SchemaParams(uid_column_name="uid", label_column_name="response",
                      prediction_score_column_name="predictionScore")
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 100).astype(float)
    s = rng.randn(100) + y
    sdir = str(tmp_path / "scores")
    write_scores(os.path.join(sdir, "p.avro"), sp, np.arange(100), s, labels=y)
    out = str(tmp_path / "metric")

    from gdmix_tpu.workflow.jobs import main as jobs_main
    jobs_main(["evaluator", "--metricsInputDir", sdir,
               "--outputMetricFile", out])
    with open(os.path.join(out, "evalSummary.json")) as f:
        assert 0.5 < json.load(f)["auc"] <= 1.0


def test_compile_dag_cli(tmp_path):
    import yaml
    cfg = _config("/data/ml", str(tmp_path / "out"))
    cfg_file = str(tmp_path / "c.yaml")
    with open(cfg_file, "w") as f:
        yaml.safe_dump({"output_dir": cfg.output_dir,
                        "fixed_effect_config": cfg.fixed_effect_config,
                        "random_effect_config": cfg.random_effect_config}, f)
    dag_file = str(tmp_path / "dag.json")
    from gdmix_tpu.workflow.main import main
    main(["--config_path", cfg_file, "--compile_dag_to", dag_file])
    with open(dag_file) as f:
        dag = json.load(f)
    assert len(dag["jobs"]) == 8
