"""Sweep runner + driver inference-mode e2e through the trainer CLI."""
import json
import os

import numpy as np
import pytest

from gdmix_tpu.data import movielens
from gdmix_tpu.gdmix import run as gdmix_run
from gdmix_tpu.io.scores import read_scores
from gdmix_tpu.workflow.single_node import run_gdmix_single_node
from gdmix_tpu.workflow.sweep import expand_grid, run_sweep

from tests.test_e2e_pipeline import _config


def test_expand_grid():
    grid = expand_grid({"l2_reg_weight": [0.5, 2.0], "has_intercept": [True]})
    assert grid == [{"l2_reg_weight": 0.5, "has_intercept": True},
                    {"l2_reg_weight": 2.0, "has_intercept": True}]


def test_sweep_selects_best(tmp_path):
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=40, num_movies=50,
                                        num_ratings=2500, seed=31)
    ml = movielens.prepare_gdmix_data(root, data)
    cfg = _config(ml, os.path.join(root, "ignored"))
    # 0 solver iterations = untrained models everywhere -> guaranteed loser
    best, grid = run_sweep(cfg, {"num_of_lbfgs_iterations": [100, 0]},
                           metric_coordinate="per-movie",
                           output_dir=os.path.join(root, "sweep"))
    assert grid[best]["num_of_lbfgs_iterations"] == 100
    with open(os.path.join(root, "sweep", "best", "evals.json")) as f:
        evals = json.load(f)
    assert evals["best model index"] == best
    # best model + metrics copied
    assert os.path.isfile(os.path.join(root, "sweep", "best",
                                       "part-00000.avro"))
    assert os.path.isfile(os.path.join(root, "sweep", "best_metrics",
                                       "evalSummary.json"))


def test_cli_inference_fixed_and_random(tmp_path):
    """Train a full pipeline, then run --action=inference for both stages
    through the trainer CLI (reference run_inference path)."""
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=40, num_movies=50,
                                        num_ratings=2500, seed=33)
    ml = movielens.prepare_gdmix_data(root, data)
    out = os.path.join(root, "train_out")
    cfg = _config(ml, out)
    run_gdmix_single_node(cfg)

    # ---- fixed-effect inference ----
    fe_ts = os.path.join(root, "fe_infer_train")
    fe_vs = os.path.join(root, "fe_infer_valid")
    os.makedirs(fe_ts)
    os.makedirs(fe_vs)
    gdmix_run([
        "--action=inference", "--stage=fixed_effect",
        "--model_type=logistic_regression",
        "--prediction_score_column_name=predictionScore",
        "--uid_column_name=uid", "--label_column_name=response",
        f"--training_score_dir={fe_ts}", f"--validation_score_dir={fe_vs}",
        f"--metadata_file={os.path.join(ml, 'global', 'metadata', 'tensor_metadata.json')}",
        f"--training_data_dir={os.path.join(ml, 'global', 'trainingData')}",
        f"--validation_data_dir={os.path.join(ml, 'global', 'validationData')}",
        "--feature_bag=global",
        f"--feature_file={os.path.join(ml, 'global', 'featureList', 'global')}",
        f"--output_model_dir={os.path.join(out, 'global', 'models')}",
    ])
    got = read_scores(fe_vs, _params_shim())
    assert len(got["uid"]) > 0

    # ---- random-effect inference ----
    part_dir = os.path.join(out, "per-user", "partition")
    re_ts = os.path.join(root, "re_infer_train")
    re_vs = os.path.join(root, "re_infer_valid")
    for d in (re_ts, re_vs):
        os.makedirs(os.path.join(d, "partitionId=0"), exist_ok=True)
        os.makedirs(os.path.join(d, "partitionId=1"), exist_ok=True)
    gdmix_run([
        "--action=inference", "--stage=random_effect",
        "--model_type=logistic_regression",
        "--prediction_score_column_name=predictionScore",
        "--uid_column_name=uid", "--label_column_name=response",
        f"--partition_list_file={os.path.join(part_dir, 'partitionList.txt')}",
        f"--training_score_dir={re_ts}", f"--validation_score_dir={re_vs}",
        f"--metadata_file={os.path.join(part_dir, 'metadata', 'tensor_metadata.json')}",
        f"--training_data_dir={os.path.join(part_dir, 'trainingData')}",
        f"--validation_data_dir={os.path.join(part_dir, 'validationData')}",
        "--feature_bag=per_user", "--partition_entity=user_id",
        f"--feature_file={os.path.join(ml, 'per_user', 'featureList', 'per_user')}",
        f"--output_model_dir={os.path.join(out, 'per-user', 'models')}",
    ])
    got = read_scores(re_vs, _params_shim())
    assert len(got["uid"]) > 0


def _params_shim():
    from gdmix_tpu.params import SchemaParams
    return SchemaParams(uid_column_name="uid", label_column_name="response",
                        prediction_score_column_name="predictionScore")
