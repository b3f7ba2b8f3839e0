"""Trainer CLI tests: one argv drives Params + model params (reference gdmix.py)."""
import os

import numpy as np
import pytest

from gdmix_tpu.gdmix import run
from gdmix_tpu.io.model_avro import load_linear_models_from_avro
from gdmix_tpu.params import FixedLRParams, Params, REParams, from_argv

from tests.test_fixed_effect_lr import _make_dataset


def test_from_argv_parsing():
    argv = ["--action=train", "--stage", "fixed_effect",
            "--label_column_name=response", "--uid_column_name=uid",
            "--l2_reg_weight=0.5", "--batch_size", "64",
            "--has_intercept=True", "--unknown_flag=whatever",
            "--metadata_file=/x.json", "--output_model_dir=/m"]
    params = from_argv(Params, argv)
    assert params.action == "train" and params.stage == "fixed_effect"
    model_params = from_argv(FixedLRParams, argv)
    assert model_params.l2_reg_weight == 0.5
    assert model_params.batch_size == 64
    assert model_params.metadata_file == "/x.json"
    re_params = from_argv(REParams, argv + ["--partition_entity=user_id"])
    assert re_params.partition_entity == "user_id"


def test_cli_fixed_effect_train(tmp_path):
    ds = _make_dataset(tmp_path)
    model_dir = os.path.join(ds["root"], "models")
    score_dir = os.path.join(ds["root"], "ts")
    vdir = os.path.join(ds["root"], "vs")
    for d in (model_dir, score_dir, vdir):
        os.makedirs(d, exist_ok=True)
    run(["--action=train", "--stage=fixed_effect",
         "--model_type=logistic_regression",
         "--label_column_name=response", "--uid_column_name=uid",
         "--weight_column_name=weight",
         "--prediction_score_column_name=predictionScore",
         f"--training_score_dir={score_dir}",
         f"--validation_score_dir={vdir}",
         f"--metadata_file={ds['md_file']}",
         f"--training_data_dir={ds['train_dir']}",
         f"--feature_file={ds['feature_file']}",
         "--feature_bag=global",
         f"--output_model_dir={model_dir}",
         "--l2_reg_weight=0.7", "--regularize_bias=false",
         "--dtype=float64", "--sparsity_threshold=0.0"])
    (model,) = load_linear_models_from_avro(
        os.path.join(model_dir, "part-00000.avro"), ds["feature_file"])
    assert model.shape == (7,)
    assert np.any(model != 0)
    assert os.path.isfile(os.path.join(score_dir, "part-00000.avro"))


def test_cli_help_lists_flags(capsys):
    """--help (and bare invocation) must print usage, not a traceback
    (reference smart-arg prints generated help)."""
    from gdmix_tpu.gdmix import run
    run(["--help"])
    out = capsys.readouterr().out
    assert "usage: python -m gdmix_tpu.gdmix" in out
    for flag in ("--l2_reg_weight", "--num_of_lbfgs_iterations",
                 "--partition_entity", "--batch_solver"):
        assert flag in out
    run([])
    assert "usage:" in capsys.readouterr().out
