"""Driver tests with mock models (reference test/drivers/test_driver.py pattern):
partition assignment, per-partition train/predict dispatch, context preparation."""
import os
from unittest.mock import Mock

import pytest

from gdmix_tpu import constants
from gdmix_tpu.drivers.driver import FixedEffectDriver, RandomEffectDriver
from gdmix_tpu.drivers.factory import get_driver, get_model
from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
from gdmix_tpu.models.random_effect_lr import RandomEffectLRModel
from gdmix_tpu.params import Params


def _mock_model(tmp_path, with_passive=True):
    m = Mock()
    m.checkpoint_path = str(tmp_path / "models")
    m.training_data_dir = str(tmp_path / "train")
    m.validation_data_dir = str(tmp_path / "valid")
    m.passive_training_data_dir = str(tmp_path / "train")
    m.metadata_file = str(tmp_path / "md.json")
    return m


def _re_params(tmp_path, plist):
    return Params(action="train", stage="random_effect",
                  label_column_name="response", uid_column_name="uid",
                  prediction_score_column_name="predictionScore",
                  training_score_dir=str(tmp_path / "ts"),
                  validation_score_dir=str(tmp_path / "vs"),
                  partition_list_file=plist)


def test_random_effect_partition_assignment(tmp_path):
    plist = str(tmp_path / "partitionList.txt")
    with open(plist, "w") as f:
        f.write("0,1,2,3,4")
    model = _mock_model(tmp_path)
    driver = RandomEffectDriver(_re_params(tmp_path, plist), model)
    # single process takes every partition
    assert driver._get_partition_list() == [0, 1, 2, 3, 4]


def test_random_effect_trains_each_partition(tmp_path):
    plist = str(tmp_path / "partitionList.txt")
    with open(plist, "w") as f:
        f.write("0,2")
    model = _mock_model(tmp_path)
    for pid in (0, 2):
        for sub in ("train", "valid", "models", "ts", "vs"):
            os.makedirs(tmp_path / sub / f"partitionId={pid}", exist_ok=True)
        # non-empty training dir
        (tmp_path / "train" / f"partitionId={pid}" / "d.tfrecord").write_text("x")
    driver = RandomEffectDriver(_re_params(tmp_path, plist), model)
    driver.run_training(driver.base_params)
    assert model.train.call_count == 2
    # anchored paths and RE context keys
    _, kwargs = model.train.call_args
    assert kwargs["training_data_dir"].endswith("partitionId=2")
    ctx = kwargs["execution_context"]
    assert constants.ACTIVE_TRAINING_OUTPUT_FILE in ctx
    assert ctx[constants.PARTITION_INDEX] == 2


def test_empty_partition_skipped(tmp_path):
    plist = str(tmp_path / "partitionList.txt")
    with open(plist, "w") as f:
        f.write("0")
    model = _mock_model(tmp_path)
    os.makedirs(tmp_path / "train" / "partitionId=0")  # empty
    os.makedirs(tmp_path / "valid" / "partitionId=0")
    driver = RandomEffectDriver(_re_params(tmp_path, plist), model)
    driver.run_training(driver.base_params)
    assert model.train.call_count == 0


def test_fixed_effect_partition_is_task_index(tmp_path):
    model = _mock_model(tmp_path)
    params = Params(action="train", stage="fixed_effect",
                    label_column_name="response", uid_column_name="uid",
                    prediction_score_column_name="p")
    driver = FixedEffectDriver(params, model)
    assert driver._get_partition_list() == [0]
    assert driver._anchor_directory("/x/y", 0) == "/x/y"  # no anchoring


def test_factory_wiring(tmp_path):
    """(stage, model_type) → driver/model classes (reference test/factory/*)."""
    import json
    md = {"features": [{"name": "b", "dtype": "float", "shape": [2],
                        "isSparse": True}],
          "labels": [{"name": "response", "dtype": "int", "shape": [],
                      "isSparse": False}]}
    md_file = str(tmp_path / "md.json")
    with open(md_file, "w") as f:
        json.dump(md, f)
    argv = [f"--metadata_file={md_file}", "--output_model_dir=/tmp/x",
            "--feature_bag=b", "--partition_entity=e"]

    fe = Params(action="train", stage="fixed_effect",
                label_column_name="response", uid_column_name="uid",
                prediction_score_column_name="p")
    assert isinstance(get_model(fe, argv), FixedEffectLRModel)
    assert isinstance(get_driver(fe, argv), FixedEffectDriver)

    re = Params(action="train", stage="random_effect",
                label_column_name="response", uid_column_name="uid",
                prediction_score_column_name="p")
    assert isinstance(get_model(re, argv), RandomEffectLRModel)
    assert isinstance(get_driver(re, argv), RandomEffectDriver)


def test_invalid_partition_entity_fails(tmp_path):
    """Grouped read with an entity column missing from the metadata must raise
    (reference test_random_effect_lr_lbfgs_model.py:59-80 negative case)."""
    import json
    from gdmix_tpu.io.input_pipeline import read_per_entity_grouped
    from gdmix_tpu.io.metadata import DatasetMetadata
    md = DatasetMetadata.from_json({
        "features": [{"name": "user_id", "dtype": "long", "shape": [],
                      "isSparse": False}],
        "labels": []})
    with pytest.raises(ValueError, match="not found among the features"):
        read_per_entity_grouped(str(tmp_path), md, "bogus_entity")
