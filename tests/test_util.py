"""Utility tests: timing phases, custom_input_fn hook, copy_to_local."""
import logging
import os

import numpy as np

from gdmix_tpu.util.timing import phase, rss_gb


def test_phase_logs(caplog):
    with caplog.at_level(logging.INFO, logger="gdmix_tpu.util.timing"):
        with phase("unit-test-phase"):
            pass
    assert any("unit-test-phase" in r.message for r in caplog.records)


def test_rss():
    assert rss_gb() > 0


# module-level hook target for the custom_input_fn test
def fake_loader(input_path, metadata, feature_bag, num_shards, shard_index):
    from gdmix_tpu.io.input_pipeline import PerRecordData
    n = 4
    return PerRecordData(
        columns={"uid": np.arange(n, dtype=np.int64),
                 "response": np.array([0, 1, 0, 1], np.int64)},
        indices=np.zeros((n, 8), np.int32), values=np.zeros((n, 8)),
        nnz=np.zeros(n, np.int32), num_samples=n)


def test_custom_input_fn():
    from gdmix_tpu.io.input_pipeline import read_per_record
    from gdmix_tpu.io.metadata import DatasetMetadata
    md = DatasetMetadata.from_json({"features": [], "labels": []})
    data = read_per_record("/nonexistent", md,
                           custom_input_fn="tests.test_util.fake_loader")
    assert data.num_samples == 4
    np.testing.assert_array_equal(data.columns["uid"], np.arange(4))


def test_copy_to_local(tmp_path, monkeypatch):
    from tests.test_fixed_effect_lr import _make_dataset, _params
    from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
    from gdmix_tpu import constants
    monkeypatch.chdir(tmp_path)
    ds = _make_dataset(tmp_path)
    model_params, base_params = _params(ds, tmp_path, copy_to_local=True)
    model = FixedEffectLRModel(model_params, base_params)
    ctx = {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
           constants.IS_CHIEF: True}
    model.train(model_params.training_data_dir, None, ds["md_file"],
                model_params.output_model_dir, ctx, base_params)
    assert os.path.isdir("local_training_input_dir_0")
    assert model.model_coefficients is not None
