"""Interop against the REFERENCE's own static fixtures (read-only at
/root/reference): files produced by the reference toolchain must parse with our
clean-room codecs and train end-to-end. This is the hard compatibility proof —
no re-encoding through our own writers."""
import os

import numpy as np
import pytest

from gdmix_tpu import constants
from gdmix_tpu.io import avro
from gdmix_tpu.io.input_pipeline import read_per_entity_grouped, read_per_record
from gdmix_tpu.io.metadata import DatasetMetadata

REF = "/root/reference"
FE_DIR = f"{REF}/gdmix-trainer/test/resources/fe_lbfgs"
GROUPED = f"{REF}/gdmix-trainer/test/resources/grouped_per_member_train"
SPARK_DATA = f"{REF}/gdmix-data/src/test/resources/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def test_reference_metadata_parses():
    md = DatasetMetadata.from_file(f"{FE_DIR}/metadata/tensor_metadata.json")
    assert md.num_features("global") == 306
    assert md.has_label("response")
    # the reference's invalid-metadata fixtures must fail like theirs do
    for bad in ("invalid_type", "invalid_name", "invalid_shape",
                "duplicated_names"):
        with pytest.raises((ValueError, TypeError)):
            DatasetMetadata.from_file(
                f"{REF}/gdmix-trainer/test/resources/metadata/{bad}.json")


def test_reference_per_record_tfrecord_reads():
    md = DatasetMetadata.from_file(f"{FE_DIR}/metadata/tensor_metadata.json")
    data = read_per_record(f"{FE_DIR}/training_data", md, "global")
    assert data.num_samples > 0
    assert data.indices is not None
    assert np.all(data.columns["weight"] > 0)
    assert data.columns["uid"].dtype == np.int64
    # sparse entries live inside the declared feature space
    for i in range(data.num_samples):
        m = data.nnz[i]
        assert np.all(data.indices[i, :m] < 306)


def test_reference_per_record_trains_fe(tmp_path):
    """Train the fixed effect directly on the reference's own tfrecord."""
    from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
    from gdmix_tpu.params import FixedLRParams, Params
    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    mp = FixedLRParams(
        metadata_file=f"{FE_DIR}/metadata/tensor_metadata.json",
        output_model_dir=model_dir,
        training_data_dir=f"{FE_DIR}/training_data",
        feature_bag="global", dtype="float64", regularize_bias=False,
        l2_reg_weight=1.0,
        disable_fixed_effect_scoring_after_training=True)
    bp = Params(action="train", stage="fixed_effect",
                label_column_name="response", uid_column_name="uid",
                weight_column_name="weight",
                prediction_score_column_name="predictionScore")
    model = FixedEffectLRModel(mp, bp)
    model.train(mp.training_data_dir, None, mp.metadata_file, model_dir,
                {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
                 constants.IS_CHIEF: True}, bp)
    assert model.model_coefficients is not None
    assert np.isfinite(model.model_coefficients).all()


def test_reference_grouped_tfrecord_reads():
    md = DatasetMetadata.from_file(f"{GROUPED}/data.json")
    groups = read_per_entity_grouped(f"{GROUPED}/data.tfrecord", md,
                                     "memberId", "per_member")
    assert len(groups) > 0
    for g in groups:
        assert g.sample_count > 0
        # sparse rows come back in either storage form (ragged from the pure-
        # python decoder, padded blocks from the native columnar fast path)
        assert len(list(g.iter_ragged())) == g.sample_count
        assert "response" in g.columns


def test_reference_spark_avro_fixtures_read():
    """The Spark jobs' avro fixtures decode with our OCF reader."""
    recs = list(avro.read_records(f"{SPARK_DATA}/TrainData.avro"))
    assert len(recs) > 0
    # expected-output fixtures too (grouped per-member data)
    grouped = list(avro.read_records(
        f"{SPARK_DATA}/ExpectedPerMemberTrainData.avro"))
    assert len(grouped) > 0


def test_reference_member_ids_avro():
    recs = list(avro.read_records(
        f"{REF}/gdmix-trainer/test/resources/member_ids.avro"))
    assert len(recs) > 0
