"""The reference's THIRD operating mode (README.md:21-22, 85-87): the fixed
effect is an arbitrary user model trained OUTSIDE gdmix; its score files are
the input to random-effect training. The interface is file IO only: score
avros → DataPartitioner(trainingScoreDir/validationScoreDir) → RE trainer.
This exercises that exact CLI flow and asserts the RE coordinate lifts AUC
over the external scores."""
import os

import numpy as np

from gdmix_tpu.data import movielens
from gdmix_tpu.io.input_pipeline import read_per_record
from gdmix_tpu.io.metadata import DatasetMetadata
from gdmix_tpu.io.scores import read_scores, write_scores
from gdmix_tpu.ops.metrics import auc
from gdmix_tpu.params import Params
from gdmix_tpu.workflow import jobs


def _external_scores(ml, split, seed=11):
    """Stand-in for a user's own fixed-effect model: a noisy linear scorer on
    the global bag (trained nowhere near gdmix), scored per uid."""
    md = DatasetMetadata.from_file(
        os.path.join(ml, "global", "metadata", "tensor_metadata.json"))
    data = read_per_record(os.path.join(ml, "global", split), md, "global")
    d = md.feature_shape("global")[0] if hasattr(md, "feature_shape") else \
        int(data.indices.max()) + 1
    rng = np.random.RandomState(seed)
    w = rng.randn(d) * 0.3
    logits = (np.take(w, data.indices) * data.values).sum(axis=1)
    return (data.columns["uid"].astype(np.int64), logits,
            data.columns["response"].astype(np.float64))


def test_external_fixed_effect_scores_drive_re_training(tmp_path):
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=100, num_movies=80,
                                        num_ratings=6000, seed=4)
    ml = movielens.prepare_gdmix_data(root, data)

    # 1. the user's external model scores both splits (predictionScore ==
    #    total score; perCoordinate == same, single external coordinate)
    sp = Params(action="train", stage="fixed_effect",
                label_column_name="response", uid_column_name="uid",
                prediction_score_column_name="predictionScore")
    score_dirs = {}
    val_auc_external = None
    for split in ("trainingData", "validationData"):
        uids, logits, labels = _external_scores(ml, split)
        sdir = os.path.join(root, "external_scores", split)
        write_scores(os.path.join(sdir, "part-00000.avro"), sp, uids, logits,
                     scores_per_coordinate=logits)
        score_dirs[split] = sdir
        if split == "validationData":
            val_auc_external = float(auc(logits, labels))

    # 2. DataPartitioner consumes the external scores exactly as it would a
    #    gdmix fixed effect's (offset = total − perCoordinate... for an
    #    external model the offset IS the total score: perCoordinate of the
    #    PREVIOUS RE pass is absent on the first sweep, so pass zeros)
    zero_dirs = {}
    for split, sdir in score_dirs.items():
        uids, logits, _ = _external_scores(ml, split)
        zdir = os.path.join(root, "zero_scores", split)
        write_scores(os.path.join(zdir, "part-00000.avro"), sp, uids,
                     logits, scores_per_coordinate=np.zeros_like(logits))
        zero_dirs[split] = zdir

    part_dir = os.path.join(root, "per-user", "partition")
    jobs.main([
        "partitioner",
        "--trainingDataDir", os.path.join(ml, "per_user", "trainingData"),
        "--validationDataDir", os.path.join(ml, "per_user", "validationData"),
        "--metadataFile", os.path.join(ml, "per_user", "metadata",
                                       "tensor_metadata.json"),
        "--partitionId", "user_id",
        "--numPartitions", "1",
        "--featureBag", "per_user",
        "--partitionedTrainingDataDir", os.path.join(part_dir,
                                                     "trainingData"),
        "--partitionedValidationDataDir", os.path.join(part_dir,
                                                       "validationData"),
        "--outputMetadataFile", os.path.join(part_dir, "metadata",
                                             "tensor_metadata.json"),
        "--outputPartitionListFile", os.path.join(part_dir,
                                                  "partitionList.txt"),
        "--uidColumnName", "uid",
        "--predictionScoreColumnName", "predictionScore",
        "--trainingScoreDir", zero_dirs["trainingData"],
        "--validationScoreDir", zero_dirs["validationData"],
    ])
    assert os.path.isfile(os.path.join(part_dir, "partitionList.txt"))

    # 3. RE trainer on the partitions (the trainer CLI the k8s/dag modes run)
    from gdmix_tpu.gdmix import run as gdmix_run
    re_dir = os.path.join(root, "per-user")
    gdmix_run([
        "--action=train", "--stage=random_effect",
        "--model_type=logistic_regression",
        "--label_column_name=response", "--uid_column_name=uid",
        "--prediction_score_column_name=predictionScore",
        f"--partition_list_file={os.path.join(part_dir, 'partitionList.txt')}",
        f"--metadata_file={os.path.join(part_dir, 'metadata', 'tensor_metadata.json')}",
        f"--training_data_dir={os.path.join(part_dir, 'trainingData')}",
        f"--validation_data_dir={os.path.join(part_dir, 'validationData')}",
        "--partition_entity=user_id", "--feature_bag=per_user",
        f"--feature_file={os.path.join(ml, 'per_user', 'featureList', 'per_user')}",
        f"--output_model_dir={os.path.join(re_dir, 'models')}",
        f"--training_score_dir={os.path.join(re_dir, 'train_scores')}",
        f"--validation_score_dir={os.path.join(re_dir, 'validation_scores')}",
        "--l2_reg_weight=1.0", "--regularize_bias=False",
        "--lbfgs_tolerance=1e-12", "--num_of_lbfgs_iterations=100",
    ])

    # 4. per-user RE on top of the external scores must lift validation AUC
    got = read_scores(
        os.path.join(re_dir, "validation_scores", "partitionId=0"), sp)
    re_auc = float(auc(got["predictionScore"], got["response"]))
    assert re_auc > val_auc_external + 0.01, (
        f"external {val_auc_external:.4f} -> re {re_auc:.4f}")
