"""DeText-style pipeline e2e: deep fixed-effect tower → per-user → per-movie REs
(the reference's second headline pipeline, README.md:312-316)."""
import os

import numpy as np
import pytest

from gdmix_tpu.data import movielens
from gdmix_tpu.workflow.config import WorkflowConfig
from gdmix_tpu.workflow.single_node import run_gdmix_single_node


def test_detext_pipeline_auc_lift(tmp_path):
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=80, num_movies=100,
                                        num_ratings=6000, seed=5)
    ml = movielens.prepare_gdmix_data(root, data, with_detext=True)
    detext = os.path.join(ml, "detext")

    gdmix_config = {
        "model_type": "detext",
        "label_column_name": "response",
        "uid_column_name": "uid",
        "prediction_score_column_name": "predictionScore",
        "weight_column_name": "weight",
    }
    re_gdmix_config = dict(gdmix_config, model_type="logistic_regression")

    def re_coord(bag, entity):
        return {
            "training_data_dir": os.path.join(ml, bag, "trainingData"),
            "validation_data_dir": os.path.join(ml, bag, "validationData"),
            "feature_file": os.path.join(ml, bag, "featureList", bag),
            "feature_bag": bag,
            "metadata_file": os.path.join(ml, bag, "metadata",
                                          "tensor_metadata.json"),
            "l2_reg_weight": 1.0,
            "regularize_bias": False,
            "partition_entity": entity,
            "num_partitions": 1,
            "gdmix_config": re_gdmix_config,
        }

    cfg = WorkflowConfig.from_dict({
        "output_dir": os.path.join(root, "detext-training"),
        "fixed_effect_config": {"global": {
            "training_data_dir": os.path.join(detext, "trainingData"),
            "validation_data_dir": os.path.join(detext, "validationData"),
            "metadata_file": os.path.join(detext, "metadata",
                                          "tensor_metadata.json"),
            "vocab_file": os.path.join(detext, "vocab.txt"),
            "feature_bag": "wide_ftrs_sp",
            "num_epochs": 5,
            "batch_size": 256,
            "num_units": 16,
            "num_filters": 8,
            "num_hidden": 16,
            "learning_rate": 0.02,
            "gdmix_config": gdmix_config,
        }},
        "random_effect_config": {
            "per-user": re_coord("per_user", "user_id"),
            "per-movie": re_coord("per_movie", "movie_id"),
        },
    })

    metrics = run_gdmix_single_node(cfg)
    print("detext pipeline metrics:", metrics)
    assert metrics["global"] > 0.55
    assert metrics["per-user"] > metrics["global"]
    assert metrics["per-movie"] > metrics["per-user"]
