"""Subprocess runner for the real two-process jax.distributed FE test.

Usage: python tests/multiproc_runner.py <process_id> <num_processes> <data_root>
           [variance_mode] [coordinator_port] [stream_chunk_rows]
Each process shards the input files, trains the fixed effect SPMD, and the chief
saves the model — the genuine multi-host path (TF_CONFIG replacement).
stream_chunk_rows > 0 exercises multi-host OUT-OF-CORE ingestion: each process
streams its file shard in bounded-memory chunks (_device_batch_streamed).
"""
import os
import sys

pid, nproc, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
variance_mode = sys.argv[4] if len(sys.argv) > 4 and sys.argv[4] != "none" \
    else None
port = sys.argv[5] if len(sys.argv) > 5 else "9923"
stream_rows = int(sys.argv[6]) if len(sys.argv) > 6 else 0
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gdmix_tpu import constants  # noqa: E402
from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel  # noqa: E402
from gdmix_tpu.params import FixedLRParams, Params  # noqa: E402

model_params = FixedLRParams(
    metadata_file=os.path.join(root, "tensor_metadata.json"),
    output_model_dir=os.path.join(root, "models_mp"),
    training_data_dir=os.path.join(root, "trainingData"),
    feature_bag="global",
    feature_file=os.path.join(root, "features.csv"),
    l2_reg_weight=0.7, regularize_bias=False, dtype="float64",
    lbfgs_tolerance=1e-14, lbfgs_pgtol=1e-10, num_of_lbfgs_iterations=500,
    sparsity_threshold=0.0, fixed_effect_variance_mode=variance_mode,
    stream_chunk_rows=stream_rows)
base_params = Params(
    action="train", stage="fixed_effect", model_type="logistic_regression",
    label_column_name="response", uid_column_name="uid",
    weight_column_name="weight", prediction_score_column_name="predictionScore",
    training_score_dir=os.path.join(root, "scores_mp"))

model = FixedEffectLRModel(model_params, base_params)
ctx = {constants.TASK_INDEX: jax.process_index(),
       constants.NUM_WORKERS: jax.process_count(),
       constants.IS_CHIEF: jax.process_index() == 0}
model.train(model_params.training_data_dir, None,
            model_params.metadata_file, model_params.output_model_dir,
            ctx, base_params)
if variance_mode is not None and pid == 0:
    np.save(os.path.join(root, "variances_mp.npy"), model.variances)
print(f"proc {pid} done; coeffs[0:3]={model.model_coefficients[:3]}", flush=True)
