"""Subprocess runner for the real two-process deep-tower training test.

Usage: python tests/multiproc_deep_tower_runner.py <pid> <nproc> <detext_root>
           <out_root> <port>
Each process participates in SPMD mini-batch Adam over the 2x2-device global
mesh (per-process batch shards, replicated params, all-reduced grads —
models/deep_tower.py _batch_slice), then writes its interleaved score slice.
≡ the reference's DeText coordinate on TFJob worker replicas
(gdmix-workflow distributed/container_ops.py:91-114), re-designed SPMD.
"""
import os
import sys

pid, nproc, detext_root, out_root, port = (int(sys.argv[1]), int(sys.argv[2]),
                                           sys.argv[3], sys.argv[4],
                                           sys.argv[5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdmix_tpu import constants  # noqa: E402
from tests.test_deep_tower import _build  # noqa: E402

model, base = _build(detext_root, out_root, num_epochs=3, batch_size=256)
ctx = {constants.TASK_INDEX: pid, constants.NUM_WORKERS: nproc,
       constants.IS_CHIEF: pid == 0}
model.train(model.training_data_dir, model.validation_data_dir,
            model.metadata_file, model.checkpoint_path, ctx, base)
print(f"proc {pid}: done", flush=True)
