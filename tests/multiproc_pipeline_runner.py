"""Subprocess runner for the 2-process x 4-virtual-device in-HBM pipeline test.

Usage: python tests/multiproc_pipeline_runner.py <pid> <nproc> <ml_root> <out> <port>
Runs the full 3-coordinate coordinate-descent pipeline under jax.distributed:
FE trains SPMD over all 8 devices; RE entities are round-robin owned per
process and merged through the model-file exchange. Each process writes its
metric ladder to metrics_<pid>.json for the test to compare.
"""
import json
import os
import sys

pid, nproc, ml_root, out_dir, port = (int(sys.argv[1]), int(sys.argv[2]),
                                      sys.argv[3], sys.argv[4], sys.argv[5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdmix_tpu.workflow.pipeline import run_gdmix_in_memory  # noqa: E402
from tests.test_e2e_pipeline import _config  # noqa: E402

metrics = run_gdmix_in_memory(_config(ml_root, out_dir), num_sweeps=2)
with open(os.path.join(out_dir, f"metrics_{pid}.json"), "w") as f:
    json.dump(metrics, f)
print(f"proc {pid}: {metrics}", flush=True)
