"""Distributed workflow: job DAG emission + multi-host launch.

The reference compiles a Kubeflow Pipeline of TFJob/SparkApplication CRDs
(gdmix-workflow/src/gdmixworkflow/distributed/container_ops.py). The TPU-native
equivalent has no separate Spark cluster or parameter servers to orchestrate —
one SPMD program per host covers every stage — so distribution reduces to:

  1. `generate_job_dag`: the explicit job sequence (for external schedulers —
     each node is a shell command on this package's CLI, chained by the same
     directory contract as the reference's container ops)
  2. `maybe_initialize_distributed`: `jax.distributed.initialize` from env
     (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — the TPU-world
     replacement for TF_CONFIG cluster specs)
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

from gdmix_tpu.workflow.config import (METRIC, PARTITION, TRAINING_SCORES,
                                       VALIDATION_SCORES, WorkflowConfig)

logger = logging.getLogger(__name__)


def maybe_initialize_distributed() -> Dict[str, int]:
    """Initialize jax.distributed from env if a coordinator is configured.
    Returns {process_id, num_processes}."""
    import jax
    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator:
        num_processes = int(os.environ["NUM_PROCESSES"])
        process_id = int(os.environ["PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logger.info("jax.distributed initialized: process %d/%d",
                    process_id, num_processes)
        return {"process_id": process_id, "num_processes": num_processes}
    return {"process_id": 0, "num_processes": 1}


def generate_job_dag(config: WorkflowConfig) -> List[dict]:
    """Explicit job list: [{name, type, depends_on, command}] — the reference's
    gen_workflow chain (workflow_generator.py:66-100) as portable data."""
    jobs: List[dict] = []
    root = config.output_dir

    (fe_name, fe_conf), = config.fixed_effect_config.items()
    fe_dir = os.path.join(root, fe_name)
    model_type = fe_conf.get("gdmix_config", {}).get("model_type",
                                                     "logistic_regression")
    jobs.append({
        "name": f"{fe_name}-tf-train",
        "type": "gdmix_tpu_train",
        "depends_on": [],
        "command": ["python", "-m", "gdmix_tpu.gdmix",
                    "--stage=fixed_effect", f"--model_type={model_type}",
                    f"--training_score_dir={os.path.join(fe_dir, TRAINING_SCORES)}",
                    f"--validation_score_dir={os.path.join(fe_dir, VALIDATION_SCORES)}"],
    })
    jobs.append({
        "name": f"{fe_name}-compute-metric",
        "type": "gdmix_tpu_evaluate",
        "depends_on": [f"{fe_name}-tf-train"],
        "command": ["python", "-m", "gdmix_tpu.workflow.jobs", "evaluator",
                    f"--metricsInputDir={os.path.join(fe_dir, VALIDATION_SCORES)}",
                    f"--outputMetricFile={os.path.join(fe_dir, METRIC)}"],
    })

    prev = fe_name
    for name in config.random_effect_config:
        re_dir = os.path.join(root, name)
        part_dir = os.path.join(re_dir, PARTITION)
        jobs.append({
            "name": f"{name}-partition",
            "type": "gdmix_tpu_partition",
            "depends_on": [f"{prev}-compute-metric"],
            "command": ["python", "-m", "gdmix_tpu.workflow.jobs", "partitioner",
                        f"--trainingScoreDir={os.path.join(root, prev, TRAINING_SCORES)}",
                        f"--validationScoreDir={os.path.join(root, prev, VALIDATION_SCORES)}",
                        f"--partitionedTrainingDataDir={os.path.join(part_dir, 'trainingData')}"],
        })
        jobs.append({
            "name": f"{name}-tf-train",
            "type": "gdmix_tpu_train",
            "depends_on": [f"{name}-partition"],
            "command": ["python", "-m", "gdmix_tpu.gdmix",
                        "--stage=random_effect",
                        f"--partition_list_file={os.path.join(part_dir, 'partitionList.txt')}"],
        })
        jobs.append({
            "name": f"{name}-compute-metric",
            "type": "gdmix_tpu_evaluate",
            "depends_on": [f"{name}-tf-train"],
            "command": ["python", "-m", "gdmix_tpu.workflow.jobs", "evaluator",
                        f"--metricsInputDir={os.path.join(re_dir, VALIDATION_SCORES)}",
                        f"--outputMetricFile={os.path.join(re_dir, METRIC)}"],
        })
        prev = name
    return jobs


def compile_dag(config_path: str, output_file: str) -> List[dict]:
    config = WorkflowConfig.from_file(config_path)
    dag = generate_job_dag(config)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "w") as f:
        json.dump({"name": "gdmix-tpu-workflow", "jobs": dag}, f, indent=2)
    logger.info("Wrote %d-job DAG to %s", len(dag), output_file)
    return dag
