"""CLI entry point: ``python -m gdmix_tpu.gdmix --<flags>``.

Mirrors the reference entry (/root/reference/gdmix-trainer/src/gdmix/gdmix.py:13-40):
one argv serves both the driver Params and the model params; unknown flags are
ignored by each parser.
"""
from __future__ import annotations

import logging
import sys

from gdmix_tpu import constants
from gdmix_tpu.drivers.factory import get_driver
from gdmix_tpu.params import Params, from_argv

logging.basicConfig(
    format="%(asctime)s:%(levelname)s:%(module)s:%(message)s",
    datefmt="%Y/%m/%d %I:%M:%S", level=logging.INFO)


def _print_help() -> None:
    import dataclasses

    from gdmix_tpu.params import FixedLRParams, REParams, SchemaParams
    print("usage: python -m gdmix_tpu.gdmix --action=train|inference "
          "--stage=fixed_effect|random_effect "
          "--model_type=logistic_regression|detext --<flags>\n\n"
          "One argv serves driver, schema, and model params; flags each parser"
          " doesn't know are ignored (reference gdmix.py:13-40 behavior).\n")
    for title, cls in (("driver params", Params),
                       ("schema params", SchemaParams),
                       ("fixed-effect LR params", FixedLRParams),
                       ("random-effect LR params", REParams)):
        print(f"{title}:")
        for f in dataclasses.fields(cls):
            default = "" if f.default is dataclasses.MISSING \
                else f" (default: {f.default})"
            print(f"  --{f.name}{default}")
        print()


def run(argv) -> None:
    if not argv or "--help" in argv or "-h" in argv:
        _print_help()
        return
    # consume the multi-host env contract (COORDINATOR_ADDRESS/NUM_PROCESSES/
    # PROCESS_ID) if present — the trainer itself is distribution-aware, like
    # the reference consuming TF_CONFIG inside the trainer
    # (fixed_effect_driver.py:26-58); no-op when the env is absent
    from gdmix_tpu.workflow.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    params = from_argv(Params, argv)
    driver = get_driver(params, argv)
    if params.action == constants.ACTION_INFERENCE:
        driver.run_inference(params)
    elif params.action == constants.ACTION_TRAIN:
        driver.run_training(params)
    else:
        raise ValueError(f"Unsupported action {params.action}")


if __name__ == "__main__":
    run(sys.argv[1:])
