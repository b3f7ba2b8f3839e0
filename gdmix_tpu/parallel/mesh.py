"""Device mesh + sharding helpers.

The TPU replacement for the reference's TF_CONFIG cluster plumbing
(/root/reference/gdmix-trainer/src/gdmix/drivers/fixed_effect_driver.py:24-58):
one 1-D "data" mesh over all devices. Fixed-effect batches shard along it
(XLA inserts the ICI all-reduces that replace the gRPC ring collective);
random-effect coefficient tables row-shard along the same axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def local_mesh() -> Mesh:
    """Process-LOCAL 1-D mesh (this host's devices only). Under multi-host
    the random-effect plane composes two levels — ICI routing within each
    process's local mesh × round-robin entity ownership + model-file exchange
    across processes (≡ the reference's partitions-across-workers × pool-
    within-worker, random_effect_lr_lbfgs_model.py:82-217) — so its
    collectives must stay inside the process."""
    return Mesh(np.array(jax.local_devices()), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, rank: int = 1, batch_dim: int = 0) -> NamedSharding:
    """Shard `batch_dim` of a rank-`rank` array along the data axis."""
    spec = [None] * rank
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
