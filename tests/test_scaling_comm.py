"""Communication-volume scaling properties of the compiled SPMD programs.

Real multi-host wall-clock efficiency (BASELINE.md: ≥0.8 at N≥2) needs real
chips, but the property that produces it is checkable on any backend: the
fixed-effect step's collective traffic must be the coefficient vector —
independent of device count and of the per-device batch — so weak scaling is
compute-bound (reference's ring all-reduce of (loss, grad),
fixed_effect_lr_lbfgs_model.py:384-390). These tests lower the production
objective over meshes of different sizes and assert the all-reduce bytes
stay constant.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdmix_tpu.ops.logistic import SparseBatch, fixed_effect_value_and_grad

D, K = 64, 4

_SHAPE_RE = re.compile(r"(f32|f64|u32|s32)\[([\d,]*)\]")
_BYTES = {"f32": 4, "u32": 4, "s32": 4, "f64": 8}


def _allreduce_bytes(hlo: str):
    """Total bytes moved by all-reduce ops in an HLO text, and their count."""
    total = 0
    count = 0
    for line in hlo.splitlines():
        s = line.strip()
        # match the op itself, not the companion ops (all-reduce-start etc.
        # count once; ignore pure control/token shapes)
        if "= " not in s or "all-reduce" not in s.split("= ")[1][:60]:
            continue
        count += 1
        lhs = s.split("= ")[0]
        for dt, dims in _SHAPE_RE.findall(lhs):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _BYTES[dt]
    return total, count


def _lower(ndev: int, rows_per_device: int):
    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("data",))
    n = rows_per_device * ndev
    rng = np.random.RandomState(0)
    batch = SparseBatch(
        indices=jnp.asarray(rng.randint(0, D, (n, K)), jnp.int32),
        values=jnp.asarray(rng.randn(n, K), jnp.float32),
        offsets=jnp.zeros((n,), jnp.float32),
        labels=jnp.asarray(rng.randint(0, 2, n), jnp.float32),
        weights=jnp.ones((n,), jnp.float32))
    x = jnp.zeros((D + 1,), jnp.float32)
    row = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    batch = jax.device_put(batch, SparseBatch(row, row, row, row, row))
    x = jax.device_put(x, rep)

    def step(x, b):
        return fixed_effect_value_and_grad(
            x, b, D, has_intercept=True, regularize_bias=False,
            l2_reg_weight=1.0)

    return jax.jit(step).lower(x, batch).compile().as_text()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fe_allreduce_volume_independent_of_device_count():
    vols = {}
    for ndev in (2, 4, 8):
        hlo = _lower(ndev, rows_per_device=128)
        vols[ndev] = _allreduce_bytes(hlo)
        bytes_, count = vols[ndev]
        assert count >= 1, "expected an all-reduce in the sharded FE step"
        # collective traffic ~= grad[D+1] + loss scalar(s); certainly not the
        # batch (which would be rows_per_device * ndev * ... bytes)
        assert bytes_ <= 4 * (D + 1) * 8, (ndev, bytes_)
    assert vols[2][0] == vols[4][0] == vols[8][0], vols


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fe_allreduce_volume_independent_of_batch():
    small = _allreduce_bytes(_lower(8, rows_per_device=64))
    large = _allreduce_bytes(_lower(8, rows_per_device=512))
    assert small[0] == large[0], (small, large)
