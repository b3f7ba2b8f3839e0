"""Pallas batched SPD solver: correctness vs numpy (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from gdmix_tpu.ops.pallas.linsolve import spd_solve_batched


@pytest.mark.parametrize("B,d", [(4, 8), (130, 13), (256, 29)])
def test_matches_numpy(B, d):
    rng = np.random.RandomState(0)
    Q = rng.randn(B, d, d)
    H = np.einsum("bij,bkj->bik", Q, Q) / d + np.eye(d)[None]
    g = rng.randn(B, d)
    x = spd_solve_batched(jnp.asarray(H), jnp.asarray(g), interpret=True)
    want = np.linalg.solve(H, g[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-8, atol=1e-8)


def test_degenerate_identity_rows():
    """Identity systems (the padding pattern) solve to g exactly."""
    B, d = 8, 5
    H = np.broadcast_to(np.eye(d), (B, d, d)).copy()
    g = np.arange(B * d, dtype=np.float64).reshape(B, d)
    x = spd_solve_batched(jnp.asarray(H), jnp.asarray(g), interpret=True)
    np.testing.assert_allclose(np.asarray(x), g, atol=1e-12)


@pytest.mark.parametrize("B,d,r", [(4, 8, 2), (130, 13, 3), (200, 29, 2)])
def test_mrhs_matches_numpy(B, d, r):
    from gdmix_tpu.ops.pallas.linsolve import spd_solve_batched_mrhs
    rng = np.random.RandomState(1)
    Q = rng.randn(B, d, d)
    H = np.einsum("bij,bkj->bik", Q, Q) / d + np.eye(d)[None]
    g = rng.randn(B, d, r)
    x = spd_solve_batched_mrhs(jnp.asarray(H), jnp.asarray(g), interpret=True)
    want = np.linalg.solve(H, g)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-8, atol=1e-8)
