"""Fused lanes-last Newton kernel (ops/pallas/newton_lanes.py): parity with
the batch-major solver (ops/newton.py) and the scipy oracle, interpret mode
on CPU. This is the TPU production path for buckets with dim ≤ MAX_DIM —
the same per-entity optimum as the reference's scipy L-BFGS
(binary_logistic_regression.py:223)."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.optimize import fmin_l_bfgs_b

from gdmix_tpu.ops.newton import newton_lr_batch, densify_bucket
from gdmix_tpu.ops.pallas.newton_lanes import newton_lr_batch_lanes


def _problem(B, n, dim, seed=0, unreg_bias=True, ragged=True):
    rng = np.random.RandomState(seed)
    X = rng.randn(B, n, dim - 1).astype(np.float32) * 0.8
    X = np.concatenate([np.ones((B, n, 1), np.float32), X], axis=-1)
    counts = rng.randint(2, n + 1, B) if ragged else np.full(B, n)
    w = (np.arange(n)[None, :] < counts[:, None]).astype(np.float32)
    w *= rng.uniform(0.5, 2.0, (B, n)).astype(np.float32)
    true = rng.randn(B, dim).astype(np.float32)
    off = rng.randn(B, n).astype(np.float32) * 0.3
    z = np.einsum("bnd,bd->bn", X, true) + off
    y = (rng.uniform(size=(B, n)) < 1 / (1 + np.exp(-z))).astype(np.float32)
    # both classes in every lane's REAL rows: an all-one-class lane with an
    # unregularized intercept has an unbounded optimum (no oracle to match)
    y[:, 0] = 1.0
    y[:, 1] = 0.0
    return X, y, w, off, counts.astype(np.float32)


def _scipy_solve(X, y, w, off, count, lam, unreg_bias):
    n_real = X.shape[0]
    mask = np.ones(X.shape[1])
    if unreg_bias:
        mask[0] = 0.0

    def fg(theta):
        z = X @ theta + off
        p = 1 / (1 + np.exp(-z))
        bce = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
        f = (np.sum(w * bce) + 0.5 * lam * np.sum(mask * theta ** 2)) / count
        g = (X.T @ (w * (p - y)) + lam * mask * theta) / count
        return f, g

    theta, _, _ = fmin_l_bfgs_b(fg, np.zeros(X.shape[1]), m=10,
                                factr=10.0, pgtol=1e-9, maxiter=500)
    return theta


@pytest.mark.parametrize("B,n,dim,unreg", [(12, 8, 5, True),
                                           (130, 16, 25, True),
                                           (64, 8, 25, False),
                                           # n·d > 1024 → per-iteration path
                                           # at a mid dim (33..64 band)
                                           (48, 32, 40, True)])
def test_lanes_matches_batch_major(B, n, dim, unreg):
    X, y, w, off, counts = _problem(B, n, dim, seed=B, unreg_bias=unreg)
    mask = jnp.ones(dim).at[0].set(0.0) if unreg else jnp.ones(dim)
    kw = dict(l2_reg_weight=0.7, maxiter=100, ftol=1e-14, pgtol=1e-7)
    ref = newton_lr_batch(jnp.asarray(np.zeros((B, dim), np.float32)),
                          jnp.asarray(X), jnp.asarray(y), jnp.asarray(w),
                          jnp.asarray(off), jnp.asarray(counts),
                          l2_mask=mask, **kw)
    got = newton_lr_batch_lanes(
        jnp.asarray(np.zeros((B, dim), np.float32)), jnp.asarray(X),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off),
        jnp.asarray(counts), unreg_bias=unreg, interpret=True, **kw)
    assert got.theta.shape == (B, dim)
    assert bool(jnp.all(got.converged))
    np.testing.assert_allclose(np.asarray(got.theta, np.float64),
                               np.asarray(ref.theta, np.float64),
                               rtol=5e-4, atol=5e-4)


def test_lanes_matches_scipy_oracle():
    B, n, dim, lam = 24, 8, 7, 1.3
    X, y, w, off, counts = _problem(B, n, dim, seed=3)
    got = newton_lr_batch_lanes(
        jnp.zeros((B, dim), jnp.float32), jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(off), jnp.asarray(counts),
        l2_reg_weight=lam, unreg_bias=True, maxiter=100, ftol=1e-14,
        pgtol=1e-7, interpret=True)
    for b in range(B):
        want = _scipy_solve(np.asarray(X[b], np.float64),
                            np.asarray(y[b], np.float64),
                            np.asarray(w[b], np.float64),
                            np.asarray(off[b], np.float64),
                            float(counts[b]), lam, True)
        np.testing.assert_allclose(np.asarray(got.theta[b], np.float64),
                                   want, rtol=2e-3, atol=2e-3)


def test_lanes_multiblock_n_accumulation():
    """n spanning several kernel n-blocks accumulates identically to one."""
    B, dim = 16, 9
    # n=512 with d padded to 16 → NB < n, exercising the grid-1 accumulation
    X, y, w, off, counts = _problem(B, 512, dim, seed=5)
    got = newton_lr_batch_lanes(
        jnp.zeros((B, dim), jnp.float32), jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(off), jnp.asarray(counts),
        l2_reg_weight=1.0, unreg_bias=True, maxiter=60, ftol=1e-14,
        pgtol=1e-6, interpret=True)
    mask = jnp.ones(dim).at[0].set(0.0)
    ref = newton_lr_batch(jnp.zeros((B, dim), jnp.float32), jnp.asarray(X),
                          jnp.asarray(y), jnp.asarray(w), jnp.asarray(off),
                          jnp.asarray(counts), l2_reg_weight=1.0,
                          l2_mask=mask, maxiter=60, ftol=1e-14, pgtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.theta, np.float64),
                               np.asarray(ref.theta, np.float64),
                               rtol=1e-3, atol=1e-3)


def test_lanes_padding_lanes_inert():
    """B not a multiple of 128: padded lanes converge at init and are
    sliced away; real lanes match the unpadded reference."""
    B, n, dim = 130, 8, 5
    X, y, w, off, counts = _problem(B, n, dim, seed=9)
    got = newton_lr_batch_lanes(
        jnp.zeros((B, dim), jnp.float32), jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(off), jnp.asarray(counts),
        l2_reg_weight=0.5, unreg_bias=True, maxiter=100, ftol=1e-14,
        pgtol=1e-7, interpret=True)
    assert got.theta.shape == (B, dim)
    sub = newton_lr_batch_lanes(
        jnp.zeros((7, dim), jnp.float32), jnp.asarray(X[:7]),
        jnp.asarray(y[:7]), jnp.asarray(w[:7]), jnp.asarray(off[:7]),
        jnp.asarray(counts[:7]), l2_reg_weight=0.5, unreg_bias=True,
        maxiter=100, ftol=1e-14, pgtol=1e-7, interpret=True)
    np.testing.assert_allclose(np.asarray(got.theta[:7]),
                               np.asarray(sub.theta), rtol=2e-4, atol=2e-4)


def test_lanes_via_sparse_bucket_layout():
    """densify_bucket → lanes solver on the production COO bucket layout."""
    rng = np.random.RandomState(11)
    B, n, K, u_cap = 20, 8, 3, 6
    indices = rng.randint(0, u_cap, (B, n, K)).astype(np.int32)
    values = rng.randn(B, n, K).astype(np.float32)
    X = np.asarray(densify_bucket(jnp.asarray(indices), jnp.asarray(values),
                                  u_cap, True))
    y = (rng.uniform(size=(B, n)) < 0.5).astype(np.float32)
    w = np.ones((B, n), np.float32)
    off = np.zeros((B, n), np.float32)
    counts = np.full(B, n, np.float32)
    dim = u_cap + 1
    got = newton_lr_batch_lanes(
        jnp.zeros((B, dim), jnp.float32), jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(off), jnp.asarray(counts),
        l2_reg_weight=1.0, unreg_bias=True, maxiter=100, ftol=1e-14,
        pgtol=1e-7, interpret=True)
    mask = jnp.ones(dim).at[0].set(0.0)
    ref = newton_lr_batch(jnp.zeros((B, dim), jnp.float32), jnp.asarray(X),
                          jnp.asarray(y), jnp.asarray(w), jnp.asarray(off),
                          jnp.asarray(counts), l2_reg_weight=1.0,
                          l2_mask=mask, maxiter=100, ftol=1e-14, pgtol=1e-7)
    np.testing.assert_allclose(np.asarray(got.theta), np.asarray(ref.theta),
                               rtol=5e-4, atol=5e-4)
