"""Batched Newton solver tests: must reach the same optimum as scipy and as the
L-BFGS path (the two RE solver backends are interchangeable)."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import fmin_l_bfgs_b
from scipy.special import expit

from gdmix_tpu.ops.newton import densify_bucket, newton_lr_batch


def _problems(B=12, n=30, d=6, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(B, n, d) * (rng.rand(B, n, d) < 0.6)
    w_true = rng.randn(B, d)
    z = np.einsum("bnd,bd->bn", X, w_true)
    y = (rng.rand(B, n) < expit(z)).astype(np.float64)
    # ensure both classes per lane (avoid unregularized-intercept ridges)
    y[:, 0], y[:, -1] = 0.0, 1.0
    offsets = 0.2 * rng.randn(B, n)
    weights = rng.rand(B, n) + 0.5
    return X, y, offsets, weights


def _scipy_opt(X1, y, offsets, weights, lam, reg_bias):
    n = len(y)

    def loss(t):
        z = X1 @ t + offsets
        ce = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
        reg = t @ t if reg_bias else t[1:] @ t[1:]
        return (np.sum(weights * ce) + 0.5 * lam * reg) / n

    def grad(t):
        z = X1 @ t + offsets
        g = X1.T @ (weights * (expit(z) - y)) + lam * t
        if not reg_bias:
            g[0] -= lam * t[0]
        return g / n

    x, _, _ = fmin_l_bfgs_b(loss, np.zeros(X1.shape[1]), fprime=grad,
                            factr=10.0, pgtol=1e-12, maxiter=500)
    return x


@pytest.mark.parametrize("lam,reg_bias", [(0.5, False), (0.0, False), (1.0, True)])
def test_newton_matches_scipy(lam, reg_bias):
    B, n, d = 12, 30, 6
    X, y, offsets, weights = _problems(B, n, d)
    ones = np.ones((B, n, 1))
    X1 = np.concatenate([ones, X], axis=2)
    l2_mask = np.ones(d + 1)
    if not reg_bias:
        l2_mask[0] = 0.0
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.asarray(y),
        jnp.asarray(weights), jnp.asarray(offsets),
        jnp.full((B,), n, jnp.float64),
        l2_reg_weight=lam, l2_mask=jnp.asarray(l2_mask),
        maxiter=50, ftol=1e-14, pgtol=1e-10)
    assert bool(jnp.all(res.converged))
    for b in range(B):
        oracle = _scipy_opt(X1[b], y[b], offsets[b], weights[b], lam, reg_bias)
        np.testing.assert_allclose(np.asarray(res.theta[b]), oracle, atol=3e-5,
                                   err_msg=f"lane {b}")


def test_newton_fast_iteration_count():
    B, n, d = 8, 40, 5
    X, y, offsets, weights = _problems(B, n, d, seed=2)
    ones = np.ones((B, n, 1))
    X1 = np.concatenate([ones, X], axis=2)
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.asarray(y),
        jnp.asarray(weights), jnp.asarray(offsets),
        jnp.full((B,), n, jnp.float64),
        l2_reg_weight=1.0, l2_mask=jnp.ones(d + 1).at[0].set(0.0),
        maxiter=50, ftol=1e-14, pgtol=1e-8)
    assert bool(jnp.all(res.converged))
    assert int(jnp.max(res.num_iterations)) <= 15  # quadratic convergence


def test_densify_bucket():
    indices = jnp.asarray([[[0, 2, 0, 0]], [[1, 1, 0, 0]]], jnp.int32)  # [2,1,4]
    values = jnp.asarray([[[1.0, 2.0, 0.0, 0.0]], [[3.0, 4.0, 0.0, 0.0]]])
    X = densify_bucket(indices, values, 4, has_intercept=True)
    assert X.shape == (2, 1, 5)
    np.testing.assert_allclose(np.asarray(X[0, 0]), [1.0, 1.0, 0.0, 2.0, 0.0])
    # duplicate indices accumulate (COO semantics)
    np.testing.assert_allclose(np.asarray(X[1, 0]), [1.0, 0.0, 7.0, 0.0, 0.0])


def test_padded_lanes_converge_instantly():
    """All-zero (padding) entities must not burn iterations."""
    B, n, d = 4, 8, 3
    X1 = np.zeros((B, n, d + 1))
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.zeros((B, n)),
        jnp.zeros((B, n)), jnp.zeros((B, n)), jnp.zeros((B,)),
        l2_reg_weight=1.0, l2_mask=jnp.ones(d + 1),
        maxiter=50)
    assert bool(jnp.all(res.converged))
    assert int(jnp.max(res.num_iterations)) == 0


# ------------------------------------------------------ dual (sample-space) --

def _wide_problems(B=10, n=8, d=20, seed=3):
    """samples-per-entity < dim: the regime the dual solver targets."""
    return _problems(B, n, d, seed)


@pytest.mark.parametrize("lam,reg_bias", [(0.5, False), (0.0, False),
                                          (1.0, True)])
def test_dual_newton_matches_scipy(lam, reg_bias):
    B, n, d = 10, 8, 20
    X, y, offsets, weights = _wide_problems(B, n, d)
    ones = np.ones((B, n, 1))
    X1 = np.concatenate([ones, X], axis=2)
    l2_mask = np.ones(d + 1)
    if not reg_bias:
        l2_mask[0] = 0.0
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.asarray(y),
        jnp.asarray(weights), jnp.asarray(offsets),
        jnp.full((B,), n, jnp.float64),
        l2_reg_weight=lam, l2_mask=jnp.asarray(l2_mask),
        maxiter=60, ftol=1e-14, pgtol=1e-10, dual=True)
    assert bool(jnp.all(res.converged))

    def _loss(t, b):
        z = X1[b] @ t + offsets[b]
        ce = np.maximum(z, 0) - z * y[b] + np.log1p(np.exp(-np.abs(z)))
        reg = t @ t if reg_bias else t[1:] @ t[1:]
        return (np.sum(weights[b] * ce) + 0.5 * lam * reg) / n

    for b in range(B):
        oracle = _scipy_opt(X1[b], y[b], offsets[b], weights[b], lam, reg_bias)
        if lam == 0.0:
            # n < dim and no ridge: the minimizer is non-unique (the loss only
            # sees Xθ, rank ≤ n < dim) — compare objective values instead
            got = _loss(np.asarray(res.theta[b]), b)
            np.testing.assert_allclose(got, _loss(oracle, b), atol=1e-7,
                                       err_msg=f"lane {b}")
        else:
            np.testing.assert_allclose(np.asarray(res.theta[b]), oracle,
                                       atol=3e-5, err_msg=f"lane {b}")


def test_dual_newton_fast_iteration_count():
    B, n, d = 8, 10, 24
    X, y, offsets, weights = _problems(B, n, d, seed=5)
    ones = np.ones((B, n, 1))
    X1 = np.concatenate([ones, X], axis=2)
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.asarray(y),
        jnp.asarray(weights), jnp.asarray(offsets),
        jnp.full((B,), n, jnp.float64),
        l2_reg_weight=1.0, l2_mask=jnp.ones(d + 1).at[0].set(0.0),
        maxiter=50, ftol=1e-14, pgtol=1e-8, dual=True)
    assert bool(jnp.all(res.converged))
    assert int(jnp.max(res.num_iterations)) <= 15


def test_dual_padded_lanes_converge_instantly():
    B, n, d = 4, 3, 6
    X1 = np.zeros((B, n, d + 1))
    res = newton_lr_batch(
        jnp.zeros((B, d + 1)), jnp.asarray(X1), jnp.zeros((B, n)),
        jnp.zeros((B, n)), jnp.zeros((B, n)), jnp.zeros((B,)),
        l2_reg_weight=1.0, l2_mask=jnp.ones(d + 1),
        maxiter=50, dual=True)
    assert bool(jnp.all(res.converged))
    assert int(jnp.max(res.num_iterations)) == 0


@pytest.mark.parametrize("full", [False, True])
@pytest.mark.parametrize("reg_bias", [False, True])
def test_dual_variance_matches_explicit_hessian(full, reg_bias):
    """diag(H⁻¹) / 1/diag(H) from the sample-space formulas == the explicit
    un-normalized Hessian (reference binary_logistic_regression.py:144-189)."""
    from gdmix_tpu.ops.newton import dual_variance
    B, n, d, lam, eps = 6, 7, 15, 0.7, 1e-9
    X, y, offsets, weights = _problems(B, n, d, seed=7)
    ones = np.ones((B, n, 1))
    X1 = np.concatenate([ones, X], axis=2)
    rng = np.random.RandomState(11)
    theta = 0.3 * rng.randn(B, d + 1)
    l2_mask = np.ones(d + 1)
    if not reg_bias:
        l2_mask[0] = 0.0
    got = np.asarray(dual_variance(
        jnp.asarray(theta), jnp.asarray(X1), jnp.asarray(y),
        jnp.asarray(weights), jnp.asarray(offsets),
        l2_reg_weight=lam, l2_mask=jnp.asarray(l2_mask), full=full,
        epsilon=eps))
    for b in range(B):
        z = X1[b] @ theta[b] + offsets[b]
        p = expit(z)
        dvec = weights[b] * p * (1 - p)
        H = X1[b].T @ (dvec[:, None] * X1[b]) + lam * np.diag(l2_mask)
        if full:
            expect = np.diag(np.linalg.inv(H + eps * np.eye(d + 1)))
        else:
            expect = 1.0 / (np.diag(H) + eps)
        np.testing.assert_allclose(got[b], expect, rtol=1e-6,
                                   err_msg=f"lane {b} full={full}")
