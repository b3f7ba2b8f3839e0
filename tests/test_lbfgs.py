"""L-BFGS oracle tests vs scipy.optimize.fmin_l_bfgs_b — the same solver the
reference uses (binary_logistic_regression.py:223, fixed_effect_lr_lbfgs_model.py:635)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import fmin_l_bfgs_b

from gdmix_tpu.ops.lbfgs import lbfgs, lbfgs_batched


def _quad_problem(d, seed=0, cond=100.0):
    rng = np.random.RandomState(seed)
    Q = rng.randn(d, d)
    A = Q.T @ Q + np.eye(d)
    A *= cond / np.linalg.cond(A) if np.linalg.cond(A) > cond else 1.0
    b = rng.randn(d)
    return A, b


def test_quadratic_exact():
    A, b = _quad_problem(8)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def fun(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    res = jax.jit(lambda x0: lbfgs(fun, x0, maxiter=200, pgtol=1e-10,
                                   ftol=1e-15))(jnp.zeros(8))
    x_star = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-6)
    assert bool(res.converged)


def _logreg_data(n=200, d=10, seed=1):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    w_true = rng.randn(d)
    y = (rng.rand(n) < 1 / (1 + np.exp(-(X @ w_true)))).astype(np.float64)
    offsets = 0.3 * rng.randn(n)
    weights = rng.rand(n) + 0.5
    return X, y, offsets, weights


def _np_obj(lam):
    def f(theta, X, y, weights, offsets):
        z = X @ theta + offsets
        loss = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
        return (np.sum(weights * loss) + 0.5 * lam * theta @ theta) / len(y)

    def g(theta, X, y, weights, offsets):
        z = X @ theta + offsets
        p = 1 / (1 + np.exp(-z))
        return (X.T @ (weights * (p - y)) + lam * theta) / len(y)

    return f, g


@pytest.mark.parametrize("lam", [0.0, 1.0])
def test_logistic_matches_scipy(lam):
    X, y, offsets, weights = _logreg_data()
    f_np, g_np = _np_obj(lam)
    x_scipy, f_scipy, info = fmin_l_bfgs_b(
        f_np, np.zeros(10), fprime=g_np, args=(X, y, weights, offsets),
        m=10, factr=10.0, maxiter=200)

    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    oj, wj = jnp.asarray(offsets), jnp.asarray(weights)
    lam_j = jnp.asarray(lam)

    def fun(theta):
        z = Xj @ theta + oj
        loss = jnp.maximum(z, 0) - z * yj + jnp.log1p(jnp.exp(-jnp.abs(z)))
        val = (jnp.sum(wj * loss) + 0.5 * lam_j * theta @ theta) / len(y)
        p = jax.nn.sigmoid(z)
        grad = (Xj.T @ (wj * (p - yj)) + lam_j * theta) / len(y)
        return val, grad

    res = jax.jit(lambda x0: lbfgs(fun, x0, ftol=10 * np.finfo(np.float64).eps,
                                   pgtol=1e-10, maxiter=400))(jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(res.x), x_scipy, atol=1e-4)
    np.testing.assert_allclose(float(res.f), f_scipy, rtol=1e-8)


def test_warm_start_converged_is_noop():
    """Reference behavior: re-training 1 iter from the optimum changes nothing
    (test_random_effect_lr_lbfgs_model warm-start semantics)."""
    X, y, offsets, weights = _logreg_data(100, 5, seed=3)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    oj, wj = jnp.asarray(offsets), jnp.asarray(weights)

    def fun(theta):
        z = Xj @ theta + oj
        loss = jnp.maximum(z, 0) - z * yj + jnp.log1p(jnp.exp(-jnp.abs(z)))
        val = (jnp.sum(wj * loss) + 0.5 * theta @ theta) / len(y)
        grad = (Xj.T @ (wj * (jax.nn.sigmoid(z) - yj)) + theta) / len(y)
        return val, grad

    first = lbfgs(fun, jnp.zeros(5), ftol=1e-14, pgtol=1e-10, maxiter=200)
    again = lbfgs(fun, first.x, ftol=1e-14, pgtol=1e-10, maxiter=1)
    np.testing.assert_allclose(np.asarray(again.x), np.asarray(first.x), atol=1e-9)


def test_batched_independent_problems():
    """vmapped solves must equal one-at-a-time solves lane-for-lane."""
    B, d = 16, 6
    rng = np.random.RandomState(7)
    As = []
    bs = []
    for i in range(B):
        Q = rng.randn(d, d)
        As.append(Q.T @ Q + (1 + i) * np.eye(d))
        bs.append(rng.randn(d))
    A_b, b_b = jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs))

    def one(x, extra):
        A, b = extra
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    res = jax.jit(lambda X0: lbfgs_batched(one, X0, maxiter=200, pgtol=1e-10,
                                           ftol=1e-15,
                                           extra_args=(A_b, b_b)))(jnp.zeros((B, d)))
    for i in range(B):
        x_star = np.linalg.solve(As[i], bs[i])
        np.testing.assert_allclose(np.asarray(res.x[i]), x_star, atol=1e-6,
                                   err_msg=f"lane {i}")
    assert bool(jnp.all(res.converged))


def test_batched_heterogeneous_iteration_counts():
    """Lanes converging at very different speeds must all still be exact."""
    B, d = 8, 4
    conds = np.logspace(0, 4, B)  # easy → nasty conditioning
    As = [np.diag(np.linspace(1, c, d)) for c in conds]
    bs = [np.ones(d) for _ in range(B)]
    A_b, b_b = jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs))

    def one(x, extra):
        A, b = extra
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    res = lbfgs_batched(one, jnp.zeros((B, d)), maxiter=500, pgtol=1e-10,
                        ftol=1e-15, extra_args=(A_b, b_b))
    for i in range(B):
        np.testing.assert_allclose(np.asarray(res.x[i]), np.linalg.solve(As[i], bs[i]),
                                   atol=1e-6)


def test_zero_gradient_start():
    def fun(x):
        return jnp.sum(x ** 2), 2 * x
    res = lbfgs(fun, jnp.zeros(3))
    assert bool(res.converged)
    assert int(res.num_iterations) == 0


def test_rosenbrock():
    """Non-convex sanity check (line-search robustness)."""
    def fun(xy):
        val = (1 - xy[0]) ** 2 + 100 * (xy[1] - xy[0] ** 2) ** 2
        return val, jax.grad(lambda p: (1 - p[0]) ** 2
                             + 100 * (p[1] - p[0] ** 2) ** 2)(xy)
    res = lbfgs(fun, jnp.asarray([-1.2, 1.0]), maxiter=300, ftol=1e-16, pgtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)
