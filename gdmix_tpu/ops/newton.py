"""Batched Newton–Cholesky solver for per-entity logistic regression.

The random-effect problems are tiny (entity feature support ≤ a few dozen), so
exact Newton with a batched Cholesky solve converges in ~5–10 iterations where
L-BFGS needs 50–300 sequential steps — and every step here is dense MXU work
(einsums over [B, n, d] densified entity matrices) instead of long chains of
small VPU ops. Same convex optimum as the reference's scipy L-BFGS
(binary_logistic_regression.py:223), verified in tests; the L-BFGS path
(ops/lbfgs.py) remains for large-support problems.

Objective (reference MEAN form): f(θ) = (Σ wᵢ·bce(zᵢ) + λ/2·θᵀMθ)/n with
z = Xθ + offset, M the bias-exclusion mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_ARMIJO_C1 = 1e-4
_MAX_BACKTRACKS = 20


class NewtonResult(NamedTuple):
    theta: jnp.ndarray       # [B, dim]
    converged: jnp.ndarray   # [B]
    num_iterations: jnp.ndarray  # [B]


def newton_lr_batch(theta0: jnp.ndarray,
                    X: jnp.ndarray,
                    labels: jnp.ndarray,
                    weights: jnp.ndarray,
                    offsets: jnp.ndarray,
                    counts: jnp.ndarray,
                    *,
                    l2_reg_weight: float,
                    l2_mask: jnp.ndarray,
                    maxiter: int = 50,
                    ftol: float = 1e-12,
                    pgtol: float = 1e-5) -> NewtonResult:
    """Minimize the per-entity LR objective for a whole bucket at once.

    theta0  [B, dim]; X [B, n, dim] (dense, intercept column included by the
    caller); labels/weights/offsets [B, n] (padding rows have weight 0);
    counts [B] true sample counts; l2_mask [dim] (0 on unregularized intercept).
    """
    dtype = theta0.dtype
    B, n, dim = X.shape
    lam = jnp.asarray(l2_reg_weight, dtype)
    mask = l2_mask.astype(dtype)
    inv_n = 1.0 / jnp.maximum(counts.astype(dtype), 1.0)       # [B]
    eps = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)

    def f_value(theta):
        z = jnp.einsum("bnd,bd->bn", X, theta) + offsets
        bce = jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
        data = jnp.sum(weights * bce, axis=1)
        reg = 0.5 * lam * jnp.sum(mask * theta * theta, axis=1)
        return (data + reg) * inv_n                             # [B]

    def grad(theta):
        z = jnp.einsum("bnd,bd->bn", X, theta) + offsets
        p = jax.nn.sigmoid(z)
        r = weights * (p - labels)                              # [B, n]
        return (jnp.einsum("bnd,bn->bd", X, r) + lam * mask * theta) \
            * inv_n[:, None], p

    def hess(p):
        d = weights * p * (1 - p)                               # [B, n]
        H = jnp.einsum("bnd,bn,bne->bde", X, d, X) \
            + lam * jnp.diag(mask)[None]
        return H * inv_n[:, None, None]

    # State carries (g, p) forward so each iteration computes exactly one
    # Hessian, one gradient and ~1 line-search value per lane.
    class _S(NamedTuple):
        theta: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        p: jnp.ndarray           # sigmoid(z) at theta (Hessian input)
        done: jnp.ndarray
        iters: jnp.ndarray
        k: jnp.ndarray

    def cond(s: _S):
        return jnp.logical_and(s.k < maxiter, ~jnp.all(s.done))

    use_pallas = jax.devices()[0].platform in ("tpu", "axon")

    def _solve(Hd, g):
        if use_pallas:
            from gdmix_tpu.ops.pallas.linsolve import spd_solve_batched
            return spd_solve_batched(Hd, g)
        chol, low = jax.scipy.linalg.cho_factor(Hd)
        return jax.scipy.linalg.cho_solve((chol, low), g)

    def body(s: _S):
        H = hess(s.p)
        # Levenberg damping keeps padded/degenerate lanes solvable.
        damp = eps * (1.0 + jnp.abs(jnp.diagonal(H, axis1=1, axis2=2)))
        Hd = H + jnp.zeros_like(H).at[
            :, jnp.arange(dim), jnp.arange(dim)].set(damp)
        delta = _solve(Hd, s.g)                                 # [B, dim]
        gdot = jnp.sum(s.g * delta, axis=1)                     # ≥ 0 for PD H

        # Backtracking Armijo: while_loop exits as soon as every live lane
        # accepted (typical case: one evaluation at step 1).
        def bt_cond(carry):
            step, accepted, f_new, i = carry
            return jnp.logical_and(i < _MAX_BACKTRACKS,
                                   ~jnp.all(accepted | s.done))

        def bt_body(carry):
            step, accepted, f_new, i = carry
            trial = s.theta - step[:, None] * delta
            f_trial = f_value(trial)
            ok = f_trial <= s.f - _ARMIJO_C1 * step * gdot
            newly = jnp.logical_and(ok, ~accepted)
            f_new = jnp.where(newly, f_trial, f_new)
            step_keep = jnp.where(accepted | newly, step, step * 0.5)
            return step_keep, accepted | newly, f_new, i + 1

        step0 = jnp.ones((B,), dtype)
        step, accepted, f_new, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (step0, jnp.zeros((B,), bool), s.f, jnp.asarray(0, jnp.int32)))

        move = jnp.logical_and(accepted, ~s.done)
        theta_new = jnp.where(move[:, None],
                              s.theta - step[:, None] * delta, s.theta)
        f_next = jnp.where(move, f_new, s.f)

        g_new, p_new = grad(theta_new)
        gmax = jnp.max(jnp.abs(g_new), axis=1)
        f_drop = s.f - f_next
        rel = jnp.maximum(jnp.maximum(jnp.abs(s.f), jnp.abs(f_next)), 1.0)
        conv = jnp.logical_or(gmax <= pgtol, f_drop <= ftol * rel)
        # a lane that can't backtrack any decrease is finished too
        done = s.done | conv | ~accepted
        iters = jnp.where(s.done, s.iters, s.iters + 1)
        return _S(theta=theta_new, f=f_next, g=g_new, p=p_new, done=done,
                  iters=iters, k=s.k + 1)

    f0 = f_value(theta0)
    g0, p0 = grad(theta0)
    init = _S(theta=theta0, f=f0, g=g0, p=p0,
              done=jnp.max(jnp.abs(g0), axis=1) <= pgtol,
              iters=jnp.zeros((B,), jnp.int32), k=jnp.asarray(0, jnp.int32))
    s = jax.lax.while_loop(cond, body, init)
    return NewtonResult(theta=s.theta, converged=s.done, num_iterations=s.iters)


def densify_bucket(indices: jnp.ndarray, values: jnp.ndarray, u_cap: int,
                   has_intercept: bool) -> jnp.ndarray:
    """Padded-COO bucket [B, n, K] → dense [B, n, dim] with the intercept column
    FIRST (random-effect layout)."""
    B, n, K = indices.shape
    X = jnp.zeros((B, n, u_cap), values.dtype)
    b_ix = jnp.broadcast_to(jnp.arange(B)[:, None, None], indices.shape)
    n_ix = jnp.broadcast_to(jnp.arange(n)[None, :, None], indices.shape)
    X = X.at[b_ix.reshape(-1), n_ix.reshape(-1),
             indices.reshape(-1)].add(values.reshape(-1))
    if has_intercept:
        ones = jnp.ones((B, n, 1), values.dtype)
        X = jnp.concatenate([ones, X], axis=-1)
    return X
