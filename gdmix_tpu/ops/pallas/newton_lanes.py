"""Fully-fused lanes-last Newton iteration for batched tiny logistic models.

The batched Newton solver (ops/newton.py, the reference per-entity solve of
binary_logistic_regression.py:223 done 65k entities at a time) is bound by
XLA's handling of TINY per-entity matmuls: at B=65k, n=8, dim=25 the
[B, n, d] einsums and the [B, d, d] Hessian/solve round-trip HBM several
times per iteration and keep <4% of the MXU busy (each lane is a 25×8@8×25
product on a 128×128 systolic array).

This module instead lays the BATCH along the 128-wide VPU lane dimension.
Two forms, picked by whether X fits a VMEM block:

1. FULL-FUSED (`_newton_full_kernel`, n·d ≤ 1024 — every headline tier):
   the ENTIRE solve is one kernel per 128-lane block. X loads into VMEM
   once and stays there across all iterations; f/grad/Hessian, the damped
   Gauss–Jordan, the Armijo backtracking and per-lane convergence freezing
   all run in VMEM, and the block's while_loop exits as soon as its own
   128 lanes converge — straggler compaction for free at block granularity.
   HBM traffic for a whole solve = one X read + [d, B] outputs.

2. PER-ITERATION (`_fgd_kernel`, larger n): one kernel per Newton step
   computes f/g/δ with X streamed over n-blocks into a VMEM scratch
   (H still never touches HBM); the outer while_loop and the Armijo line
   search stay in XLA on lanes-last [d, B] state — keeping Pallas out of
   the nested backtracking while_loop cuts whole-program compile ~5×.

Either way the 25×25 per-entity "matmuls" become full-width lane-parallel
multiply-reduces — the batch-major form kept <4% of the MXU busy and
round-tripped HBM per op.

Used automatically by ops/newton.py on TPU for dim ≤ MAX_DIM, f32; oracle
parity with the batch-major path (and scipy) is tested in interpret mode
(tests/test_newton_lanes.py). Mosaic constraints encoded here: i1 masks
cannot broadcast across sublanes (booleans are 0/1 floats, selects are
arithmetic blends); while_loop carries need uniform [d, TB] layouts;
the scoped-VMEM stack is 16 MB (the n·d gate).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128        # batch elements per block: full VPU lane width
MAX_DIM = 64       # beyond this the [d, d, LANES] scratch crowds VMEM
_ARMIJO_C1 = 1e-4
_MAX_BACKTRACKS = 20
_DAMP_EPS = 1e-6   # Levenberg floor (f32 path; matches ops/newton.py)


def _pick_nb(n: int, d: int) -> int:
    """n-block size: keep the [NB, d, LANES] X block ≤ ~2 MB of VMEM."""
    budget = (2 * 1024 * 1024) // (d * LANES * 4)
    nb = 1
    while nb * 2 <= min(n, max(budget, 1)):
        nb *= 2
    return nb


def _lam_vec_of(d: int, lam: float, unreg_bias: bool, dtype):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    mask = (row_ids > 0) if unreg_bias else (row_ids >= 0)      # [d, 1]
    return jnp.where(mask, lam, 0.0).astype(dtype)


def _data_terms(X, y, w, off, th, true_dim=None):
    """f/g/H data terms for a VMEM-resident block: X [NB, d, TB], th [d, TB].
    H rows are one lane-parallel multiply-reduce per coordinate (d unrolled).
    Rows ≥ true_dim (the sublane padding of the real coefficient count) are
    zeros by construction — X's padded columns are zero — so they are
    emitted as literal zeros instead of computed."""
    d = X.shape[1]
    td = d if true_dim is None else true_dim
    z = jnp.sum(X * th[None, :, :], axis=1) + off               # [NB, TB]
    p = jax.nn.sigmoid(z)
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    r = w * (p - y)                                             # [NB, TB]
    dv = w * p * (1.0 - p)                                      # [NB, TB]
    f_part = jnp.sum(w * bce, axis=0, keepdims=True)            # [1, TB]
    g_part = jnp.sum(X * r[:, None, :], axis=0)                 # [d, TB]
    Xw = X * dv[:, None, :]                                     # [NB, d, TB]
    zrow = jnp.zeros(Xw.shape[1:], X.dtype)                     # [d, TB]
    h_part = jnp.stack(
        [jnp.sum(X[:, k, :][:, None, :] * Xw, axis=0) if k < td else zrow
         for k in range(d)], axis=0)                            # [d, d, TB]
    return f_part, g_part, h_part


def _fval_terms(X, y, w, off, th, lam_vec, inv_n):
    """Objective value alone (line-search trials): [1, TB]."""
    z = jnp.sum(X * th[None, :, :], axis=1) + off
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    reg = 0.5 * jnp.sum(lam_vec * th * th, axis=0, keepdims=True)
    return (jnp.sum(w * bce, axis=0, keepdims=True) + reg) * inv_n


def _damped_gj_solve(H_data, th, g_data, lam_vec, inv_n, d, true_dim=None):
    """δ = A⁻¹·g for the damped SPD system in the SAME 1/n scaling as the
    batch-major path (ops/newton.py _delta_primal), so the Levenberg floor —
    and thus the iterates — match it exactly:
    A = (H + λM)/n + diag(eps·(1+|diag|)). In-VMEM Gauss–Jordan, no pivoting
    (the same masked-row scheme as linsolve._gj_kernel).
    Elimination runs only the first true_dim steps: the sublane-padding
    coordinates are decoupled by construction (zero Hessian rows/columns,
    zero rhs — θ starts 0 there and g = λθ/n stays 0), so their pivots
    never matter and δ is exactly 0 on them either way. Measured NEUTRAL at
    25/32 on v5e (the VPU runs whole sublane tiles regardless) — kept
    because it is provably identical and the skipped fraction grows for
    smaller dims.
    Returns (g_scaled [d, TB], delta [d, TB])."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    g_scaled = (g_data + lam_vec * th) * inv_n
    is_diag = row_ids[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, d, 1), 1)                                # [d, d, 1]
    A = (H_data + jnp.where(is_diag, lam_vec[:, None, :], 0.0)) * inv_n[None]
    diag0 = jnp.sum(jnp.where(is_diag, A, 0.0), axis=0)         # [d, TB]
    damp = _DAMP_EPS * (1.0 + jnp.abs(diag0))                   # [d, TB]
    A = A + jnp.where(is_diag, damp[:, None, :], 0.0)
    b = g_scaled
    for jj in range(d if true_dim is None else true_dim):
        is_j = row_ids == jj                                    # [d, 1]
        inv_p = 1.0 / A[jj, jj, :]                              # [TB]
        row_j = A[jj, :, :] * inv_p[None, :]                    # [d, TB]
        bj = b[jj, :] * inv_p                                   # [TB]
        factor = jnp.where(is_j, 0.0, A[:, jj, :])              # [d, TB]
        A = A - factor[:, None, :] * row_j[None, :, :]
        b = b - factor * bj[None, :]
        A = jnp.where(is_j[:, None, :], row_j[None, :, :], A)
        b = jnp.where(is_j, bj[None, :], b)
    return g_scaled, b


def _fgd_kernel(x_ref, y_ref, w_ref, off_ref, cnt_ref, th_ref,
                f_ref, g_ref, delta_ref, h_scratch, gd_scratch,
                *, d: int, true_dim: int, n_blocks: int, lam: float,
                unreg_bias: bool):
    """One Newton iteration for LANES entities: accumulate f/g/H over the
    n-blocks (grid dim 1), then damp + Gauss–Jordan solve in VMEM."""
    j = pl.program_id(1)

    X = x_ref[:]                       # [NB, d, TB]
    th = th_ref[:]                     # [d, TB]
    f_part, g_part, h_part = _data_terms(X, y_ref[:], w_ref[:], off_ref[:],
                                         th, true_dim)

    @pl.when(j == 0)
    def _():
        h_scratch[:] = h_part
        gd_scratch[0:1, :] = f_part
        gd_scratch[1:, :] = g_part

    @pl.when(j > 0)
    def _():
        h_scratch[:] += h_part
        gd_scratch[0:1, :] += f_part
        gd_scratch[1:, :] += g_part

    @pl.when(j == n_blocks - 1)
    def _():
        lam_vec = _lam_vec_of(d, lam, unreg_bias, X.dtype)      # [d, 1]
        inv_n = 1.0 / jnp.maximum(cnt_ref[:], 1.0)              # [1, TB]
        reg = 0.5 * jnp.sum(lam_vec * th * th, axis=0, keepdims=True)
        f_ref[:] = (gd_scratch[0:1, :] + reg) * inv_n
        g_scaled, delta = _damped_gj_solve(h_scratch[:], th,
                                           gd_scratch[1:, :], lam_vec,
                                           inv_n, d, true_dim)
        g_ref[:] = g_scaled
        delta_ref[:] = delta


def _newton_full_kernel(x_ref, y_ref, w_ref, off_ref, cnt_ref, th_ref,
                        out_th_ref, conv_ref, iters_ref,
                        *, d: int, true_dim: int, lam: float,
                        unreg_bias: bool, maxiter: int, ftol: float,
                        pgtol: float):
    """The WHOLE Newton solve for LANES entities in one kernel: X stays
    resident in VMEM across every iteration (HBM reads it exactly once per
    solve), and the while_loop exits as soon as THIS 128-lane block
    converges — blocks of early finishers stop paying for the bucket's
    stragglers (the in-kernel form of straggler compaction, free, at
    128-lane granularity). Same convergence semantics as the per-iteration
    path / batch-major path: Armijo backtracking, per-lane freezing,
    pgtol/ftol stops."""
    X = x_ref[:]                                                # [n, d, TB]
    y = y_ref[:]
    w = w_ref[:]
    off = off_ref[:]
    lam_vec = _lam_vec_of(d, lam, unreg_bias, X.dtype)          # [d, 1]
    inv_n = 1.0 / jnp.maximum(cnt_ref[:], 1.0)                  # [1, TB]

    # Mosaic layout constraints shape this loop: (a) i1 masks cannot
    # broadcast over the sublane dim, so booleans live as 0/1 floats and
    # every select is an arithmetic blend m*a + (1−m)*b; (b) loop-carried
    # values must not mix sublane-replicated [1, TB] reduction outputs with
    # concrete layouts (ADDs across them fail "Sublane broadcast"), so ALL
    # per-lane state is carried at [d, TB] — reductions are expanded back
    # with a float [d, 1] multiply, which Mosaic lowers fine. The d×
    # redundancy is noise next to the d³ Gauss–Jordan.
    ones_col = jnp.ones((d, 1), X.dtype)
    expand = lambda x1: x1 * ones_col                           # [1,TB]→[d,TB]
    one = jnp.ones((), X.dtype)

    def fgd(th):
        f_part, g_part, h_part = _data_terms(X, y, w, off, th, true_dim)
        reg = 0.5 * jnp.sum(lam_vec * th * th, axis=0, keepdims=True)
        f = expand((f_part + reg) * inv_n)                      # [d, TB]
        g_scaled, delta = _damped_gj_solve(h_part, th, g_part, lam_vec,
                                           inv_n, d, true_dim)
        return f, g_scaled, delta

    th0 = th_ref[:]
    f0, g0, delta0 = fgd(th0)
    done0 = expand((jnp.max(jnp.abs(g0), axis=0, keepdims=True)
                    <= pgtol).astype(X.dtype))                  # [d, TB]

    def cond(c):
        th, f, g, delta, done, iters, k = c
        return jnp.logical_and(k < maxiter, jnp.min(done) < 0.5)

    def body(c):
        th, f, g, delta, done, iters, k = c
        gdot = expand(jnp.sum(g * delta, axis=0, keepdims=True))

        def bt_cond(bc):
            step, accepted, f_new, i = bc
            return jnp.logical_and(
                i < _MAX_BACKTRACKS,
                jnp.min(jnp.maximum(accepted, done)) < 0.5)

        def bt_body(bc):
            step, accepted, f_new, i = bc
            trial = th - step * delta
            f_trial = expand(_fval_terms(X, y, w, off, trial, lam_vec,
                                         inv_n))
            ok = (f_trial <= f - _ARMIJO_C1 * step * gdot).astype(X.dtype)
            newly = ok * (one - accepted)                       # [d, TB]
            f_new = newly * f_trial + (one - newly) * f_new
            settled = jnp.maximum(accepted, newly)
            step_keep = settled * step + (one - settled) * step * 0.5
            return step_keep, settled, f_new, i + 1

        step0 = jnp.ones_like(f)
        step, accepted, f_new, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (step0, jnp.zeros_like(f), f, jnp.asarray(0, jnp.int32)))

        move = accepted * (one - done)                          # [d, TB]
        th_new = th - (move * step) * delta
        f_next = move * f_new + (one - move) * f

        _, g_new, delta_new = fgd(th_new)
        gmax = expand(jnp.max(jnp.abs(g_new), axis=0, keepdims=True))
        f_drop = f - f_next
        rel = jnp.maximum(jnp.maximum(jnp.abs(f), jnp.abs(f_next)), 1.0)
        conv = jnp.maximum((gmax <= pgtol).astype(X.dtype),
                           (f_drop <= ftol * rel).astype(X.dtype))
        done_new = jnp.maximum(jnp.maximum(done, conv), one - accepted)
        iters_new = iters + (one - done)
        return th_new, f_next, g_new, delta_new, done_new, iters_new, k + 1

    init = (th0, f0, g0, delta0, done0, jnp.zeros_like(f0),
            jnp.asarray(0, jnp.int32))
    th, f, g, delta, done, iters, k = jax.lax.while_loop(cond, body, init)
    out_th_ref[:] = th
    conv_ref[:] = done[0:1, :]
    iters_ref[:] = iters[0:1, :]


@functools.lru_cache(maxsize=None)
def _newton_full_call(n: int, d: int, true_dim: int, B: int, lam: float,
                      unreg_bias: bool, maxiter: int, ftol: float,
                      pgtol: float, interpret: bool):
    grid = (B // LANES,)
    kernel = functools.partial(_newton_full_kernel, d=d, true_dim=true_dim,
                               lam=lam, unreg_bias=unreg_bias,
                               maxiter=maxiter, ftol=ftol, pgtol=pgtol)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),               # X
            pl.BlockSpec((n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # labels
            pl.BlockSpec((n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # weights
            pl.BlockSpec((n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # offsets
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # counts
            pl.BlockSpec((d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # theta0
        ],
        out_specs=[
            pl.BlockSpec((d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # theta
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # converged
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),               # iterations
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), f32),
            jax.ShapeDtypeStruct((1, B), f32),
            jax.ShapeDtypeStruct((1, B), f32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _fgd_call(n: int, d: int, true_dim: int, B: int, lam: float,
              unreg_bias: bool, interpret: bool):
    nb = _pick_nb(n, d)
    n_blocks = n // nb
    grid = (B // LANES, n_blocks)
    kernel = functools.partial(_fgd_kernel, d=d, true_dim=true_dim,
                               n_blocks=n_blocks, lam=lam,
                               unreg_bias=unreg_bias)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, d, LANES), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),               # X
            pl.BlockSpec((nb, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),               # labels
            pl.BlockSpec((nb, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),               # weights
            pl.BlockSpec((nb, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),               # offsets
            pl.BlockSpec((1, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),               # counts
            pl.BlockSpec((d, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),               # theta
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),               # f
            pl.BlockSpec((d, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),               # g
            pl.BlockSpec((d, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),               # delta
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), f32),
            jax.ShapeDtypeStruct((d, B), f32),
            jax.ShapeDtypeStruct((d, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, d, LANES), f32),
            pltpu.VMEM((1 + d, LANES), f32),
        ],
        interpret=interpret,
    )


class _LanesState(NamedTuple):
    theta: jnp.ndarray    # [d, B]
    f: jnp.ndarray        # [B]
    g: jnp.ndarray        # [d, B]
    delta: jnp.ndarray    # [d, B]
    done: jnp.ndarray     # [B]
    iters: jnp.ndarray    # [B] int32
    k: jnp.ndarray        # scalar int32


def newton_lr_batch_lanes(theta0, X, labels, weights, offsets, counts, *,
                          l2_reg_weight: float, unreg_bias: bool,
                          maxiter: int, ftol: float, pgtol: float,
                          interpret: bool = False):
    """Drop-in lanes-last implementation of ops/newton.newton_lr_batch
    (primal path): same inputs (batch-major), same NewtonResult fields,
    same convergence semantics. f32 only; dim ≤ MAX_DIM.

    `unreg_bias` is the STATIC form of the l2_mask contract: True means the
    mask is ones-with-a-0-at-coordinate-0 (unregularized intercept), False
    means all-ones — the same two layouts the dual path supports.
    """
    from gdmix_tpu.ops.newton import NewtonResult

    dtype = jnp.float32
    B, n, dim = X.shape
    lam = float(l2_reg_weight)

    d_pad = (-dim) % 8
    d = dim + d_pad
    b_pad = (-B) % LANES
    Bp = B + b_pad

    # one-time relayout: [B, n, dim] → [n, d, Bp] (zero-padded coords/lanes;
    # padded lanes carry weight 0 / count 1 and converge at init)
    Xl = jnp.pad(X.astype(dtype), ((0, b_pad), (0, 0), (0, d_pad)))
    Xl = jnp.transpose(Xl, (1, 2, 0))
    yl = jnp.pad(labels.astype(dtype), ((0, b_pad), (0, 0))).T
    wl = jnp.pad(weights.astype(dtype), ((0, b_pad), (0, 0))).T
    ol = jnp.pad(offsets.astype(dtype), ((0, b_pad), (0, 0))).T
    cl = jnp.pad(jnp.maximum(counts.astype(dtype), 1.0),
                 ((0, b_pad),), constant_values=1.0)[None, :]
    th0 = jnp.pad(theta0.astype(dtype), ((0, b_pad), (0, d_pad))).T

    if n * d <= 1024:
        # X and the solve's temporaries fit Mosaic's 16 MB scoped-VMEM
        # stack (n·d = 2048 measured 16.26 MB — just over) → the fully-
        # fused kernel: the whole solve in ONE launch, X read from HBM
        # exactly once, and each 128-lane block exits its while_loop as
        # soon as it converges
        full = _newton_full_call(n, d, dim, Bp, lam, unreg_bias, maxiter,
                                 float(ftol), float(pgtol), interpret)
        th, conv, iters = full(Xl, yl, wl, ol, cl, th0)
        theta = jnp.transpose(th)[:B, :dim].astype(theta0.dtype)
        return NewtonResult(theta=theta, converged=conv[0, :B] > 0.5,
                            num_iterations=iters[0, :B].astype(jnp.int32))

    fgd = _fgd_call(n, d, dim, Bp, lam, unreg_bias, interpret)

    def run_fgd(th):
        f, g, delta = fgd(Xl, yl, wl, ol, cl, th)
        return f[0], g, delta

    lam_vec = jnp.full((d, 1), lam, dtype)
    if unreg_bias:
        lam_vec = lam_vec.at[0, 0].set(0.0)
    inv_n_vec = 1.0 / jnp.maximum(cl[0], 1.0)                   # [Bp]

    def run_f(th):
        # line-search trials in plain XLA on the lanes-last arrays: same one
        # X read as a kernel, but keeping Pallas out of the nested
        # backtracking while_loop cuts whole-program XLA compile time ~5×
        # (measured 90 s → ~20 s per bucket shape on the relay toolchain)
        z = jnp.einsum("ndb,db->nb", Xl, th) + ol
        bce = jnp.maximum(z, 0.0) - z * yl + jnp.log1p(jnp.exp(-jnp.abs(z)))
        reg = 0.5 * jnp.sum(lam_vec * th * th, axis=0)
        return (jnp.sum(wl * bce, axis=0) + reg) * inv_n_vec

    def cond(s: _LanesState):
        return jnp.logical_and(s.k < maxiter, ~jnp.all(s.done))

    def body(s: _LanesState):
        gdot = jnp.sum(s.g * s.delta, axis=0)                   # [Bp]

        def bt_cond(carry):
            step, accepted, f_new, i = carry
            return jnp.logical_and(i < _MAX_BACKTRACKS,
                                   ~jnp.all(accepted | s.done))

        def bt_body(carry):
            step, accepted, f_new, i = carry
            trial = s.theta - step[None, :] * s.delta
            f_trial = run_f(trial)
            ok = f_trial <= s.f - _ARMIJO_C1 * step * gdot
            newly = jnp.logical_and(ok, ~accepted)
            f_new = jnp.where(newly, f_trial, f_new)
            step_keep = jnp.where(accepted | newly, step, step * 0.5)
            return step_keep, accepted | newly, f_new, i + 1

        step0 = jnp.ones((Bp,), dtype)
        step, accepted, f_new, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (step0, jnp.zeros((Bp,), bool), s.f, jnp.asarray(0, jnp.int32)))

        move = jnp.logical_and(accepted, ~s.done)
        theta_new = jnp.where(move[None, :],
                              s.theta - step[None, :] * s.delta, s.theta)
        f_next = jnp.where(move, f_new, s.f)

        f_chk, g_new, delta_new = run_fgd(theta_new)
        gmax = jnp.max(jnp.abs(g_new), axis=0)
        f_drop = s.f - f_next
        rel = jnp.maximum(jnp.maximum(jnp.abs(s.f), jnp.abs(f_next)), 1.0)
        conv = jnp.logical_or(gmax <= pgtol, f_drop <= ftol * rel)
        done = s.done | conv | ~accepted
        iters = jnp.where(s.done, s.iters, s.iters + 1)
        return _LanesState(theta=theta_new, f=f_next, g=g_new,
                           delta=delta_new, done=done, iters=iters,
                           k=s.k + 1)

    f0, g0, delta0 = run_fgd(th0)
    init = _LanesState(theta=th0, f=f0, g=g0, delta=delta0,
                       done=jnp.max(jnp.abs(g0), axis=0) <= pgtol,
                       iters=jnp.zeros((Bp,), jnp.int32),
                       k=jnp.asarray(0, jnp.int32))
    s = jax.lax.while_loop(cond, body, init)
    theta = jnp.transpose(s.theta)[:B, :dim].astype(theta0.dtype)
    return NewtonResult(theta=theta, converged=s.done[:B],
                        num_iterations=s.iters[:B])
