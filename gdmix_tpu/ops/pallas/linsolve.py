"""Pallas TPU kernel: batched small-SPD linear solve (the Newton hot op).

XLA's batched `cho_factor`/`cho_solve` on [B, d, d] with tiny d is the dominant
cost of the random-effect Newton solver (~245 ms per iteration at B=65k, d=29 —
profiled on TPU v5e; the Hessian einsum itself is 36 ms). The generic batched
factorization runs one column step per kernel launch with the batch in the
sublane dim, so 3/4 of the lanes idle and every step round-trips HBM.

This kernel instead lays the BATCH along the 128-wide lane dimension —
H as [d, d, B], g as [d, B] — and runs a fully unrolled Gauss–Jordan
elimination (no pivoting; the caller supplies a damped SPD matrix) with all d
steps resident in VMEM: one HBM read of H, one write of x. ~100× less HBM
traffic than the step-per-launch approach.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BATCH = 128   # batch elements per block → full VPU lane width


def _gj_kernel(h_ref, g_ref, out_ref, *, d: int):
    A = h_ref[:]              # [d, d, TB]
    b = g_ref[:]              # [d, TB]
    # row-selection masks (scatter/.at is not lowerable on TPU Pallas — use
    # masked whole-array updates instead; iota must be ≥2-D on TPU)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)      # [d, 1]
    for j in range(d):        # static unroll: all steps stay in VMEM
        is_j = row_ids == j                                        # [d, 1]
        inv_p = 1.0 / A[j, j, :]                 # [TB]
        row_j = A[j, :, :] * inv_p[None, :]      # [d, TB]
        bj = b[j, :] * inv_p                     # [TB]
        # zero the factor at row j so the rank-1 update leaves row j alone,
        # then overwrite row j with the normalized pivot row
        factor = jnp.where(is_j, 0.0, A[:, j, :])                  # [d, TB]
        A = A - factor[:, None, :] * row_j[None, :, :]
        b = b - factor * bj[None, :]
        A = jnp.where(is_j[:, None, :], row_j[None, :, :], A)  # [d,1,1] mask
        b = jnp.where(is_j, bj[None, :], b)
    out_ref[:] = b


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_lanes(H: jnp.ndarray, g: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Solve H·x = g for a batch laid out lanes-last: H [d, d, B], g [d, B].

    B must be a multiple of LANE_BATCH (pad with identity systems). Returns
    x [d, B]. H must be (damped) positive definite — no pivoting.
    """
    d, _, B = H.shape
    assert B % LANE_BATCH == 0, f"batch {B} not a multiple of {LANE_BATCH}"
    grid = (B // LANE_BATCH,)
    kernel = functools.partial(_gj_kernel, d=d)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, LANE_BATCH), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, LANE_BATCH), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, LANE_BATCH), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, B), H.dtype),
        interpret=interpret,
    )(H, g)


def spd_solve_batched(H: jnp.ndarray, g: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Batch-major convenience wrapper: H [B, d, d], g [B, d] → x [B, d].

    Pads B to the lane width, d to the sublane width (extra coords become
    independent identity rows), and transposes to lanes-last for the kernel.
    """
    B, d, _ = H.shape
    d_pad = (-d) % 8
    if d_pad:
        dd = d + d_pad
        Hp = jnp.zeros((B, dd, dd), H.dtype)
        Hp = Hp.at[:, :d, :d].set(H)
        Hp = Hp.at[:, jnp.arange(d, dd), jnp.arange(d, dd)].set(1.0)
        H = Hp
        g = jnp.concatenate([g, jnp.zeros((B, d_pad), g.dtype)], axis=1)
    pad = (-B) % LANE_BATCH
    if pad:
        eye = jnp.broadcast_to(jnp.eye(H.shape[1], dtype=H.dtype),
                               (pad,) + H.shape[1:])
        H = jnp.concatenate([H, eye], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, H.shape[1]), g.dtype)], axis=0)
    x = spd_solve_lanes(jnp.transpose(H, (1, 2, 0)),
                        jnp.transpose(g, (1, 0)), interpret=interpret)
    return jnp.transpose(x, (1, 0))[:B, :d]


def _gj_kernel_mrhs(h_ref, g_ref, out_ref, *, d: int, r: int):
    """Gauss–Jordan with r right-hand sides per system: A [d, d, TB],
    b [d, r, TB] (same masked-update scheme as _gj_kernel)."""
    A = h_ref[:]              # [d, d, TB]
    b = g_ref[:]              # [d, r, TB]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)       # [d, 1]
    row_ids3 = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)   # [d, 1, 1]
    for j in range(d):
        is_j = row_ids == j
        is_j3 = row_ids3 == j
        inv_p = 1.0 / A[j, j, :]                 # [TB]
        row_j = A[j, :, :] * inv_p[None, :]      # [d, TB]
        bj = b[j, :, :] * inv_p[None, :]         # [r, TB]
        factor = jnp.where(is_j, 0.0, A[:, j, :])                  # [d, TB]
        A = A - factor[:, None, :] * row_j[None, :, :]
        b = b - factor[:, None, :] * bj[None, :, :]
        A = jnp.where(is_j[:, None, :], row_j[None, :, :], A)
        b = jnp.where(is_j3, bj[None, :, :], b)
    out_ref[:] = b


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_lanes_mrhs(H: jnp.ndarray, g: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Multi-RHS lanes-last solve: H [d, d, B], g [d, r, B] → x [d, r, B].
    B must be a multiple of LANE_BATCH; H damped SPD (no pivoting)."""
    d, _, B = H.shape
    _, r, _ = g.shape
    assert B % LANE_BATCH == 0, f"batch {B} not a multiple of {LANE_BATCH}"
    grid = (B // LANE_BATCH,)
    kernel = functools.partial(_gj_kernel_mrhs, d=d, r=r)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, LANE_BATCH), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r, LANE_BATCH), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, r, LANE_BATCH), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, B), H.dtype),
        interpret=interpret,
    )(H, g)


def spd_solve_batched_mrhs(H: jnp.ndarray, g: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Batch-major multi-RHS wrapper: H [B, d, d], g [B, d, r] → x [B, d, r]."""
    B, d, _ = H.shape
    r = g.shape[2]
    d_pad = (-d) % 8
    if d_pad:
        dd = d + d_pad
        Hp = jnp.zeros((B, dd, dd), H.dtype)
        Hp = Hp.at[:, :d, :d].set(H)
        Hp = Hp.at[:, jnp.arange(d, dd), jnp.arange(d, dd)].set(1.0)
        H = Hp
        g = jnp.concatenate([g, jnp.zeros((B, d_pad, r), g.dtype)], axis=1)
    pad = (-B) % LANE_BATCH
    if pad:
        eye = jnp.broadcast_to(jnp.eye(H.shape[1], dtype=H.dtype),
                               (pad,) + H.shape[1:])
        H = jnp.concatenate([H, eye], axis=0)
        g = jnp.concatenate(
            [g, jnp.zeros((pad, H.shape[1], r), g.dtype)], axis=0)
    x = spd_solve_lanes_mrhs(jnp.transpose(H, (1, 2, 0)),
                             jnp.transpose(g, (1, 2, 0)), interpret=interpret)
    return jnp.transpose(x, (2, 0, 1))[:B, :d, :r]
