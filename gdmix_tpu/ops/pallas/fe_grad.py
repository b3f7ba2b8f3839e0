"""Pallas TPU kernel: fused fixed-effect loss + gradient over padded-COO data.

Single-pass alternative to the XLA paths: each grid step densifies a [T, D]
tile directly in VMEM (lane-iota compare+select), runs X·w and Xᵀr on the MXU
from VMEM, and accumulates loss/grad into revisited output blocks.

Measured on TPU v5e at N=5M, D=10k, K=16 (per L-BFGS funcall): scatter 1.68s,
XLA one-hot 1.03s, this kernel 1.19s — the VPU compare+select densify dominates
all three at large D (XLA fuses its one-hot well), so the XLA one-hot remains
the FE default and this kernel is the tuning option (`grad_mode` could select
it in future rounds; at small D or on hardware with different VPU/MXU balance
the fused form wins).

Mosaic/layout notes (each cost a debugging round):
  * in-kernel lane slicing (`a[:, kk]`) and transposed dot contractions are
    unsupported ("Offset change") — columns are extracted with a lane-iota
    compare + reduce, and theta arrives as a [D, 1] column so every dot is a
    standard (((1,),(0,))) contraction;
  * [N, 1] operands get lane-padded ×128 in HBM (85 GB at N=5M!) — so the
    per-record scalars (y, w, off) ride as three extra columns of the [N, K+3]
    data array instead of separate arrays;
  * f32 MXU dots default to bf16 input rounding — Precision.HIGHEST.

Restrictions: D ≤ ~16k (the [T, D] tile must fit VMEM), logistic or linear
objective, padding rows carry weight 0. The scatter/one-hot XLA paths remain
for everything else.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # records per grid step (keeps the [T, D] tile in VMEM)


def _lane_col(arr, kk: int):
    """Extract column kk of a [T, L] tile as [T, 1] without lane slicing."""
    t, l = arr.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, l), 1)
    return jnp.sum(jnp.where(lane == kk, arr, jnp.zeros_like(arr)),
                   axis=1, keepdims=True)


def _kernel(idx_ref, data_ref, theta_ref, b_ref, loss_ref, grad_ref, rsum_ref,
            *, k: int, d: int, linear: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        rsum_ref[0, 0] = jnp.float32(0.0)
        grad_ref[...] = jnp.zeros_like(grad_ref)

    idx = idx_ref[...]          # [T, K] int32
    data = data_ref[...]        # [T, K+3] f32: values | y | w | off
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (TILE, d), 1)

    # densify in VMEM: K accumulation steps of [T, D] compare+select
    xd = jnp.zeros((TILE, d), jnp.float32)
    for kk in range(k):
        idx_k = _lane_col(idx, kk)        # [T, 1]
        val_k = _lane_col(data, kk)       # [T, 1]
        xd = xd + jnp.where(idx_k == iota_d, val_k, 0.0)

    y = _lane_col(data, k)
    w = _lane_col(data, k + 1)
    off = _lane_col(data, k + 2)

    z = jax.lax.dot_general(xd, theta_ref[...], (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)   # [T, 1]
    z = z + off + b_ref[0, 0]
    if linear:
        per = (y - z) * (y - z)
        dz = 2.0 * (z - y)
    else:
        per = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
        dz = jax.nn.sigmoid(z) - y
    r = w * dz                                                    # [T, 1]

    loss_ref[0, 0] += jnp.sum(w * per)
    rsum_ref[0, 0] += jnp.sum(r)
    grad_ref[...] += jax.lax.dot_general(
        r, xd, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                       # [1, D]


@functools.partial(jax.jit,
                   static_argnames=("num_features", "linear", "interpret"))
def fe_loss_grad_pallas(x, indices, values, labels, weights, offsets,
                        num_features: int, linear: bool = False,
                        interpret: bool = False):
    """Fused data term: returns (Σ weighted loss, grad[D+1]) with the intercept
    LAST (fixed-effect layout). Inputs must already be padded to a multiple of
    TILE rows (padding rows: weight 0)."""
    n, k = indices.shape
    assert n % TILE == 0, (n, TILE)
    d = num_features
    w_vec, b = x[:-1], x[-1]

    data = jnp.concatenate(
        [values.astype(jnp.float32),
         labels.reshape(n, 1).astype(jnp.float32),
         weights.reshape(n, 1).astype(jnp.float32),
         offsets.reshape(n, 1).astype(jnp.float32)], axis=1)   # [N, K+3]

    grid = (n // TILE,)
    kernel = functools.partial(_kernel, k=k, d=d, linear=linear)
    loss, grad, rsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, k + 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(indices, data, w_vec[:, None].astype(jnp.float32),
      jnp.asarray(b, jnp.float32)[None, None])
    grad_full = jnp.concatenate([grad[0], rsum[0]])
    return loss[0, 0], grad_full.astype(x.dtype)
