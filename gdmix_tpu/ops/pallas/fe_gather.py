"""Pallas TPU kernel: fixed-effect loss+grad with an in-kernel VMEM gather.

The two existing FE paths pay for the GATHER side (z = X·θ) in very different
coin: the XLA `block` path (ops/logistic.fixed_effect_value_and_grad_block)
materializes [e, A]/[e, 128] one-hots through HBM (memory-bound, ~650 GB/s of
pure one-hot traffic), and the fused one-hot kernel (ops/pallas/fe_block.py)
recomputes them in VMEM but burns MXU passes re-deriving θ[idx] as
onehot(hi)·θ₂ ⊙ onehot(lo) — per-entry A·128 MACs to select ONE scalar.

Here pass 1 is a true dynamic gather from a VMEM-resident θ via `jnp.take`:
gathered[t,k] = θ[idx[t,k]] — exact f32, no MXU, no one-hot. Pass 2 (the
scatter Xᵀr) keeps the one-hot matmul form — TPU has no vectorized scatter
ALU, and contraction-over-records dots are MXU-shaped:

  per grid step (T records):
    pass 1: G = take(θ, idx)            [T, K+3] VMEM gather (3 pad columns)
            z = Σ_k v ⊙ G + off + b     [T, 1]
            r = w·(σ(z) − y)            (or 2w(z−y) linear)
    pass 2: per k: hi_ce = onehot_A(idx_k//128) ⊙ (v_k·r)   [T, A]
                   lo    = onehot(idx_k%128)                [T, 128]
                   g₂   += hi_ceᵀ·lo   ([A, 128], contraction over T)

HBM traffic = the data exactly once (idx+values+y/w/off) + the [A,128]
accumulator; gather precision is exact f32 (better than the block path's
bf16x3 HIGH dots). The indices ride pre-padded to [N, K+3] so the kernel
never lane-slices (Mosaic rejects in-kernel lane slicing; the 3 extra gather
lanes hit θ[0] and are zeroed by the value columns' iota mask). Replaces the
reference hot loop fixed_effect_lr_lbfgs_model.py:309-392.

This mode is OPT-IN (grad_mode=pallas_gather): Mosaic versions that cannot
lower a 1-D `jnp.take` raise at jit-compile time (current TPU toolchains
reject it with "Only 2D gather is supported") — use `block` there (the
grad_mode=auto production choice; `pallas_flat` is a small-batch-only
opt-in, see fe_flat.py's 128× HBM-padding caveat). The shared
residual/scatter pieces live in ops/pallas/fe_block.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdmix_tpu.ops.pallas.fe_block import (LANE, _col, loss_residual,
                                           scatter_pass)


def _kernel(idx_ref, data_ref, theta_ref, b_ref, loss_ref, g2_ref, rsum_ref,
            *, k: int, a_blocks: int, tile: int, linear: bool, precision):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        rsum_ref[0, 0] = jnp.float32(0.0)
        g2_ref[...] = jnp.zeros_like(g2_ref)

    idx = idx_ref[...]            # [T, K+3] int32 (3 zero pad columns)
    data = data_ref[...]          # [T, K+3] f32: values | y | w | off

    # ---- pass 1: exact VMEM gather ----
    theta_flat = theta_ref[...].reshape(a_blocks * LANE)
    gathered = jnp.take(theta_flat, idx, axis=0)            # [T, K+3]
    lanepos = jax.lax.broadcasted_iota(jnp.int32, (tile, k + 3), 1)
    vals = jnp.where(lanepos < k, data, 0.0)                # zero y/w/off cols
    z = jnp.sum(vals * gathered, axis=1, keepdims=True)     # [T, 1]

    y = _col(data, k)
    w = _col(data, k + 1)
    off = _col(data, k + 2)
    z = z + off + b_ref[0, 0]
    per, dz = loss_residual(z, y, linear)
    r = w * dz                                              # [T, 1]
    loss_ref[0, 0] += jnp.sum(w * per)
    rsum_ref[0, 0] += jnp.sum(r)

    # ---- pass 2: one-hot matmul scatter (contraction over records) ----
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    g2_ref[...] += scatter_pass(idx, data, r, k=k, iota_a=iota_a,
                                iota_l=iota_l, precision=precision)


@functools.partial(jax.jit, static_argnames=("num_features", "linear", "tile",
                                             "precision_name", "interpret"))
def fe_loss_grad_gather_pallas(x, indices, values, labels, weights, offsets,
                               num_features: int, linear: bool = False,
                               tile: int = 2048,
                               precision_name: str = "high",
                               interpret: bool = False):
    """Fused data term via in-kernel gather: (Σ weighted loss, grad[D+1]),
    intercept LAST. Inputs padded to a multiple of `tile` rows (padding rows:
    weight 0). Works at any feature count (θ lives in VMEM as [A, 128])."""
    n, k = indices.shape
    assert n % tile == 0, (n, tile)
    d = num_features
    a_blocks = max((d + LANE - 1) // LANE, 1)
    d_pad = a_blocks * LANE
    # Mosaic implements only DEFAULT (1-pass bf16) and HIGHEST (f32) dots —
    # no 3-pass HIGH mode inside a TPU kernel, so "high" promotes.
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "high": jax.lax.Precision.HIGHEST,
                 "default": jax.lax.Precision.DEFAULT}[precision_name]

    w_vec, b = x[:-1], x[-1]
    theta2 = jnp.zeros((d_pad,), jnp.float32).at[:d].set(
        w_vec.astype(jnp.float32)).reshape(a_blocks, LANE)
    idx_pad = jnp.concatenate(
        [indices.astype(jnp.int32), jnp.zeros((n, 3), jnp.int32)], axis=1)
    data = jnp.concatenate(
        [values.astype(jnp.float32),
         labels.reshape(n, 1).astype(jnp.float32),
         weights.reshape(n, 1).astype(jnp.float32),
         offsets.reshape(n, 1).astype(jnp.float32)], axis=1)   # [N, K+3]

    kernel = functools.partial(_kernel, k=k, a_blocks=a_blocks, tile=tile,
                               linear=linear, precision=precision)
    loss, g2, rsum = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, k + 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k + 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_blocks, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((a_blocks, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((a_blocks, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx_pad, data, theta2, jnp.asarray(b, jnp.float32)[None, None])
    grad_full = jnp.concatenate([g2.reshape(-1)[:d], rsum[0]])
    return loss[0, 0], grad_full.astype(x.dtype)
