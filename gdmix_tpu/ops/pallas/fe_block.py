"""Pallas TPU kernel: fused TWO-LEVEL one-hot fixed-effect loss + gradient.

The XLA `block` path (ops/logistic.fixed_effect_value_and_grad_block) decomposes
every feature id as idx = hi·128 + lo so the sparse gather/scatter become MXU
matmuls against a [A, 128] reshape of θ (A = ⌈D/128⌉). Its cost on real chips is
dominated not by the MXU but by materializing the [e, A] / [e, 128] one-hot
operands through HBM between fusions (~66 GB per funcall at N=5M, K=16).

This kernel fuses the whole funcall so the one-hots never leave VMEM:

  per grid step (T records):
    pass 1 (gather):  for every k-slice, hi_k = onehot(idx//128) [T, A],
                      lo_k = onehot(idx%128) [T, 128];
                      z += Σ_k v_k ⊙ rowsum(hi_k@θ₂ ⊙ lo_k)
    residual:         r = w·(σ(z+off+b) − y)      (or 2w(z−y) linear)
    pass 2 (scatter): g₂ += Σ_k (hi_k ⊙ v_k r)ᵀ-contract lo_k   [A, 128]

HBM traffic is exactly the data (indices+values+y/w/off) once per funcall plus
the [A,128] accumulator — the speed-of-light for this decomposition.

Measured (TPU v5e, N=5M, D=10k, K=16 per funcall, round 2): this kernel
0.166 s (one-hots stashed in VMEM scratch) / 0.172 s (recomputed, this
version) at DEFAULT precision, 0.237–0.264 s at HIGHEST — vs the XLA
`block` path's 0.126 s (HIGH) / 0.101 s (DEFAULT). XLA's single flat
[e=chunk·K, A] layout keeps every elementwise op full-lane and feeds one
large matmul per chunk, which beats this kernel's K-unrolled [T, A] dots and
[T, 1] scalar columns (1/128 lane use). The XLA block path therefore remains
the production default; this kernel is kept as the measured-alternative and
for hardware where the VPU/MXU balance differs. Per-operand asymmetric dot
precision on the XLA path (one-hots are bf16-exact) was also measured: 2.5%
— the funcall is bound on one-hot construction + memory, not MXU passes.

Same math as fixed_effect_value_and_grad with l2_reg_weight=0 (the caller adds
the λ-term); replaces the reference hot loop fixed_effect_lr_lbfgs_model.py:309-392.
Mosaic notes (see also ops/pallas/fe_grad.py): lane slicing is unsupported, so
k-columns are extracted by iota compare+reduce; dim-0 dot contraction
(((0,),(0,)) is the supported "transposed" form; per-record scalars ride as
extra columns of the data block to avoid [N,1] lane padding in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _col(arr, kk: int):
    """Column kk of a [T, L] tile as [T, 1] (no lane slicing in Mosaic)."""
    t, l = arr.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, l), 1)
    return jnp.sum(jnp.where(lane == kk, arr, jnp.zeros_like(arr)),
                   axis=1, keepdims=True)


def loss_residual(z, y, linear: bool):
    """(per-sample loss, dloss/dz) — shared by every fused FE kernel."""
    if linear:
        return (y - z) * (y - z), 2.0 * (z - y)
    per = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return per, jax.nn.sigmoid(z) - y


def scatter_pass(idx, data, r, *, k: int, iota_a, iota_l, precision):
    """The one-hot matmul scatter Σ_k (onehot_A(idx_k//128) ⊙ v_k·r)ᵀ ·
    onehot(idx_k%128) → [A, 128] — shared by every fused FE kernel. One-hots
    are built in-register (fusing the ce multiply into the hi compare)."""
    a_blocks = iota_a.shape[1]
    g2 = jnp.zeros((a_blocks, LANE), jnp.float32)
    for kk in range(k):
        idx_k = _col(idx, kk)
        ce_k = _col(data, kk) * r                          # [T, 1]
        hi_ce = jnp.where(idx_k // LANE == iota_a, ce_k, 0.0)  # [T, A]
        lo_k = (idx_k % LANE == iota_l).astype(jnp.float32)    # [T, 128]
        g2 = g2 + jax.lax.dot_general(
            hi_ce, lo_k, (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    return g2


def _kernel(idx_ref, data_ref, theta_ref, b_ref, loss_ref, g2_ref, rsum_ref,
            *, k: int, a_blocks: int, tile: int, linear: bool,
            precision):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        rsum_ref[0, 0] = jnp.float32(0.0)
        g2_ref[...] = jnp.zeros_like(g2_ref)

    idx = idx_ref[...]            # [T, K] int32
    data = data_ref[...]          # [T, K+3] f32: values | y | w | off
    theta2 = theta_ref[...]       # [A, 128]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)

    # pass 1: gather z = Σ_k v_k · θ[idx_k]
    z = jnp.zeros((tile, 1), jnp.float32)
    for kk in range(k):
        idx_k = _col(idx, kk)                              # [T, 1]
        hi_k = (idx_k // LANE == iota_a).astype(jnp.float32)   # [T, A]
        lo_k = (idx_k % LANE == iota_l).astype(jnp.float32)    # [T, 128]
        G = jax.lax.dot_general(hi_k, theta2, (((1,), (0,)), ((), ())),
                                precision=precision,
                                preferred_element_type=jnp.float32)  # [T, 128]
        v_k = _col(data, kk)
        z = z + v_k * jnp.sum(G * lo_k, axis=1, keepdims=True)

    y = _col(data, k)
    w = _col(data, k + 1)
    off = _col(data, k + 2)
    z = z + off + b_ref[0, 0]
    per, dz = loss_residual(z, y, linear)
    r = w * dz                                             # [T, 1]
    loss_ref[0, 0] += jnp.sum(w * per)
    rsum_ref[0, 0] += jnp.sum(r)

    # pass 2: scatter g2 += Σ_k (hi_k ⊙ v_k·r)ᵀ·lo_k (dim-0 contraction)
    g2_ref[...] += scatter_pass(idx, data, r, k=k, iota_a=iota_a,
                                iota_l=iota_l, precision=precision)


@functools.partial(jax.jit, static_argnames=("num_features", "linear", "tile",
                                             "precision_name", "interpret"))
def fe_loss_grad_block_pallas(x, indices, values, labels, weights, offsets,
                              num_features: int, linear: bool = False,
                              tile: int = 1024,
                              precision_name: str = "high",
                              interpret: bool = False):
    """Fused two-level data term: (Σ weighted loss, grad[D+1]), intercept LAST.

    Inputs padded to a multiple of `tile` rows (padding rows: weight 0).
    Works at any feature count (VMEM holds [A,128] θ + per-k one-hot stashes,
    not a [T, D] tile)."""
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
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(indices, data, theta2, jnp.asarray(b, jnp.float32)[None, None])
    grad_full = jnp.concatenate([g2.reshape(-1)[:d], rsum[0]])
    return loss[0, 0], grad_full.astype(x.dtype)
