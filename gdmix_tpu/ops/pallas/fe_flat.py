"""Pallas TPU kernels: FLAT entry-space fixed-effect gather/scatter.

Why a third FE kernel family: the measured bottlenecks of the other two are
layout, not math. The XLA `block` path (ops/logistic.fixed_effect_value_and_
grad_block) is fast on the MXU but materializes [e, A]/[e, 128] one-hot
operands through HBM between fusions (~66 GB per funcall at N=5M, K=16); the
fused kernels (ops/pallas/fe_block.py, fe_gather.py) keep one-hots in VMEM but
pay for RECORD-major layout: every per-k column extraction is a [T, K] iota
compare (`_col`) and every dot is a skinny K-unrolled [T, A] one, so the VPU
runs 1/128-lane columns and the MXU gets 16 small dots per tile.

Here the kernels operate on the FLATTENED entry axis (E = N·K rows, one sparse
entry per row) so there is nothing to unroll and nothing to extract:

  gather kernel  (per tile of T entries):
      hi1 = onehot_A(idx // 128)      [T, A]    full-lane VPU compare
      lo1 = onehot(idx % 128)         [T, 128]
      G   = hi1 @ θ₂                  [T, 128]  ONE MXU dot per tile
      out = vals ⊙ rowsum(G ⊙ lo1)    [T, 1]    = vals·θ[idx]

  XLA middle (fused elementwise, [N]-sized):
      z = Σ_k out[n,k] + off + b;  r = w·(σ(z) − y);  ce = vals ⊙ r[expand]

  scatter kernel (per tile of T entries):
      hi_ce = where(idx//128 == iota_A, ce, 0)   [T, A]
      g₂   += hi_ceᵀ ·(dim-0) lo1                [A, 128]  ONE MXU dot per tile

HBM traffic is the data once per kernel plus two [E] f32 vectors (gathered,
ce) — 128× less than the block path's one-hot spill. The MXU work is the same
2·E·A·128 MACs as the block path but from VMEM-resident operands.

precision_name:
  * "high"    — f32 operands, promoted to HIGHEST (6-pass f32) dots: Mosaic
    has no 3-pass mode inside a kernel, only DEFAULT (1-pass bf16) / HIGHEST.
  * "bf16x2"  — θ and ce ride as exact two-term bf16 splits (hi + lo, each a
    separate operand so no in-kernel lane slicing), one-hots are bf16-EXACT
    (entries 0/1), every dot is a single native bf16 pass with f32
    accumulation: 4 total passes vs HIGH's 6, ~2⁻¹⁷ relative gradient error
    (vs f32's 2⁻²⁴) — measured well inside L-BFGS tolerance
    (tests/test_fe_pallas_kernel.py).

SCALE CAVEAT (why this mode is OPT-IN, not grad_mode=auto's choice): the
[E, 1] entry-column arrays this wrapper materializes in HBM are tiled
T(8,128) by XLA — 512 bytes per 4-byte entry. At production batch sizes the
allocation alone is prohibitive (N=5M, K=16 → 40 GB for ONE operand; compile
fails with "Allocation would exceed memory") and wherever it does fit the
padded traffic (~2 KB/entry across idx/val/gathered/ce) already exceeds the
block path's one-hot spill (~1.7 KB/entry at D=10k), so the VMEM-resident
one-hot win never materializes end-to-end. The fix would be dense
[E/128, 128] layouts, but Mosaic today can neither relayout lane-major
entries to rows in-kernel nor gather from a VMEM table
(tpu.dynamic_gather: "Multiple source vregs along gather dimension").
Use grad_mode=block (ops/logistic.fixed_effect_value_and_grad_block,
0.126 s/funcall at N=5M, D=10k, K=16 on v5e) for large batches; this kernel
remains correct (on-chip oracle-tested at small N) for future toolchains.

Same math as fixed_effect_value_and_grad with l2_reg_weight=0 (the caller adds
the λ-term once); replaces the reference's whole-epoch TF-graph hot loop
(fixed_effect_lr_lbfgs_model.py:309-392). Padding rows carry weight 0 and
padding entries carry value 0, so both are inert by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdmix_tpu.ops.pallas.fe_block import LANE, loss_residual


def _bf16_split(a: jnp.ndarray):
    """a ≈ hi + lo with both terms exactly representable in bf16."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _gather_kernel_split(idx_ref, val_ref, t2hi_ref, t2lo_ref, out_ref, *,
                         a_blocks: int, tile: int):
    idx = idx_ref[...]                                     # [T, 1] int32
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    hi1 = (idx // LANE == iota_a).astype(jnp.bfloat16)     # [T, A], exact
    lo1 = (idx % LANE == iota_l).astype(jnp.float32)       # [T, 128]
    dims = (((1,), (0,)), ((), ()))
    G = (jax.lax.dot_general(hi1, t2hi_ref[...], dims,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(hi1, t2lo_ref[...], dims,
                               preferred_element_type=jnp.float32))  # [T, 128]
    out_ref[...] = val_ref[...] * jnp.sum(G * lo1, axis=1, keepdims=True)


def _gather_kernel_f32(idx_ref, val_ref, theta_ref, out_ref, *,
                       a_blocks: int, tile: int, precision):
    idx = idx_ref[...]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    hi1 = (idx // LANE == iota_a).astype(jnp.float32)
    lo1 = (idx % LANE == iota_l).astype(jnp.float32)
    G = jax.lax.dot_general(hi1, theta_ref[...], (((1,), (0,)), ((), ())),
                            precision=precision,
                            preferred_element_type=jnp.float32)
    out_ref[...] = val_ref[...] * jnp.sum(G * lo1, axis=1, keepdims=True)


def _scatter_kernel_split(idx_ref, cehi_ref, celo_ref, g2_ref, *,
                          a_blocks: int, tile: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g2_ref[...] = jnp.zeros_like(g2_ref)

    idx = idx_ref[...]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    # bf16 0/1 masks (exact), multiplied in rather than jnp.where-selected:
    # Mosaic cannot relayout a twice-used [T, A] i1 compare result on real
    # TPUs ("Invalid relayout: non-singleton dimension replicated"), and
    # mask·ce with an exact 0/1 bf16 mask is the same value.
    hi1 = (idx // LANE == iota_a).astype(jnp.bfloat16)     # [T, A], exact
    lo1 = (idx % LANE == iota_l).astype(jnp.bfloat16)      # [T, 128], exact
    dims = (((0,), (0,)), ((), ()))                        # contraction over T
    acc = jax.lax.dot_general(hi1 * cehi_ref[...], lo1, dims,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(hi1 * celo_ref[...], lo1, dims,
                                    preferred_element_type=jnp.float32)
    g2_ref[...] += acc


def _scatter_kernel_f32(idx_ref, ce_ref, g2_ref, *, a_blocks: int, tile: int,
                        precision):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g2_ref[...] = jnp.zeros_like(g2_ref)

    idx = idx_ref[...]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    hi_ce = jnp.where(idx // LANE == iota_a, ce_ref[...], 0.0)  # [T, A]
    lo1 = (idx % LANE == iota_l).astype(jnp.float32)
    g2_ref[...] += jax.lax.dot_general(hi_ce, lo1, (((0,), (0,)), ((), ())),
                                       precision=precision,
                                       preferred_element_type=jnp.float32)


def auto_tile(num_features: int, budget_bytes: int = 24 << 20) -> int:
    """Entry-tile size keeping the [T, A] + [T, 128] working set under budget."""
    a_blocks = max((num_features + LANE - 1) // LANE, 1)
    per_row = (a_blocks + 2 * LANE + 8) * 4
    t = max(512, min(8192, budget_bytes // per_row))
    return (t // 512) * 512


@functools.partial(jax.jit, static_argnames=("num_features", "linear", "tile",
                                             "precision_name", "interpret"))
def fe_loss_grad_flat_pallas(x, indices, values, labels, weights, offsets,
                             num_features: int, linear: bool = False,
                             tile: int = 0,
                             precision_name: str = "bf16x2",
                             interpret: bool = False):
    """Flat entry-space data term: (Σ weighted loss, grad[D+1]), intercept LAST.

    Record count must be a multiple of ⌈tile/K⌉·K's row equivalent — callers
    pad rows (weight 0, value 0) to a multiple of `tile // K` records; any
    tile multiple of K works. With tile=0 an auto size is chosen from D.
    """
    n, k = indices.shape
    d = num_features
    a_blocks = max((d + LANE - 1) // LANE, 1)
    d_pad = a_blocks * LANE
    if tile == 0:
        tile = auto_tile(d)
    e = n * k
    assert e % tile == 0, (n, k, tile)
    grid = (e // tile,)

    w_vec, b = x[:-1], x[-1]
    theta2 = jnp.zeros((d_pad,), jnp.float32).at[:d].set(
        w_vec.astype(jnp.float32)).reshape(a_blocks, LANE)
    idx_flat = indices.reshape(e, 1)
    val_flat = values.reshape(e, 1).astype(jnp.float32)

    entry_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    theta_spec = pl.BlockSpec((a_blocks, LANE), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    g2_spec = pl.BlockSpec((a_blocks, LANE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_shape_e = jax.ShapeDtypeStruct((e, 1), jnp.float32)
    out_shape_g2 = jax.ShapeDtypeStruct((a_blocks, LANE), jnp.float32)
    compiler = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    split = precision_name == "bf16x2"
    # Mosaic implements only DEFAULT (1-pass bf16) and HIGHEST (f32) dots —
    # there is no 3-pass HIGH mode inside a TPU kernel, so "high" promotes.
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "high": jax.lax.Precision.HIGHEST,
                 "default": jax.lax.Precision.DEFAULT}.get(precision_name)

    if split:
        t2_hi, t2_lo = _bf16_split(theta2)
        gathered = pl.pallas_call(
            functools.partial(_gather_kernel_split, a_blocks=a_blocks,
                              tile=tile),
            grid=grid,
            in_specs=[entry_spec, entry_spec, theta_spec, theta_spec],
            out_specs=entry_spec, out_shape=out_shape_e,
            interpret=interpret, compiler_params=compiler,
        )(idx_flat, val_flat, t2_hi, t2_lo)
    else:
        gathered = pl.pallas_call(
            functools.partial(_gather_kernel_f32, a_blocks=a_blocks,
                              tile=tile, precision=precision),
            grid=grid,
            in_specs=[entry_spec, entry_spec, theta_spec],
            out_specs=entry_spec, out_shape=out_shape_e,
            interpret=interpret, compiler_params=compiler,
        )(idx_flat, val_flat, theta2)

    # XLA middle: per-record z, loss, residual — fused elementwise, [N]-sized.
    z = jnp.sum(gathered.reshape(n, k), axis=1) + offsets.astype(jnp.float32) \
        + jnp.float32(b)
    per, dz = loss_residual(z, labels.astype(jnp.float32), linear)
    w32 = weights.astype(jnp.float32)
    r = w32 * dz                                           # [N]
    value = jnp.sum(w32 * per)
    ce = (values.astype(jnp.float32)
          * jnp.broadcast_to(r[:, None], (n, k))).reshape(e, 1)

    if split:
        ce_hi, ce_lo = _bf16_split(ce)
        g2 = pl.pallas_call(
            functools.partial(_scatter_kernel_split, a_blocks=a_blocks,
                              tile=tile),
            grid=grid,
            in_specs=[entry_spec, entry_spec, entry_spec],
            out_specs=g2_spec, out_shape=out_shape_g2,
            interpret=interpret, compiler_params=compiler,
        )(idx_flat, ce_hi, ce_lo)
    else:
        g2 = pl.pallas_call(
            functools.partial(_scatter_kernel_f32, a_blocks=a_blocks,
                              tile=tile, precision=precision),
            grid=grid,
            in_specs=[entry_spec, entry_spec],
            out_specs=g2_spec, out_shape=out_shape_g2,
            interpret=interpret, compiler_params=compiler,
        )(idx_flat, ce)

    grad_full = jnp.concatenate([g2.reshape(-1)[:d], jnp.sum(r)[None]])
    return value.astype(x.dtype), grad_full.astype(x.dtype)
