"""Pallas TPU kernel: fused COMPACT-SPACE two-level one-hot FE hot-side pass.

The wide-D hybrid (ops/logistic.py HybridAux) runs the hot-feature majority of
entries against a compact top-A id space. On the XLA path the compact one-hot
matmuls get rewritten into XLA's per-entry gather/scatter machinery, which is
TABLE-SIZE INDEPENDENT and latency-bound at ~9 ns/entry gather + ~7 ns/entry
scatter (scripts/fe_hybrid_probe2.py: take/scatter cost the same at A=32k as
at D=1M) — so the XLA hybrid only recovers ~1.2x of the 1.31 s wide-D
funcall. This kernel keeps the one-hot operands in VMEM and feeds REAL MXU
matmuls, where the arithmetic is tiny: at A=32k, 80M entries cost
4·e·A ≈ 10.5 TFLOP of bf16 — ~55 ms at v5e peak vs 0.7 s for XLA's
per-entry walk.

Per grid step (T records, K entries each):
    gather:   G_k = onehot(idx_k//128) @ θ_hi + ... @ θ_lo   (bf16 dots,
              f32 accum; θ split into two exact bf16 terms — one-hots are
              bf16-exact, so DEFAULT-precision single-pass dots lose nothing)
    z += v_k ⊙ (G_k ⊙ onehot(idx_k%128)).rowsum
    residual: r = w·(σ(z+off₂+b) − y)     (off₂ = offsets + z_cold: the
              caller folds the cold forward correction into the offsets)
    scatter:  g₂ += Σ_k onehot_hi(ce_hi_k)ᵀ·onehot_lo + (ce_lo term)
              (ce = v_k·r split into two exact bf16 terms)
    r_out[t] = r  — written back so the caller's XLA cold side can compute
              the cold gradient without recomputing the forward pass.

The compact θ comes in PRE-GATHERED (w[hot_ids] — an A-sized gather, free
outside) with the dump slot (compact id A, where cold/padding entries point)
and block padding held at 0, so cold entries gather exactly 0 and their
scatter contributions land in discarded slots. Same math as
fixed_effect_value_and_grad_hybrid's hot side (the oracle in its tests);
reference context: fixed_effect_lr_lbfgs_model.py:214-392 (the sparse TF
graph this whole regime replaces).

r_out rides as [n//tile, tile] (one row per grid step) — a [N, 1] column
would pad 128x in TPU HBM tiling. The [T, 1] in-kernel residual column is
transposed to lanes with dim-0-contraction dots against a 128-identity
(Mosaic supports no vector transpose/relayout; see fe_block.py for the
other Mosaic notes: no lane slicing → iota compare+reduce, dim-0 dot
contraction is the supported transposed form).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdmix_tpu.ops.pallas.fe_block import LANE, _col, loss_residual


def _kernel(idx_ref, data_ref, th_hi_ref, th_lo_ref, b_ref,
            loss_ref, g2_ref, rsum_ref, r_ref, *,
            k: int, a_blocks: int, tile: int, linear: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        rsum_ref[0, 0] = jnp.float32(0.0)
        g2_ref[...] = jnp.zeros_like(g2_ref)

    idx = idx_ref[...]            # [T, K] int32 compact ids (dump = A slot)
    data = data_ref[...]          # [T, K+3] f32: values | y | w | off2
    th_hi = th_hi_ref[...]        # [A_b, 128] bf16 (θ rounded)
    th_lo = th_lo_ref[...]        # [A_b, 128] bf16 (θ − θ_hi: exact 2-term)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    gdims = (((1,), (0,)), ((), ()))
    sdims = (((0,), (0,)), ((), ()))

    # pass 1: gather z = Σ_k v_k · θc[idx_k]
    z = jnp.zeros((tile, 1), jnp.float32)
    for kk in range(k):
        idx_k = _col(idx, kk)                                   # [T, 1]
        hi_k = (idx_k // LANE == iota_a).astype(jnp.bfloat16)   # [T, A_b]
        lo_k = (idx_k % LANE == iota_l).astype(jnp.float32)     # [T, 128]
        G = (jax.lax.dot_general(hi_k, th_hi, gdims,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(hi_k, th_lo, gdims,
                                   preferred_element_type=jnp.float32))
        v_k = _col(data, kk)
        z = z + v_k * jnp.sum(G * lo_k, axis=1, keepdims=True)

    y = _col(data, k)
    w = _col(data, k + 1)
    off = _col(data, k + 2)
    z = z + off + b_ref[0, 0]
    per, dz = loss_residual(z, y, linear)
    r = w * dz                                                  # [T, 1]
    loss_ref[0, 0] += jnp.sum(w * per)
    rsum_ref[0, 0] += jnp.sum(r)

    # r [T, 1] → [1, T] on lanes: dim-0-contraction dots against identity,
    # 128 sublanes at a time (no vector transpose in Mosaic)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)) \
        .astype(jnp.float32)
    rows = []
    for c in range(tile // LANE):
        r_c = r[c * LANE:(c + 1) * LANE, :]                     # [128, 1]
        rows.append(jax.lax.dot_general(
            r_c, eye, sdims, preferred_element_type=jnp.float32))  # [1, 128]
    # the [8, T] output block covers 8 consecutive grid steps (a [1, T]
    # block would violate the 8-sublane tiling rule); each step writes its
    # own row
    r_ref[pl.ds(i % 8, 1), :] = jnp.concatenate(rows, axis=1)   # [1, T]

    # pass 2: scatter g2 += Σ_k onehot_hi(ce)ᵀ · onehot_lo, ce 2-term split
    g2 = jnp.zeros((a_blocks, LANE), jnp.float32)
    for kk in range(k):
        idx_k = _col(idx, kk)
        ce_k = _col(data, kk) * r                               # [T, 1] f32
        # two-term bf16 split of ce (Mosaic note: jnp.where with bf16
        # scalar literals fails verification — build in f32, cast after)
        ce_hi32 = ce_k.astype(jnp.bfloat16).astype(jnp.float32)
        cond = idx_k // LANE == iota_a
        hi_hi = jnp.where(cond, ce_hi32, 0.0).astype(jnp.bfloat16)  # [T, A_b]
        hi_lo = jnp.where(cond, ce_k - ce_hi32, 0.0).astype(jnp.bfloat16)
        lo_k = (idx_k % LANE == iota_l).astype(jnp.bfloat16)    # [T, 128]
        g2 = g2 + jax.lax.dot_general(
            hi_hi, lo_k, sdims, preferred_element_type=jnp.float32)
        g2 = g2 + jax.lax.dot_general(
            hi_lo, lo_k, sdims, preferred_element_type=jnp.float32)
    g2_ref[...] += g2


@functools.partial(jax.jit,
                   static_argnames=("hot", "linear", "tile", "interpret"))
def fe_hybrid_hot_pallas(theta_c, b, hot_idx, values, labels, weights,
                         offsets2, hot: int, linear: bool = False,
                         tile: int = 2048, interpret: bool = False):
    """Fused hot-side pass: (Σ weighted loss, g_hot[A], Σr, r[N]).

    theta_c: [A] compact hot coefficients (w[hot_ids]); b: scalar intercept
    (pass 0.0 when the model has none — rsum is then simply unused).
    hot_idx: [N, K] compact ids in [0, A] (A = dump slot; padding entries
    carry value 0 and are inert). offsets2 must already include the cold
    forward correction z_cold. Rows must be a multiple of `tile`
    (padding rows: weight 0)."""
    n0, k = hot_idx.shape
    assert n0 % tile == 0, (n0, tile)
    # the r output rides as [n//tile, tile] in 8-sublane blocks → the grid
    # must be a multiple of 8; pad inert rows (weight 0) up to 8·tile here
    n = ((n0 + 8 * tile - 1) // (8 * tile)) * (8 * tile)
    if n != n0:
        def _pad(a):
            return jnp.concatenate(
                [a, jnp.zeros((n - n0,) + a.shape[1:], a.dtype)], axis=0)
        hot_idx, values, labels, weights, offsets2 = map(
            _pad, (hot_idx, values, labels, weights, offsets2))
    a_blocks = (hot + 1 + LANE - 1) // LANE   # +1: the dump slot
    a_pad = a_blocks * LANE

    th = jnp.zeros((a_pad,), jnp.float32).at[:hot].set(
        theta_c.astype(jnp.float32)).reshape(a_blocks, LANE)
    th_hi = th.astype(jnp.bfloat16)
    th_lo = (th - th_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    data = jnp.concatenate(
        [values.astype(jnp.float32),
         labels.reshape(n, 1).astype(jnp.float32),
         weights.reshape(n, 1).astype(jnp.float32),
         offsets2.reshape(n, 1).astype(jnp.float32)], axis=1)   # [N, K+3]

    kernel = functools.partial(_kernel, k=k, a_blocks=a_blocks, tile=tile,
                               linear=linear)
    loss, g2, rsum, r_rows = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k + 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_blocks, LANE), lambda i: (0, 0),
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
            pl.BlockSpec((8, tile), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((a_blocks, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n // tile, tile), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hot_idx, data, th_hi, th_lo,
      jnp.asarray(b, jnp.float32)[None, None])
    return (loss[0, 0], g2.reshape(a_pad)[:hot], rsum[0, 0],
            r_rows.reshape(n)[:n0])
