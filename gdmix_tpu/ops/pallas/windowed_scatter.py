"""Pallas TPU kernel: windowed scatter-add over a PRE-SORTED entry stream.

XLA's scatter-add walks entries at ~7 ns each (serialized, table-size
independent — scripts/fe_hybrid_probe*.py), which is the hybrid cold side's
dominant term after the hot majority moved onto the MXU. When the entries
are SORTED by target index (a static, once-per-fit layout), each tile of
entries lands inside one aligned WINDOW of the output, and the scatter
becomes the familiar two-level one-hot matmul — against a [W/128, 128]
window block instead of the full table. The window id per tile rides as a
prefetched scalar; pallas fetches/retires output blocks as the (sorted,
therefore non-decreasing) window sequence advances, and the first tile of
each window zero-initializes it. Builders must emit at least one (possibly
all-padding) tile for EVERY window — unvisited output blocks would be
uninitialized garbage.

Entries arrive as [rows, 16] tiles (16 entries per sublane row, the
fe_block layout — a [M, 1] column would pad 128x in TPU HBM tiling);
padding entries carry contrib 0 and local index 0, making them inert.

Used by the wide-D hybrid's cold side for BOTH scatters: the gradient
(entries sorted by feature id) and the z_cold row accumulation (cold
entries are row-major by construction — already sorted). The random
GATHER halves (w[idx], r[row]) stay on XLA: the two scatters need opposite
sort orders, and bridging them would itself be a per-entry permutation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdmix_tpu.ops.pallas.fe_block import LANE, _col

KPACK = 16          # entries per sublane row


def _kernel(win_ref, idx_ref, ce_ref, out_ref, *, tile_rows: int,
            w_blocks: int):
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[...]            # [T, 16] int32 window-LOCAL indices
    ce = ce_ref[...]              # [T, 16] f32 contributions (padding: 0)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w_blocks), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANE), 1)
    g = jnp.zeros((w_blocks, LANE), jnp.float32)
    sdims = (((0,), (0,)), ((), ()))
    for kk in range(KPACK):
        idx_k = _col(idx, kk)                              # [T, 1]
        ce_k = _col(ce, kk)                                # [T, 1]
        hi_ce = jnp.where(idx_k // LANE == iota_a, ce_k, 0.0)  # [T, Wb] f32
        lo_k = (idx_k % LANE == iota_l).astype(jnp.float32)    # [T, 128]
        g = g + jax.lax.dot_general(hi_ce, lo_k, sdims,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
    out_ref[...] += g


@functools.partial(jax.jit, static_argnames=("num_windows", "window",
                                             "tile_rows", "interpret"))
def windowed_scatter_add_pallas(idx_local, contrib, win_of_tile,
                                num_windows: int, window: int = 4096,
                                tile_rows: int = 512,
                                interpret: bool = False):
    """Σ-scatter `contrib` at window-LOCAL positions `idx_local` into a
    [num_windows * window] table.

    idx_local/contrib: [M/16, 16] (entries packed 16 per sublane row, in
    tile order); win_of_tile: [n_tiles] int32 NON-DECREASING window id per
    tile of `tile_rows` rows, covering EVERY window in [0, num_windows)
    at least once (pad with zero-contrib tiles). Returns the flat table.
    """
    rows, k = idx_local.shape
    assert k == KPACK, k
    assert rows % tile_rows == 0, (rows, tile_rows)
    assert window % (8 * LANE) == 0, window  # 8-sublane blocks
    w_blocks = window // LANE
    n_tiles = rows // tile_rows
    assert win_of_tile.shape == (n_tiles,)

    kernel = functools.partial(_kernel, tile_rows=tile_rows,
                               w_blocks=w_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, KPACK), lambda i, win: (i, 0)),
            pl.BlockSpec((tile_rows, KPACK), lambda i, win: (i, 0)),
        ],
        out_specs=pl.BlockSpec((w_blocks, LANE),
                               lambda i, win: (win[i], 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * w_blocks, LANE),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(win_of_tile.astype(jnp.int32), idx_local.astype(jnp.int32),
      contrib.astype(jnp.float32))
    return out.reshape(num_windows * window)
