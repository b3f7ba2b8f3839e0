#!/usr/bin/env python
"""Probe 5: windowed cold scatters (pallas windowed_scatter) vs XLA cold.

Times the full hybrid funcall at D=1M, N=5M, K=16 with and without the
windowed cold layouts, on Zipf s ∈ {1.2, 1.0} ids (adaptive hot size).

Usage: python scripts/fe_hybrid_probe5.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gdmix_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gdmix_tpu.ops.logistic import (SparseBatch, build_hybrid_aux,
                                    extend_hybrid_aux_windowed,
                                    fixed_effect_value_and_grad,
                                    fixed_effect_value_and_grad_hybrid)

QUICK = "quick" in sys.argv[1:]
D = 1_000_000
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2
print(f"devices: {jax.devices()}  N={N} D={D}", file=sys.stderr, flush=True)


def gen_zipf(s: float):
    @jax.jit
    def g(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        u = jax.random.uniform(k1, (N, K), jnp.float32, 1e-7, 1.0)
        if s == 1.0:
            idx = jnp.exp(u * jnp.log(float(D)))
        else:
            a = 1.0 - s
            idx = (1.0 + u * (float(D) ** a - 1.0)) ** (1.0 / a)
        idx = jnp.clip(idx.astype(jnp.int32) - 1, 0, D - 1)
        return SparseBatch(
            idx, jax.random.normal(k2, (N, K), jnp.float32),
            0.1 * jax.random.normal(k4, (N,), jnp.float32),
            jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32),
            jnp.ones((N,), jnp.float32))
    b = g(jax.random.PRNGKey(0))
    float(jnp.sum(b.values))
    return b


def timeit(tag, fn, *args):
    try:
        out = fn(*args)
        sm = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        sm = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts):.4f}s reps={[round(t, 4) for t in ts]}"
          f" (sum={sm:.5e})", flush=True)
    return min(ts)


x0 = jnp.zeros((D + 1,), jnp.float32)
for s in (1.2, 1.0):
    batch = gen_zipf(s)
    aux = build_hybrid_aux(batch.indices, batch.values, D, hot_features=0,
                           cold_max_frac=0.95)
    a = aux.hot_ids.shape[0]
    mc = aux.cold_idx.shape[0]
    t0 = time.time()
    auxw = extend_hybrid_aux_windowed(aux, D, N)
    int(auxw.gs_win[-1])
    print(f"s={s}: adaptive A={a} mc_pad={mc} ({mc / (N * K):.1%}); "
          f"windowed layouts built in {time.time() - t0:.1f}s "
          f"(gs rows={auxw.gs_idxl.shape[0]}, zs rows={auxw.zs_rowl.shape[0]})",
          flush=True)

    @jax.jit
    def f_x(x, b, ax):
        return fixed_effect_value_and_grad_hybrid(
            x, b, ax, D, chunk=8192, has_intercept=True,
            precision=jax.lax.Precision.HIGH)
    t_plain = timeit(f"s={s} hybrid xla-cold", f_x, x0, batch, aux)
    t_win = timeit(f"s={s} hybrid windowed-cold", f_x, x0, batch, auxw)
    if t_plain and t_win:
        v0, g0 = f_x(x0, batch, aux)
        v1, g1 = f_x(x0, batch, auxw)
        print(f"    value reldiff={abs(float(v1) - float(v0)) / abs(float(v0)):.2e}"
              f" grad maxreldiff="
              f"{float(jnp.max(jnp.abs(g1 - g0)) / jnp.max(jnp.abs(g0))):.2e}"
              f"  speedup={t_plain / t_win:.2f}x", flush=True)
print("done", flush=True)
