#!/usr/bin/env python
"""FE gradient strategies in the wide-D regime (VERDICT r3 task 4).

Times one (value, grad) funcall at N=5M K=16 for block / scatter / segment
at D in {100k, 1M, 10M} on the real chip, to pin the auto crossover in
effective_grad_mode. The segment strategy's sort is timed separately (it
runs once per solve, amortized over every L-BFGS iteration).

Usage: python scripts/fe_wide_d.py [quick] [D ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gdmix_tpu  # noqa: F401  (restores JAX_PLATFORMS env authority)
import jax
import jax.numpy as jnp
import numpy as np

from gdmix_tpu.ops.logistic import (SortedCoo, SparseBatch,
                                    fixed_effect_value_and_grad,
                                    fixed_effect_value_and_grad_block)

args = [a for a in sys.argv[1:]]
QUICK = "quick" in args
DS = [int(a) for a in args if a != "quick"] or [100_000, 1_000_000, 10_000_000]
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2 if QUICK else 3
print(f"devices: {jax.devices()}  N={N} Ds={DS}", file=sys.stderr)


def gen(d):
    @jax.jit
    def g(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return SparseBatch(
            jax.random.randint(k1, (N, K), 0, d, jnp.int32),
            jax.random.normal(k2, (N, K), jnp.float32),
            0.1 * jax.random.normal(k4, (N,), jnp.float32),
            jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32),
            jnp.ones((N,), jnp.float32))
    b = g(jax.random.PRNGKey(0))
    float(jnp.sum(b.values))
    return b


def timeit(tag, fun, x, *a):
    try:
        v, g = fun(x, *a)
        float(v)  # compile + first run
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    ts = []
    for i in range(REPS):
        x2 = x - (1e-5 * (i + 1)) * g
        t0 = time.time()
        v, g2 = fun(x2, *a)
        float(v), float(jnp.sum(g2))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts):.4f}s reps={[round(t, 4) for t in ts]}",
          flush=True)


for d in DS:
    batch = gen(d)
    x0 = jnp.zeros((d + 1,), jnp.float32)
    kw = dict(has_intercept=True, regularize_bias=True, l2_reg_weight=0.0,
              model_type="logistic_regression")

    # --- segment: sort once (timed), then take+segment_sum per funcall
    @jax.jit
    def make_coo(b):
        flat_idx = b.indices.reshape(-1).astype(jnp.int32)
        order = jnp.argsort(flat_idx, stable=True)
        return SortedCoo(
            idx=flat_idx[order],
            row=(jnp.arange(N * K, dtype=jnp.int32) // K)[order],
            val=b.values.reshape(-1)[order])

    t0 = time.time()
    coo = make_coo(batch)
    float(jnp.sum(coo.val))
    t_sort_cold = time.time() - t0
    t0 = time.time()
    coo = make_coo(batch)
    float(jnp.sum(coo.val))
    print(f"segment-sort d={d}: warm={time.time() - t0:.4f}s "
          f"(cold {t_sort_cold:.1f}s)", flush=True)

    @jax.jit
    def fun_seg(x, b, coo, d=d):
        return fixed_effect_value_and_grad(x, b, d, sorted_coo=coo, **kw)
    timeit(f"segment d={d}", fun_seg, x0, batch, coo)
    del coo

    # --- scatter
    @jax.jit
    def fun_scatter(x, b, d=d):
        return fixed_effect_value_and_grad(x, b, d, **kw)
    timeit(f"scatter d={d}", fun_scatter, x0, batch)

    # --- block (production config: lane 128, float32 two-level one-hot)
    if d <= 1_000_000:  # O(D): 10M would be ~10x the 1M time; skip
        @jax.jit
        def fun_block(x, b, d=d):
            return fixed_effect_value_and_grad_block(
                x, b, d, chunk=8192, has_intercept=True,
                precision=jax.lax.Precision.DEFAULT)
        timeit(f"block d={d}", fun_block, x0, batch)
    del batch
print("done")
