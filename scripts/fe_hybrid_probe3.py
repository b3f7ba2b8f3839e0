#!/usr/bin/env python
"""Probe 3: the fused pallas hybrid (hot MXU kernel + XLA cold) on real TPU.

Times fixed_effect_value_and_grad_hybrid_pallas at D=1M, N=5M, K=16 on
Zipf(s) ids for s in {1.0, 1.2}, A in {32k, 131k}, vs the scatter baseline.

Usage: python scripts/fe_hybrid_probe3.py [quick] [s ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gdmix_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gdmix_tpu.ops.logistic import (SparseBatch, build_hybrid_aux,
                                    fixed_effect_value_and_grad,
                                    fixed_effect_value_and_grad_hybrid_pallas)

args = sys.argv[1:]
QUICK = "quick" in args
SS = [float(a) for a in args if a != "quick"] or [1.0, 1.2]
D = 1_000_000
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2
print(f"devices: {jax.devices()}  N={N} D={D} s={SS}", file=sys.stderr,
      flush=True)


def gen_zipf(s: float):
    @jax.jit
    def g(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        u = jax.random.uniform(k1, (N, K), jnp.float32, 1e-7, 1.0)
        if s == 1.0:
            idx = jnp.exp(u * jnp.log(float(D)))
        else:
            # inverse-CDF of p(i) ~ i^-s on [1, D]
            a = 1.0 - s
            idx = (1.0 + u * (float(D) ** a - 1.0)) ** (1.0 / a)
        idx = jnp.clip(idx.astype(jnp.int32) - 1, 0, D - 1)
        return SparseBatch(
            idx,
            jax.random.normal(k2, (N, K), jnp.float32),
            0.1 * jax.random.normal(k4, (N,), jnp.float32),
            jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32),
            jnp.ones((N,), jnp.float32))
    b = g(jax.random.PRNGKey(0))
    float(jnp.sum(b.values))
    return b


def timeit(tag, fn, *args):
    try:
        out = fn(*args)
        s = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        s = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts):.4f}s reps={[round(t, 4) for t in ts]}"
          f" (sum={s:.5e})", flush=True)
    return min(ts)


x0 = jnp.zeros((D + 1,), jnp.float32)
kw = dict(has_intercept=True, regularize_bias=True, l2_reg_weight=0.0,
          model_type="logistic_regression")

for s in SS:
    batch = gen_zipf(s)

    @jax.jit
    def f_scatter(x, b):
        return fixed_effect_value_and_grad(x, b, D, **kw)
    v0, g0 = f_scatter(x0, batch)
    timeit(f"s={s} scatter", f_scatter, x0, batch)

    for a in (32_768, 131_072):
        t0 = time.time()
        aux = build_hybrid_aux(batch.indices, batch.values, D,
                               hot_features=a, cold_max_frac=0.95)
        mc = aux.cold_idx.shape[0]
        print(f"s={s} A={a}: aux {time.time() - t0:.1f}s "
              f"mc_pad={mc} ({mc / (N * K):.1%})", flush=True)

        @jax.jit
        def f_hp(x, b, ax):
            return fixed_effect_value_and_grad_hybrid_pallas(
                x, b, ax, D, has_intercept=True, tile=2048)
        t = timeit(f"s={s} pallas-hybrid A={a}", f_hp, x0, batch, aux)
        if t is not None:
            v1, g1 = f_hp(x0, batch, aux)
            dv = abs(float(v1) - float(v0)) / abs(float(v0))
            dg = float(jnp.max(jnp.abs(g1 - g0)) / jnp.max(jnp.abs(g0)))
            print(f"    value reldiff={dv:.2e} grad maxreldiff={dg:.2e}",
                  flush=True)
print("done", flush=True)
