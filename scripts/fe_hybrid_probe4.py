#!/usr/bin/env python
"""Probe 4: hot-set-size sweep at full N — the decisive wide-D config.

Probe 2/3 showed the real cost driver is the one-hot construction width
(e·A/128 VPU compares, identical on the XLA and pallas forms), so the lever
is a SMALLER hot set: block's measured cost is 0.13 s at A=10k vs 0.49 s at
32k (N=5M, K=16). This sweeps A ∈ {8k, 16k, 32k} for both hybrid forms vs
the scatter baseline on Zipf s ∈ {1.2, 1.0} ids at D=1M.

Usage: python scripts/fe_hybrid_probe4.py [quick]
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
                                    fixed_effect_value_and_grad_hybrid,
                                    fixed_effect_value_and_grad_hybrid_pallas)

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
        sm = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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
kw = dict(has_intercept=True, regularize_bias=True, l2_reg_weight=0.0,
          model_type="logistic_regression")

for s in (1.2, 1.0):
    batch = gen_zipf(s)

    @jax.jit
    def f_scatter(x, b):
        return fixed_effect_value_and_grad(x, b, D, **kw)
    t_sc = timeit(f"s={s} scatter", f_scatter, x0, batch)

    for a in (8_192, 16_384, 32_768):
        t0 = time.time()
        aux = build_hybrid_aux(batch.indices, batch.values, D,
                               hot_features=a, cold_max_frac=0.95)
        mc = aux.cold_idx.shape[0]
        print(f"s={s} A={a}: aux {time.time() - t0:.1f}s "
              f"mc_pad={mc} ({mc / (N * K):.1%})", flush=True)

        @jax.jit
        def f_hx(x, b, ax):
            return fixed_effect_value_and_grad_hybrid(
                x, b, ax, D, chunk=8192, has_intercept=True,
                precision=jax.lax.Precision.HIGH)
        t = timeit(f"s={s} xla-hybrid A={a}", f_hx, x0, batch, aux)

        @jax.jit
        def f_hp(x, b, ax):
            return fixed_effect_value_and_grad_hybrid_pallas(
                x, b, ax, D, has_intercept=True, tile=2048)
        t = timeit(f"s={s} pallas-hybrid A={a}", f_hp, x0, batch, aux)
print("done", flush=True)
