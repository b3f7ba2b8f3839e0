#!/usr/bin/env python
"""Probe 2: compact-table gather/scatter + the real hybrid op on Zipf data.

Questions (continuing scripts/fe_hybrid_probe.py):
  - is jnp.take / scatter-add cost TABLE-SIZE dependent? (take/scatter at
    A=32k vs the 0.73 s / 0.58 s measured at D=1M)
  - block precision ladder at compact A (HIGH was probed; DEFAULT/bf16x2?)
  - the full fixed_effect_value_and_grad_hybrid on Zipf(1.0) ids at D=1M:
    wall + value equality vs the scatter path.
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
                                    fixed_effect_value_and_grad_block,
                                    fixed_effect_value_and_grad_hybrid)

QUICK = "quick" in sys.argv[1:]
D = 1_000_000
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2
print(f"devices: {jax.devices()}  N={N} D={D}", file=sys.stderr, flush=True)


@jax.jit
def gen_zipf(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.uniform(k1, (N, K), jnp.float32, 1e-7, 1.0)
    # inverse-CDF Zipf(s=1): p(i) ~ 1/i over [1, D]
    idx = jnp.clip(jnp.exp(u * jnp.log(float(D))).astype(jnp.int32) - 1, 0,
                   D - 1)
    return SparseBatch(
        idx,
        jax.random.normal(k2, (N, K), jnp.float32),
        0.1 * jax.random.normal(k4, (N,), jnp.float32),
        jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32),
        jnp.ones((N,), jnp.float32))


batch = gen_zipf(jax.random.PRNGKey(0))
float(jnp.sum(batch.values))
x0 = jnp.zeros((D + 1,), jnp.float32)
kw = dict(has_intercept=True, regularize_bias=True, l2_reg_weight=0.0,
          model_type="logistic_regression")


def timeit(tag, fn, *args):
    try:
        out = fn(*args)
        s = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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


r = jnp.ones((N,), jnp.float32)
for a in (32_768, 131_072):
    idx_c = batch.indices % a
    wc = jnp.zeros((a,), jnp.float32)

    @jax.jit
    def f_take(w, ic, b):
        return jnp.sum(jnp.sum(jnp.take(w, ic, axis=0) * b.values, axis=-1))
    timeit(f"take compact A={a}", f_take, wc, idx_c, batch)

    @jax.jit
    def f_scat(ic, b, rr, a=a):
        contrib = b.values * rr[:, None]
        return jnp.zeros((a,), jnp.float32).at[ic.reshape(-1)] \
            .add(contrib.reshape(-1))
    timeit(f"scatter compact A={a}", f_scat, idx_c, batch, r)

    bb = SparseBatch(idx_c, batch.values, batch.offsets, batch.labels,
                     batch.weights)
    xa = jnp.zeros((a + 1,), jnp.float32)
    for pname, prec in (("DEFAULT", jax.lax.Precision.DEFAULT),
                        ("bf16x2", "bf16x2")):
        @jax.jit
        def f_block(x, b, a=a, prec=prec):
            return fixed_effect_value_and_grad_block(
                x, b, a, chunk=8192, has_intercept=True, precision=prec)
        timeit(f"block A={a} {pname}", f_block, xa, bb)

# --- the real hybrid op on the Zipf batch
t0 = time.time()
aux = build_hybrid_aux(batch.indices, batch.values, D,
                       hot_features=131_072, cold_max_frac=0.9)
cov = None
if aux is not None:
    jax.block_until_ready(aux.cold_idx)
print(f"aux build (cold): {time.time() - t0:.2f}s  "
      f"mc_pad={aux.cold_idx.shape[0] if aux is not None else None}",
      flush=True)

# scatter reference value for equality
@jax.jit
def f_scatter(x, b):
    return fixed_effect_value_and_grad(x, b, D, **kw)
v0, g0 = f_scatter(x0, batch)
t_sc = timeit("scatter value+grad (zipf)", f_scatter, x0, batch)

for a in (32_768, 131_072):
    t0 = time.time()
    aux = build_hybrid_aux(batch.indices, batch.values, D, hot_features=a,
                           cold_max_frac=0.9)
    mc = aux.cold_idx.shape[0]
    print(f"A={a}: aux warm build {time.time() - t0:.2f}s mc_pad={mc} "
          f"({mc / (N * K):.1%})", flush=True)
    for pname, prec in (("HIGH", jax.lax.Precision.HIGH),
                        ("bf16x2", "bf16x2")):
        @jax.jit
        def f_hy(x, b, ax, prec=prec):
            return fixed_effect_value_and_grad_hybrid(
                x, b, ax, D, chunk=8192, has_intercept=True, precision=prec)
        t = timeit(f"hybrid A={a} {pname}", f_hy, x0, batch, aux)
        if t is not None:
            v1, g1 = f_hy(x0, batch, aux)
            dv = abs(float(v1) - float(v0)) / abs(float(v0))
            dg = float(jnp.max(jnp.abs(g1 - g0)) / jnp.max(jnp.abs(g0)))
            print(f"    value reldiff={dv:.2e} grad maxreldiff={dg:.2e}",
                  flush=True)

print("done", flush=True)
