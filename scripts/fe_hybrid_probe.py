#!/usr/bin/env python
"""Component probe for the wide-D FE hybrid design (VERDICT r4 task 1).

Decomposes the D=1M funcall into its candidate pieces on the real chip:
  - scatter value+grad (the current wide-D auto path, baseline ~1.31 s)
  - forward-only (take-gather z)  — how much of the funcall is the gather?
  - grad-only scatter              — how much is the scatter?
  - flat scatter at Mc entries     — the cold-side cost model (Mc = frac*N*K)
  - z_cold row-scatter at Mc       — the cold forward correction cost
  - block at A in {32k..262k}      — the hot-side cost model (compact space)

Usage: python scripts/fe_hybrid_probe.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gdmix_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gdmix_tpu.ops.logistic import (SparseBatch, fixed_effect_value_and_grad,
                                    fixed_effect_value_and_grad_block)

QUICK = "quick" in sys.argv[1:]
D = 1_000_000
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2
print(f"devices: {jax.devices()}  N={N} D={D}", file=sys.stderr, flush=True)


@jax.jit
def gen(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return SparseBatch(
        jax.random.randint(k1, (N, K), 0, D, jnp.int32),
        jax.random.normal(k2, (N, K), jnp.float32),
        0.1 * jax.random.normal(k4, (N,), jnp.float32),
        jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32),
        jnp.ones((N,), jnp.float32))


batch = gen(jax.random.PRNGKey(0))
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
        return
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        s = sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts):.4f}s reps={[round(t, 4) for t in ts]}"
          f" (sum={s:.3e})", flush=True)


# 1. current scatter path (value+grad)
@jax.jit
def f_scatter(x, b):
    return fixed_effect_value_and_grad(x, b, D, **kw)
timeit("scatter value+grad", f_scatter, x0, batch)

# 2. forward-only
@jax.jit
def f_fwd(x, b):
    w, bias = x[:-1], x[-1]
    z = jnp.sum(jnp.take(w, b.indices, axis=0) * b.values, axis=-1) \
        + b.offsets + bias
    return jnp.sum(b.weights * z)
timeit("forward-only take", f_fwd, x0, batch)

# 3. grad-only scatter (fixed residual)
r = jnp.ones((N,), jnp.float32)
@jax.jit
def f_grad(b, rr):
    contrib = b.values * rr[:, None]
    return jnp.zeros((D,), jnp.float32).at[b.indices.reshape(-1)] \
        .add(contrib.reshape(-1))
timeit("grad-only scatter 80M entries", f_grad, batch, r)

# 4. flat scatter at Mc entries (cold-side cost model)
for frac in (0.05, 0.1, 0.2):
    mc = int(N * K * frac) // 1024 * 1024
    ci = batch.indices.reshape(-1)[:mc]
    cv = batch.values.reshape(-1)[:mc]
    cr = (jnp.arange(mc, dtype=jnp.int32) * 7919) % N
    @jax.jit
    def f_cold(ci_, cv_, cr_, rr):
        return jnp.zeros((D,), jnp.float32).at[ci_].add(cv_ * rr[cr_])
    timeit(f"cold grad scatter Mc={mc} ({frac:.0%})", f_cold, ci, cv, cr, r)

    @jax.jit
    def f_zcold(ci_, cv_, cr_, x):
        return jnp.zeros((N,), jnp.float32).at[cr_].add(x[:-1][ci_] * cv_)
    timeit(f"z_cold row scatter Mc={mc} ({frac:.0%})", f_zcold, ci, cv, cr, x0)

# 5. block at compact A over the same entries (hot-side cost model)
for a in ((32_768, 131_072) if QUICK else (32_768, 65_536, 131_072, 262_144)):
    bb = SparseBatch(batch.indices % a, batch.values, batch.offsets,
                     batch.labels, batch.weights)
    xa = jnp.zeros((a + 1,), jnp.float32)
    @jax.jit
    def f_block(x, b, a=a):
        return fixed_effect_value_and_grad_block(
            x, b, a, chunk=8192, has_intercept=True,
            model_type="logistic_regression",
            precision=jax.lax.Precision.HIGH)
    timeit(f"block A={a}", f_block, xa, bb)

print("done", flush=True)
