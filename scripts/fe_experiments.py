#!/usr/bin/env python
"""FE gradient strategy experiments on the real chip (VERDICT r2 item 4).

Times one (value, grad) funcall at N=5M, K=16 for:
  - block with lane in {128, 256, 512} at D in {10k, 100k}
  - sorted-COO take+segment_sum at D=10k (the entry-sorted scatter idea)

Usage: python scripts/fe_experiments.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gdmix_tpu  # noqa: F401  (restores JAX_PLATFORMS env authority)
import jax
import jax.numpy as jnp
import numpy as np

from gdmix_tpu.ops.logistic import (SparseBatch,
                                    fixed_effect_value_and_grad_block)

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
N = 499_712 if QUICK else 4_997_120
K = 16
REPS = 2 if QUICK else 4
print(f"devices: {jax.devices()}  N={N}", file=sys.stderr)


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


def timeit(tag, fun, x, *args):
    v, g = fun(x, *args)
    float(v)  # compile
    ts = []
    for i in range(REPS):
        x2 = x - (1e-5 * (i + 1)) * g
        t0 = time.time()
        v, g2 = fun(x2, *args)
        float(v), float(jnp.sum(g2))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts):.4f}s reps={[round(t,4) for t in ts]}")


for d in (10_000, 100_000):
    batch = gen(d)
    x0 = jnp.zeros((d + 1,), jnp.float32)
    for lane in (128, 256, 512):
        for prec in ("bf16x2", jax.lax.Precision.DEFAULT):
            @jax.jit
            def fun(x, b, lane=lane, d=d, prec=prec):
                return fixed_effect_value_and_grad_block(
                    x, b, d, chunk=8192, has_intercept=True, lane=lane,
                    precision=prec)
            timeit(f"block d={d} lane={lane} prec={prec}", fun, x0, batch)
    del batch

# sorted-COO: static feature-sorted permutation on device; take + segment_sum
d = 10_000
batch = gen(d)
x0 = jnp.zeros((d + 1,), jnp.float32)
flat_idx = np.asarray(batch.indices).reshape(-1)
order = np.argsort(flat_idx, kind="stable")
sidx = jnp.asarray(flat_idx[order])
srow = jnp.asarray((np.arange(N * K) // K)[order].astype(np.int32))
sval = jnp.asarray(np.asarray(batch.values).reshape(-1)[order])


@jax.jit
def fun_sorted(x, b, sidx, srow, sval):
    w, bias = x[:-1], x[-1]
    gathered = jnp.take(w, b.indices, axis=0)
    z = jnp.sum(gathered * b.values, axis=-1) + b.offsets + bias
    per = (jnp.maximum(z, 0) - z * b.labels
           + jnp.log1p(jnp.exp(-jnp.abs(z))))
    dz = jax.nn.sigmoid(z) - b.labels
    r = b.weights * dz
    contrib = sval * r[srow]
    gw = jax.ops.segment_sum(contrib, sidx, num_segments=d,
                             indices_are_sorted=True)
    return jnp.sum(b.weights * per), jnp.concatenate([gw, jnp.sum(r)[None]])


timeit(f"sorted-coo d={d}", fun_sorted, x0, batch, sidx, srow, sval)
print("done")
