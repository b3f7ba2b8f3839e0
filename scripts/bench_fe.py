#!/usr/bin/env python
"""FE gradient micro-bench on the real TPU: seconds per L-BFGS funcall.

Round-1 baselines at N=5M, D=10k, K=16 (PARITY.md): scatter 1.68s,
one-hot 1.03s, fused pallas 1.19s. Data is generated ON DEVICE (the relay
tunnel makes host->device of 640MB slow; the workload content doesn't matter
for timing). Sync = scalar fetch (block_until_ready lies on axon).

Usage: python scripts/bench_fe.py [mode ...]   (default: block onehot)
Env: FE_N, FE_D, FE_K, FE_REPS, FE_PREC, FE_CHUNK
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gdmix_tpu.ops.logistic import (SparseBatch,
                                    fixed_effect_value_and_grad,
                                    fixed_effect_value_and_grad_block,
                                    fixed_effect_value_and_grad_onehot,
                                    l2_value_and_grad)

N = int(os.environ.get("FE_N", 5_000_000))
N = (N // 8192) * 8192  # multiple of every chunk size used here
D = int(os.environ.get("FE_D", 10_000))
K = int(os.environ.get("FE_K", 16))
REPS = int(os.environ.get("FE_REPS", 8))
PREC = {"highest": jax.lax.Precision.HIGHEST,
        "float32": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}[
    os.environ.get("FE_PREC", "highest")]
CHUNK = int(os.environ.get("FE_CHUNK", 8192))


@jax.jit
def _gen(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    indices = jax.random.randint(k1, (N, K), 0, D, jnp.int32)
    values = jax.random.normal(k2, (N, K), jnp.float32)
    labels = jax.random.bernoulli(k3, 0.5, (N,)).astype(jnp.float32)
    offsets = 0.1 * jax.random.normal(k4, (N,), jnp.float32)
    weights = jnp.ones((N,), jnp.float32)
    return SparseBatch(indices, values, offsets, labels, weights)


def _mk_fun(mode, batch):
    # batch rides as a jit ARGUMENT: closed-over device arrays become baked-in
    # constants that the axon relay ships with the program (HTTP 413 at 640MB)
    def with_l2(core):
        @jax.jit
        def fun(x, b):
            v, g = core(x, b)
            lv, lg = l2_value_and_grad(x, 1.0, has_intercept=True,
                                       regularize_bias=False,
                                       intercept_at_end=True)
            return v + lv, g + lg
        return lambda x: fun(x, batch)
    if mode == "block":
        return with_l2(lambda x, b: fixed_effect_value_and_grad_block(
            x, b, D, chunk=CHUNK, precision=PREC))
    if mode == "block_bf16x2":
        return with_l2(lambda x, b: fixed_effect_value_and_grad_block(
            x, b, D, chunk=CHUNK, precision="bf16x2"))
    if mode == "onehot":
        oh_chunk = 2048  # dense [chunk, D] block ~80MB at D=10k (round-1 cfg)
        return with_l2(lambda x, b: fixed_effect_value_and_grad_onehot(
            x, b, D, chunk=oh_chunk))
    if mode == "scatter":
        return with_l2(lambda x, b: fixed_effect_value_and_grad(
            x, b, D, l2_reg_weight=0.0))
    if mode in ("flat", "flat_high"):
        from gdmix_tpu.ops.pallas.fe_flat import (auto_tile,
                                                  fe_loss_grad_flat_pallas)
        prec = "bf16x2" if mode == "flat" else "high"
        tile = auto_tile(D)
        return with_l2(lambda x, b: fe_loss_grad_flat_pallas(
            x, b.indices, b.values, b.labels, b.weights, b.offsets, D,
            tile=tile, precision_name=prec))
    raise SystemExit(f"unknown mode {mode}")


def main():
    modes = sys.argv[1:] or ["flat", "block", "onehot"]
    print(f"N={N} D={D} K={K} chunk={CHUNK} prec={os.environ.get('FE_PREC','highest')} "
          f"dev={jax.devices()[0]}", flush=True)
    batch = _gen(jax.random.PRNGKey(0))
    float(jnp.sum(batch.values))  # materialize
    for mode in modes:
        fun = _mk_fun(mode, batch)
        x = jnp.zeros((D + 1,), jnp.float32)
        t0 = time.time()
        v, g = fun(x)
        float(v)
        compile_s = time.time() - t0
        times = []
        for r in range(REPS):
            x = x - 1e-4 * g  # keep the chain honest (new input each call)
            t0 = time.time()
            v, g = fun(x)
            s = float(v) + float(jnp.sum(g))  # host fetch = sync
            times.append(time.time() - t0)
        print(f"{mode:8s} funcall min={min(times):.4f}s "
              f"median={sorted(times)[len(times)//2]:.4f}s "
              f"(compile+1st {compile_s:.1f}s, f={float(v):.1f})", flush=True)


if __name__ == "__main__":
    main()
