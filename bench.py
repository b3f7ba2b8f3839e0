#!/usr/bin/env python
"""Benchmark: random-effect models trained per second per chip.

This is the BASELINE.json headline metric ("random-effect models trained/sec/chip
on movieLens; AUC parity"), with the driver-set target of ≥1M models/min/chip
(16,667 models/sec). The workload is a movieLens-per-user-shaped fleet of
independent per-entity logistic regressions (long-tail sample counts, sparse
movie-feature bags), solved by the bucketed vmapped on-device L-BFGS
(gdmix_tpu/models/random_effect_lr.py path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from gdmix_tpu.data.bucketing import bucketize
from gdmix_tpu.io.input_pipeline import EntityGroup
from gdmix_tpu.ops.lbfgs import lbfgs
from gdmix_tpu.ops.logistic import SparseBatch, per_entity_value_and_grad
from gdmix_tpu.ops.newton import densify_bucket, newton_lr_batch

TARGET_MODELS_PER_SEC = 1_000_000 / 60.0   # ≥1M models/min/chip

NUM_ENTITIES = int(os.environ.get("BENCH_ENTITIES", 100_000))
D = 24          # movieLens per-user feature-space width (movie features)
MAX_NNZ = 4     # nnz per record (genres + release date)


class _Schema:
    uid_column_name = "uid"
    label_column_name = "response"
    weight_column_name = None
    prediction_score_column_name = "predictionScore"
    prediction_score_per_coordinate_column_name = "predictionScorePerCoordinate"


def make_workload(num_entities: int, seed: int = 0):
    """Long-tail per-entity datasets (Zipf-ish sample counts, 2..64)."""
    rng = np.random.RandomState(seed)
    counts = np.clip((rng.pareto(1.5, num_entities) * 8 + 2).astype(int), 2, 64)
    groups = []
    uid = 0
    for e in range(num_entities):
        n = int(counts[e])
        k = rng.randint(1, MAX_NNZ + 1)
        idx = rng.randint(0, D, size=(n, k))
        val = rng.randn(n, k)
        w_true = rng.randn()
        y = (rng.rand(n) < 1 / (1 + np.exp(-(val.sum(1) * 0.5 + w_true)))
             ).astype(np.float64)
        groups.append(EntityGroup(
            entity_id=str(e),
            columns={"uid": np.arange(uid, uid + n, dtype=np.int64),
                     "response": y,
                     "offset": 0.1 * rng.randn(n),
                     },
            ragged_indices=[idx[i] for i in range(n)],
            ragged_values=[val[i] for i in range(n)]))
        uid += n
    return groups


SOLVER = os.environ.get("BENCH_SOLVER", "newton")


def solve_bucket_fn(u_cap, m, maxiter):
    @jax.jit
    def solve_newton(theta0, indices, values, offsets, labels, weights, counts):
        X = densify_bucket(indices, values, u_cap, has_intercept=True)
        res = newton_lr_batch(
            theta0, X, labels, weights, offsets, counts, l2_reg_weight=1.0,
            l2_mask=jnp.ones(u_cap + 1, X.dtype).at[0].set(0.0),
            maxiter=maxiter, ftol=1e-12, pgtol=1e-5)
        # scalar checksum: fetching it to host is the only reliable sync point
        # on relay-backed devices (block_until_ready returns early there)
        return res.theta, res.converged, jnp.sum(res.theta) + jnp.sum(res.converged)

    @jax.jit
    def solve_lbfgs(theta0, indices, values, offsets, labels, weights, counts):
        def one(t0, idx, val, off, lab, wt, cnt):
            batch = SparseBatch(idx, val, off, lab, wt)
            fun = lambda th: per_entity_value_and_grad(
                th, batch, u_cap, has_intercept=True, regularize_bias=False,
                l2_reg_weight=1.0, sample_count=cnt)
            res = lbfgs(fun, t0, m=m, ftol=1e-12, pgtol=1e-5, maxiter=maxiter)
            return res.x, res.converged
        x, conv = jax.vmap(one)(theta0, indices, values, offsets, labels,
                                weights, counts)
        return x, conv, jnp.sum(x) + jnp.sum(conv)

    return solve_newton if SOLVER == "newton" else solve_lbfgs


def main():
    t_setup = time.time()
    groups = make_workload(NUM_ENTITIES)
    buckets = bucketize(groups, _Schema, "offset", has_intercept=True,
                        batch_align=256)
    setup_s = time.time() - t_setup

    dt = jnp.float32
    solvers = {}
    device_buckets = []
    for b in buckets:
        key = (b.n_cap, b.u_cap)
        if key not in solvers:
            solvers[key] = solve_bucket_fn(b.u_cap, m=10, maxiter=100)
        device_buckets.append((solvers[key], (
            jnp.asarray(b.theta0, dt), jnp.asarray(b.indices),
            jnp.asarray(b.values, dt), jnp.asarray(b.offsets, dt),
            jnp.asarray(b.labels, dt), jnp.asarray(b.weights, dt),
            jnp.asarray(b.sample_count, dt))))

    # Warm up (compile every bucket shape) and force completion via host fetch.
    for solve, args in device_buckets:
        _, _, csum = solve(*args)
        float(csum)

    # Timed reps: perturb the warm start each rep so no layer can reuse results;
    # fetching each checksum to host is the sync.
    reps = int(os.environ.get("BENCH_REPS", 3))
    t0 = time.time()
    results = None
    for rep in range(reps):
        eps = jnp.asarray(1e-6 * (rep + 1), dt)
        results = [solve(args[0] + eps, *args[1:]) for solve, args in device_buckets]
        for _, _, csum in results:
            float(csum)
    elapsed = (time.time() - t0) / reps

    n_models = sum(len(b.entity_ids) for b in buckets)
    converged = float(np.mean([np.asarray(c)[:len(b.entity_ids)].mean()
                               for (x, c, s), b in zip(results, buckets)]))
    models_per_sec = n_models / elapsed

    sys.stderr.write(
        f"bench: {n_models} models in {elapsed:.3f}s on {jax.devices()[0]} "
        f"({len(buckets)} buckets, setup {setup_s:.1f}s, "
        f"converged {converged:.3f})\n")
    print(json.dumps({
        "metric": "random_effect_models_per_sec_per_chip",
        "value": round(models_per_sec, 1),
        "unit": "models/sec",
        "vs_baseline": round(models_per_sec / TARGET_MODELS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
