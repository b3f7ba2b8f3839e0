"""Randomized differential test over the RE solver ladder: every batch_solver
(newton, newton_dual, lbfgs — plus dense-X L-BFGS via the size knobs) must
produce the SAME models on the same randomized workloads, and match the
scipy per-entity oracle. Individual solvers have their own oracle tests; this
sweep checks the ladder's interaction surface (bucketing × warm start ×
offsets × weights × uneven supports) across seeds in one go."""
import os

import numpy as np
import pytest

from gdmix_tpu.io.input_pipeline import EntityGroup
from tests.test_random_effect_lr import _scipy_entity_oracle


def _random_groups(rng, num_entities, d, max_nnz=5, count_hi=24):
    counts = rng.randint(2, count_hi + 1, size=num_entities)
    groups, truth = [], {}
    uid = 0
    for e in range(num_entities):
        n = int(counts[e])
        idx = rng.randint(0, d, size=(n, max_nnz)).astype(np.int32)
        nnz = rng.randint(1, max_nnz + 1, size=n).astype(np.int32)
        val = rng.randn(n, max_nnz)
        val *= np.arange(max_nnz)[None, :] < nnz[:, None]
        y = (rng.rand(n) < 0.5).astype(np.float64)
        # both classes present: the intercept is NOT regularized
        # (regularize_bias=False), so a one-class entity's MLE intercept is
        # ±∞ and solvers would legitimately stop at different magnitudes
        y[0], y[1] = 0.0, 1.0
        off = 0.2 * rng.randn(n)
        w = rng.choice([0.5, 1.0, 2.0], size=n)
        groups.append(EntityGroup(
            entity_id=f"e{e}",
            columns={"uid": np.arange(uid, uid + n, dtype=np.int64),
                     "response": y, "offset": off, "weight": w},
            padded_indices=idx, padded_values=val, rec_nnz=nnz))
        X = np.zeros((n, d))
        # duplicate feature ids within a record ACCUMULATE in a sparse dot
        np.add.at(X, (np.repeat(np.arange(n), max_nnz), idx.ravel()),
                  val.ravel())
        truth[f"e{e}"] = (X, y, off, w)
        uid += n
    return groups, truth


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_solver_ladder_agrees_with_itself_and_scipy(tmp_path, seed):
    rng = np.random.RandomState(seed)
    d = 12
    groups, truth = _random_groups(rng, num_entities=40, d=d)
    # build one model per solver; fit the SAME groups in memory
    import json
    md_file = str(tmp_path / "tensor_metadata.json")
    with open(md_file, "w") as f:
        json.dump({"features": [
            {"name": "per_entity", "dtype": "float", "shape": [d],
             "isSparse": True},
            {"name": "user_id", "dtype": "string", "shape": [],
             "isSparse": False},
            {"name": "uid", "dtype": "long", "shape": [], "isSparse": False},
            {"name": "weight", "dtype": "float", "shape": [],
             "isSparse": False},
            {"name": "offset", "dtype": "float", "shape": [],
             "isSparse": False}],
            "labels": [{"name": "response", "dtype": "float", "shape": [],
                        "isSparse": False}]}, f)
    results = {}
    lam = 0.6
    for solver, extra in (
            ("newton", {}),
            ("newton_dual", {}),
            ("lbfgs", {}),                                    # sparse vmapped
            ("lbfgs", {"dense_lbfgs_max_elems": 10**9})):     # dense-X path
        from gdmix_tpu.params import Params, REParams
        from gdmix_tpu.models.random_effect_lr import RandomEffectLRModel
        model_params = REParams(
            metadata_file=md_file, output_model_dir=str(tmp_path),
            feature_bag="per_entity", feature_file=None,
            partition_entity="user_id", l2_reg_weight=lam,
            regularize_bias=False, dtype="float64",
            lbfgs_tolerance=1e-14, lbfgs_pgtol=1e-10,
            num_of_lbfgs_iterations=500, sparsity_threshold=0.0,
            batch_solver=solver, **extra)
        base_params = Params(
            action="train", stage="random_effect",
            model_type="logistic_regression", label_column_name="response",
            uid_column_name="uid", weight_column_name="weight",
            prediction_score_column_name="predictionScore")
        model = RandomEffectLRModel(model_params, base_params)
        out = model.fit_groups(groups, {}, base_params)
        key = solver if not extra else "lbfgs_dense"
        results[key] = {eid: out[eid] for eid in out}

    names = list(results)
    # every solver agrees with every other solver
    for eid in results[names[0]]:
        thetas = [results[nm][eid].theta for nm in names]
        for t in thetas[1:]:
            np.testing.assert_allclose(t, thetas[0], atol=5e-5,
                                       err_msg=f"{eid} across {names}")
        sups = [results[nm][eid].unique_global_indices for nm in names]
        for s in sups[1:]:
            np.testing.assert_array_equal(s, sups[0])

    # spot-check a third of the entities against the scipy oracle
    eids = sorted(truth)[::3]
    ref = results["newton"]
    for eid in eids:
        X, y, off, w = truth[eid]
        support = ref[eid].unique_global_indices
        oracle = _scipy_entity_oracle(X, y, off, w, lam, support)
        np.testing.assert_allclose(ref[eid].theta, oracle, atol=1e-5,
                                   err_msg=eid)
