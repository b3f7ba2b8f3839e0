"""Coefficient-variance oracle INDEPENDENT of the XᵀDX formula: the Hessian is
derived by central finite differences of the actual loss (f64, small d), the
role statsmodels GLM played in the reference's tests
(test/models/custom/test_optimizer_helper.py:1-40 — statsmodels is absent in
this image). Both effects, SIMPLE and FULL modes.

Conventions under test (reference binary_logistic_regression.py:144-189,
fixed_effect_lr_lbfgs_model.py:442-463): H is the UN-normalized data Hessian;
λ(+ε) is added to the diagonal with the intercept's λ removed when
regularize_bias=False; SIMPLE = 1/diag(H), FULL = diag(H⁻¹).
"""
import os

import numpy as np
import pytest
from scipy.special import expit

from gdmix_tpu import constants

EPS_REG = 1.0e-12  # the models' _EPSILON


def fd_hessian(f, x, eps=1e-5):
    d = len(x)
    H = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            ei = np.zeros(d); ei[i] = eps
            ej = np.zeros(d); ej[j] = eps
            v = (f(x + ei + ej) - f(x + ei - ej)
                 - f(x - ei + ej) + f(x - ei - ej)) / (4 * eps * eps)
            H[i, j] = H[j, i] = v
    return H


def _bce_data_loss(X1, y, w, off):
    """Un-normalized weighted BCE data loss on a dense design matrix."""
    def f(theta):
        z = X1 @ theta + off
        per = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
        return float(np.sum(w * per))
    return f


def _expected_variance(H_data, lam, mode, intercept_pos, regularize_bias):
    d = H_data.shape[0]
    if mode == constants.SIMPLE:
        hd = np.diagonal(H_data).copy() + lam
        if not regularize_bias:
            hd[intercept_pos] -= lam
        return 1.0 / (hd + EPS_REG)
    H = H_data + (lam + EPS_REG) * np.eye(d)
    if not regularize_bias:
        H[intercept_pos, intercept_pos] -= lam
    return np.diagonal(np.linalg.inv(H))


@pytest.mark.parametrize("mode", [constants.SIMPLE, constants.FULL])
def test_fixed_effect_variance_vs_fd_hessian(tmp_path, mode):
    from tests.test_fixed_effect_lr import _make_dataset, _params
    from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel
    ds = _make_dataset(tmp_path, seed=31)
    model_params, base_params = _params(ds, tmp_path,
                                        fixed_effect_variance_mode=mode)
    model = FixedEffectLRModel(model_params, base_params)
    model.train(ds["train_dir"], None, ds["md_file"], model.checkpoint_path,
                {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
                 constants.IS_CHIEF: True}, base_params)
    # intercept LAST in the fixed-effect layout
    X1 = np.hstack([ds["X"], np.ones((len(ds["y"]), 1))])
    f = _bce_data_loss(X1, ds["y"], ds["weights"], ds["offsets"])
    H = fd_hessian(f, model.model_coefficients)
    expected = _expected_variance(H, model_params.l2_reg_weight, mode,
                                  intercept_pos=-1,
                                  regularize_bias=model_params.regularize_bias)
    np.testing.assert_allclose(model.variances, expected, rtol=1e-3)


@pytest.mark.parametrize("mode", [constants.SIMPLE, constants.FULL])
def test_random_effect_variance_vs_fd_hessian(tmp_path, mode):
    from tests.test_random_effect_lr import (_build_model, _make_groups,
                                             _write_dataset)
    groups, dense = _make_groups(num_entities=5, seed=32)
    md_file, train_dir, feature_file = _write_dataset(tmp_path, groups)
    model, base_params = _build_model(md_file, train_dir, feature_file,
                                      tmp_path,
                                      random_effect_variance_mode=mode)
    weights_out = model.fit_groups(groups, {}, base_params)
    lam = model.model_params.l2_reg_weight
    for eid, (X, y, offsets, w) in dense.items():
        sm = weights_out[eid]
        sup = np.asarray(sm.unique_global_indices)
        # intercept FIRST in the random-effect layout
        X1 = np.hstack([np.ones((len(y), 1)), X[:, sup]])
        f = _bce_data_loss(X1, y, w, offsets)
        H = fd_hessian(f, sm.theta)
        expected = _expected_variance(
            H, lam, mode, intercept_pos=0,
            regularize_bias=model.model_params.regularize_bias)
        np.testing.assert_allclose(sm.variance, expected, rtol=1e-3,
                                   err_msg=f"entity {eid} mode {mode}")


@pytest.mark.parametrize("mode", [constants.SIMPLE, constants.FULL])
def test_sharded_re_variance_vs_fd_hessian(tmp_path, mode):
    """The multi-chip path's variance against the same independent oracle."""
    from tests.test_random_effect_lr import (_build_model, _make_groups,
                                             _write_dataset)
    from tests.test_sharded_re import _groups_to_records
    from gdmix_tpu.parallel.mesh import get_mesh
    groups, dense = _make_groups(num_entities=5, seed=33)
    md_file, train_dir, feature_file = _write_dataset(tmp_path, groups)
    model, base_params = _build_model(md_file, train_dir, feature_file,
                                      tmp_path,
                                      random_effect_variance_mode=mode)
    weights_out = model.fit_records_sharded(_groups_to_records(groups),
                                            base_params, mesh=get_mesh())
    lam = model.model_params.l2_reg_weight
    for eid, (X, y, offsets, w) in dense.items():
        sm = weights_out[eid]
        sup = np.asarray(sm.unique_global_indices)
        X1 = np.hstack([np.ones((len(y), 1)), X[:, sup]])
        H = fd_hessian(_bce_data_loss(X1, y, w, offsets), sm.theta)
        expected = _expected_variance(
            H, lam, mode, intercept_pos=0,
            regularize_bias=model.model_params.regularize_bias)
        np.testing.assert_allclose(sm.variance, expected, rtol=1e-3,
                                   err_msg=f"entity {eid} mode {mode}")
