"""Acceptance test: blockwise coordinate descent must approach the AUC of a
JOINTLY trained model (sklearn LR over global features ⊕ user one-hots ⊕ movie
one-hots). This validates the whole decomposition — offsets, residual chaining,
per-entity solves — not just each solver in isolation."""
import os

import numpy as np
import pytest
import scipy.sparse as sp
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import roc_auc_score

from gdmix_tpu.data import movielens
from gdmix_tpu.workflow.config import WorkflowConfig
from gdmix_tpu.workflow.pipeline import run_gdmix_in_memory

from tests.test_e2e_pipeline import _config


def _joint_design(data, train_mask):
    """Sparse design matrix: [global bag | user one-hot | movie one-hot]."""
    n = len(data.uid)
    n_global = len(movielens.GLOBAL_FEATURE_VALUES)
    users = sorted(data.user_features)
    movies = sorted(data.movie_features)
    u_ix = {u: i for i, u in enumerate(users)}
    m_ix = {m: i for i, m in enumerate(movies)}
    rows, cols, vals = [], [], []
    for i in range(n):
        gi, gv = movielens._bag_for(data, "global", i)
        rows.extend([i] * len(gi))
        cols.extend(gi)
        vals.extend(gv)
        rows.append(i)
        cols.append(n_global + u_ix[int(data.user_id[i])])
        vals.append(1.0)
        rows.append(i)
        cols.append(n_global + len(users) + m_ix[int(data.movie_id[i])])
        vals.append(1.0)
    X = sp.csr_matrix((vals, (rows, cols)),
                      shape=(n, n_global + len(users) + len(movies)))
    return X


def test_pipeline_approaches_joint_model(tmp_path):
    root = str(tmp_path)
    data = movielens.generate_synthetic(num_users=100, num_movies=120,
                                        num_ratings=8000, seed=17)
    ml = movielens.prepare_gdmix_data(root, data, seed=0)

    # ---- joint oracle: one LR over everything ----
    rng = np.random.RandomState(0)
    train_mask = rng.uniform(0, 1, len(data.uid)) < 0.8  # same split as prep
    X = _joint_design(data, train_mask)
    y = data.response
    clf = LogisticRegression(C=1.0, max_iter=2000)
    clf.fit(X[train_mask], y[train_mask])
    joint_auc = roc_auc_score(y[~train_mask],
                              clf.decision_function(X[~train_mask]))

    # ---- our pipeline, two coordinate-descent sweeps ----
    metrics = run_gdmix_in_memory(_config(ml, os.path.join(root, "out")),
                                  num_sweeps=2)
    final_auc = metrics["per-movie"]
    print(f"joint oracle AUC {joint_auc:.4f} vs pipeline {final_auc:.4f}")
    # Coordinate descent on the decomposed objective must land close to the
    # jointly-trained optimum (regularization structure differs slightly, so
    # allow a small gap).
    assert final_auc > joint_auc - 0.02
