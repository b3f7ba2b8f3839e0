"""On-device evaluation metrics (AUC / MSE).

Replaces the Spark Evaluator job (/root/reference/gdmix-data/src/main/scala/com/
linkedin/gdmix/evaluation/Evaluator.scala:29-44) with jittable reductions. AUC is
the Mann-Whitney statistic with average-rank tie correction — identical to the
trapezoidal area under the ROC curve that BinaryClassificationMetrics /
sklearn.roc_auc_score compute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def auc(scores: jnp.ndarray, labels: jnp.ndarray,
        weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Area under the ROC curve with tie averaging. labels in {0,1}.

    With `weights`, computes the weighted Mann-Whitney statistic
    Σ_{i∈pos,j∈neg} wᵢwⱼ·[sᵢ>sⱼ] + ½·wᵢwⱼ·[sᵢ=sⱼ], normalized by W₊·W₋ —
    identical to sklearn.roc_auc_score(sample_weight=...).
    """
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels, scores.dtype)
    n = scores.shape[0]
    w = (jnp.ones_like(scores) if weights is None
         else jnp.asarray(weights, scores.dtype))
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    y_sorted = labels[order]
    w_sorted = w[order]

    # Tie groups: per group, positives beat the negative weight strictly below
    # and half-beat the negative weight inside the group.
    new_group = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (s_sorted[1:] != s_sorted[:-1]).astype(jnp.int32)])
    group_id = jnp.cumsum(new_group) - 1                    # 0-based tie-group ids
    pos_w = w_sorted * y_sorted
    neg_w = w_sorted * (1.0 - y_sorted)
    g_pos = jax.ops.segment_sum(pos_w, group_id, num_segments=n)
    g_neg = jax.ops.segment_sum(neg_w, group_id, num_segments=n)
    neg_below = jnp.cumsum(g_neg) - g_neg                   # exclusive per group
    u = jnp.sum(g_pos * (neg_below + 0.5 * g_neg))
    total = jnp.sum(pos_w) * jnp.sum(neg_w)
    return u / jnp.maximum(total, 1e-30)


def mse(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels, scores.dtype)
    return jnp.mean((scores - labels) ** 2)
