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
    """Area under the ROC curve with tie averaging. labels in {0,1}."""
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels, scores.dtype)
    n = scores.shape[0]
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    y_sorted = labels[order]

    # Average ranks over tied groups: rank_i = 1-based position, then for each tie
    # group replace by the group's mean rank via segment sums over boundaries.
    pos = jnp.arange(1, n + 1, dtype=scores.dtype)
    new_group = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (s_sorted[1:] != s_sorted[:-1]).astype(jnp.int32)])
    group_id = jnp.cumsum(new_group) - 1                    # 0-based tie-group ids
    group_sum = jax.ops.segment_sum(pos, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(pos), group_id, num_segments=n)
    mean_rank = (group_sum / jnp.maximum(group_cnt, 1))[group_id]

    n_pos = jnp.sum(labels)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(mean_rank * y_sorted)
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def mse(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels, scores.dtype)
    return jnp.mean((scores - labels) ** 2)
