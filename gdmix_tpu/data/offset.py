"""Offset (score-residual) updater — the coordinate-descent arithmetic.

Replaces the Spark OffsetUpdater (/root/reference/gdmix-data/src/main/scala/com/
linkedin/gdmix/data/OffsetUpdater.scala:105-129):

    offset = predictionScore(previous coordinate, this sweep)
           − predictionScorePerCoordinate(this coordinate, previous sweep)   [optional]

joined on uid. The Spark shuffle-join becomes a vectorized searchsorted gather; on
device the same op is a sort + take (see pipeline usage). Matching the reference,
the joined score is cast to float32 before subtraction (OffsetUpdater.scala:115).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _align_by_uid(target_uids: np.ndarray, uids: np.ndarray,
                  values: np.ndarray) -> np.ndarray:
    """values[uids] gathered onto target_uids (inner-join semantics: missing uids
    raise, as the reference's inner join would silently drop them — we'd rather
    fail loudly)."""
    order = np.argsort(uids, kind="stable")
    sorted_uids = uids[order]
    pos = np.searchsorted(sorted_uids, target_uids)
    pos = np.clip(pos, 0, len(sorted_uids) - 1)
    if not np.array_equal(sorted_uids[pos], target_uids):
        missing = target_uids[sorted_uids[pos] != target_uids]
        raise ValueError(f"scores missing for {len(missing)} uids "
                         f"(e.g. {missing[:5]})")
    return values[order][pos]


def update_offset(target_uids: np.ndarray,
                  score_uids: np.ndarray,
                  prediction_scores: np.ndarray,
                  per_coordinate_uids: Optional[np.ndarray] = None,
                  per_coordinate_scores: Optional[np.ndarray] = None) -> np.ndarray:
    """offset per target uid = score − (per-coordinate score from last sweep)."""
    offsets = _align_by_uid(target_uids, np.asarray(score_uids, np.int64),
                            np.asarray(prediction_scores, np.float32)
                            .astype(np.float64))
    if per_coordinate_uids is not None and per_coordinate_scores is not None:
        pc = _align_by_uid(target_uids, np.asarray(per_coordinate_uids, np.int64),
                           np.asarray(per_coordinate_scores, np.float64))
        offsets = offsets - pc
    return offsets
