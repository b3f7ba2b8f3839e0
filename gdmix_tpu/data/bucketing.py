"""Entity bucketing: ragged per-entity datasets → dense padded solver buckets.

The TPU replacement for the reference's producer/consumer job queue
(/root/reference/gdmix-trainer/src/gdmix/models/custom/scipy/job_consumers.py:161-296):
instead of slicing one scipy COO matrix per entity and queueing it to a process
pool, entities are grouped into a few power-of-two-sized buckets and solved as
vmapped batches.

Each entity's problem is expressed in COMPACT FEATURE SPACE: its records' global
feature ids are remapped onto [0, U) where U is the entity's unique-feature count
(padded per bucket). This is the reference's `enable_local_indexing` — which is
output-equivalent to global indexing because the L2 term is coordinate-separable,
so coefficients outside an entity's support stay exactly zero and are dropped from
the exported model either way (job_consumers.py:55-63 extracts support coefficients
in both modes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence

import numpy as np

from gdmix_tpu.io.input_pipeline import EntityGroup
from gdmix_tpu.io.model_avro import SparseModel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class EntityBucket:
    """A batch of same-shape per-entity problems (all arrays leading dim B)."""
    entity_ids: List[str]
    indices: np.ndarray        # [B, n_cap, K] int32 — LOCAL feature ids
    values: np.ndarray         # [B, n_cap, K] float
    offsets: np.ndarray        # [B, n_cap]
    labels: np.ndarray         # [B, n_cap]
    weights: np.ndarray        # [B, n_cap] (0.0 marks padding rows)
    uids: np.ndarray           # [B, n_cap] int64
    sample_count: np.ndarray   # [B] int32 — true per-entity record count
    unique_global_indices: np.ndarray  # [B, U] int64 (0-padded)
    u_count: np.ndarray        # [B] int32 — true unique-feature count
    theta0: np.ndarray         # [B, 1+U] or [B, U] — warm-start coefficients

    @property
    def batch(self) -> int:
        return len(self.entity_ids)

    @property
    def n_cap(self) -> int:
        return self.indices.shape[1]

    @property
    def u_cap(self) -> int:
        return self.unique_global_indices.shape[1]


class _Compact(NamedTuple):
    """One entity's data in compact feature space, flattened (no per-record
    python objects — a single searchsorted remaps every nnz entry at once)."""
    unique: np.ndarray       # sorted unique global feature ids
    flat_local: np.ndarray   # [total_nnz] local ids, record-major
    flat_vals: np.ndarray    # [total_nnz]
    rec_nnz: np.ndarray      # [n] per-record nnz


def _entity_compact(group: EntityGroup) -> _Compact:
    if group.padded_indices is not None:
        # padded-block fast path: one mask, zero per-record python
        rec_nnz = np.asarray(group.rec_nnz, np.int64)
        k = group.padded_indices.shape[1]
        valid = np.arange(k)[None, :] < rec_nnz[:, None]
        all_idx = group.padded_indices[valid].astype(np.int64)
        all_val = group.padded_values[valid]
    else:
        rec_nnz = np.asarray([len(r) for r in group.ragged_indices], np.int64)
        if rec_nnz.sum():
            all_idx = np.concatenate(group.ragged_indices)
            all_val = np.concatenate(group.ragged_values)
        else:
            all_idx = np.zeros(0, np.int64)
            all_val = np.zeros(0)
    unique = np.unique(all_idx) if all_idx.size else np.zeros(1, np.int64)
    flat_local = np.searchsorted(unique, all_idx).astype(np.int32)
    return _Compact(unique=unique, flat_local=flat_local, flat_vals=all_val,
                    rec_nnz=rec_nnz)


def _warm_start(unique: np.ndarray, prior: Optional[SparseModel],
                has_intercept: bool, u_cap: int) -> np.ndarray:
    """Reconcile a prior model onto the entity's current support
    (reference job_consumers.py:260-288)."""
    dim = u_cap + (1 if has_intercept else 0)
    theta0 = np.zeros(dim, dtype=np.float64)
    if prior is None:
        return theta0
    off = 1 if has_intercept else 0
    if has_intercept:
        theta0[0] = prior.theta[0]
    p_idx = np.asarray(prior.unique_global_indices)
    if p_idx.size:
        order = np.argsort(p_idx, kind="stable")
        p_sorted = p_idx[order]
        p_theta = np.asarray(prior.theta[off:])[order]
        pos = np.searchsorted(p_sorted, unique)
        pos_c = np.clip(pos, 0, len(p_sorted) - 1)
        hit = p_sorted[pos_c] == unique
        theta0[off:off + len(unique)][hit] = p_theta[pos_c[hit]]
    return theta0


def bucketize(groups: Sequence[EntityGroup],
              schema_params,
              offset_column_name: str,
              has_intercept: bool = True,
              prior_models: Optional[Dict[str, SparseModel]] = None,
              min_bucket_rows: int = 8,
              batch_align: int = 8,
              nnz_align: int = 4) -> List[EntityBucket]:
    """Group entities into power-of-two sample-count buckets and pad.

    Padding entities (to align the batch dim) carry sample_count 0 / weights 0 and
    converge instantly in the batched solver.
    """
    if not groups:
        return []
    prior_models = prior_models or {}
    label_col = schema_params.label_column_name
    weight_col = schema_params.weight_column_name
    uid_col = schema_params.uid_column_name

    compact = [_entity_compact(g) for g in groups]
    counts = np.array([g.sample_count for g in groups])

    # Power-of-two caps starting at min_bucket_rows.
    caps: List[int] = []
    cap = min_bucket_rows
    max_count = int(counts.max())
    while cap < max_count:
        caps.append(cap)
        cap *= 2
    caps.append(_round_up(max_count, min_bucket_rows))

    def cap_of(n: int) -> int:
        for c in caps:
            if n <= c:
                return c
        return caps[-1]

    assignment: Dict[int, List[int]] = {}
    for gi, n in enumerate(counts):
        assignment.setdefault(cap_of(int(n)), []).append(gi)

    def _next_pow2(x: int) -> int:
        p = 1
        while p < x:
            p *= 2
        return p

    buckets: List[EntityBucket] = []
    for n_cap, members in sorted(assignment.items()):
        b_real = len(members)
        # power-of-two batch tiers: far fewer distinct compiled shapes across
        # coordinates/datasets (each new shape is a jit compile — expensive on
        # remote TPU backends)
        b = max(batch_align, _next_pow2(b_real))
        k = max(max((int(compact[gi].rec_nnz.max()) if compact[gi].rec_nnz.size
                     else 1 for gi in members)), 1)
        k = _round_up(k, nnz_align)
        u = max(max(len(compact[gi].unique) for gi in members), 1)
        u = _round_up(u, 8)
        dim = u + (1 if has_intercept else 0)

        indices = np.zeros((b, n_cap, k), dtype=np.int32)
        values = np.zeros((b, n_cap, k), dtype=np.float64)
        offsets = np.zeros((b, n_cap), dtype=np.float64)
        labels = np.zeros((b, n_cap), dtype=np.float64)
        weights = np.zeros((b, n_cap), dtype=np.float64)
        uids = np.zeros((b, n_cap), dtype=np.int64)
        sample_count = np.zeros((b,), dtype=np.int32)
        unique_g = np.zeros((b, u), dtype=np.int64)
        u_count = np.zeros((b,), dtype=np.int32)
        theta0 = np.zeros((b, dim), dtype=np.float64)
        entity_ids: List[str] = []

        for slot, gi in enumerate(members):
            g = groups[gi]
            c = compact[gi]
            n = g.sample_count
            entity_ids.append(g.entity_id)
            sample_count[slot] = n
            u_count[slot] = len(c.unique)
            unique_g[slot, :len(c.unique)] = c.unique
            if c.flat_local.size:
                # flat scatter of every nnz entry at once (record-major):
                # row r repeated nnz_r times, column = position within record
                rows = np.repeat(np.arange(len(c.rec_nnz)), c.rec_nnz)
                starts = np.concatenate([[0], np.cumsum(c.rec_nnz)[:-1]])
                cols = (np.arange(c.flat_local.size)
                        - np.repeat(starts, c.rec_nnz))
                indices[slot, rows, cols] = c.flat_local
                values[slot, rows, cols] = c.flat_vals
            if label_col and label_col in g.columns:
                labels[slot, :n] = g.columns[label_col][:n]
            if weight_col and weight_col in g.columns:
                weights[slot, :n] = g.columns[weight_col][:n]
            else:
                weights[slot, :n] = 1.0
            if offset_column_name in g.columns:
                offsets[slot, :n] = g.columns[offset_column_name][:n]
            if uid_col in g.columns:
                uids[slot, :n] = g.columns[uid_col][:n]
            theta0[slot] = _warm_start(c.unique, prior_models.get(g.entity_id),
                                       has_intercept, u)

        buckets.append(EntityBucket(
            entity_ids=entity_ids, indices=indices, values=values, offsets=offsets,
            labels=labels, weights=weights, uids=uids, sample_count=sample_count,
            unique_global_indices=unique_g, u_count=u_count, theta0=theta0))
    return buckets
