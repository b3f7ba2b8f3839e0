"""On-device entity grouping: sort-by-entity + segment ops.

The device-side replacement for Spark's `groupBy(entity).agg(collect_list(*))`
shuffle (/root/reference/gdmix-data/src/main/scala/com/linkedin/gdmix/data/
DataPartitioner.scala:296-317): a stable sort by entity id followed by
segment-boundary arithmetic, all jittable. Production callers: the multi-chip
random-effect path (parallel/entity_sharding.route_and_bucket groups each
shard's routed records with `group_by_entity_device` + `build_entity_blocks`),
used by RandomEffectLRModel.fit_records_sharded and the in-HBM pipeline's
sharded mode.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

ENTITY_SENTINEL = jnp.iinfo(jnp.int32).max  # sorts after every real entity id


class EntitySegments(NamedTuple):
    order: jnp.ndarray        # [N] permutation sorting records by entity
    segment_ids: jnp.ndarray  # [N] dense segment index per SORTED record
    unique_count: jnp.ndarray # [] number of distinct entities (<= N)
    seg_entity: jnp.ndarray   # [N] entity id per segment slot (padded w/ last)
    seg_counts: jnp.ndarray   # [N] records per segment slot (0 beyond unique)
    seg_starts: jnp.ndarray   # [N] start offset of each segment in sorted order


def group_by_entity_device(entity_ids: jnp.ndarray) -> EntitySegments:
    """Stable grouping of records by integer entity id, fully on device."""
    n = entity_ids.shape[0]
    order = jnp.argsort(entity_ids, stable=True)
    sorted_e = entity_ids[order]
    new_seg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               (sorted_e[1:] != sorted_e[:-1]).astype(jnp.int32)])
    segment_ids = jnp.cumsum(new_seg) - 1                       # [N]
    unique_count = segment_ids[-1] + 1
    ones = jnp.ones_like(segment_ids)
    seg_counts = jax.ops.segment_sum(ones, segment_ids, num_segments=n)
    seg_starts = jnp.concatenate([jnp.zeros((1,), seg_counts.dtype),
                                  jnp.cumsum(seg_counts)[:-1]])
    seg_entity = jax.ops.segment_max(sorted_e, segment_ids, num_segments=n)
    return EntitySegments(order=order, segment_ids=segment_ids,
                          unique_count=unique_count, seg_entity=seg_entity,
                          seg_counts=seg_counts, seg_starts=seg_starts)


def build_entity_blocks(ent: jnp.ndarray, arrays: Dict[str, jnp.ndarray],
                        valid: jnp.ndarray, b_cap: int, n_cap: int
                        ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray,
                                   jnp.ndarray, jnp.ndarray]:
    """Group records by entity and pack them into dense solver blocks
    [b_cap, n_cap, ...], fully on device (jittable; runs per shard under
    shard_map in the multi-chip path).

    ent:    [N] int32 entity index per record (invalid records get the
            sentinel and never land in a block)
    arrays: {name: [N, ...]} record payloads to pack
    valid:  [N] bool (False = empty routed slot / padding)

    Returns (blocks, slot_entity [b_cap] (-1 = empty slot), slot_count [b_cap],
    dropped) where dropped counts records lost to b_cap/n_cap capacity.
    The device replacement for the host-side bucketize fill loop — one sort +
    one scatter instead of per-entity python (reference job_consumers.py
    producer slicing).
    """
    n = ent.shape[0]
    assert b_cap <= n, (b_cap, n)
    ent_eff = jnp.where(valid, ent, ENTITY_SENTINEL)
    segs = group_by_entity_device(ent_eff)
    j = jnp.arange(n)
    sid = segs.segment_ids                       # [N] per SORTED record
    rank = j - segs.seg_starts[sid]
    ent_sorted = ent_eff[segs.order]
    keep = (ent_sorted != ENTITY_SENTINEL) & (sid < b_cap) & (rank < n_cap)
    slot = jnp.where(keep, sid * n_cap + rank, b_cap * n_cap)   # trash slot

    def pack(a):
        a_sorted = a[segs.order]
        out = jnp.zeros((b_cap * n_cap + 1,) + a.shape[1:], a.dtype)
        return out.at[slot].set(a_sorted)[:-1] \
            .reshape((b_cap, n_cap) + a.shape[1:])

    blocks = {k: pack(v) for k, v in arrays.items()}
    # the sentinel group (if present) is always the LAST segment
    has_sentinel = jnp.any(ent_eff == ENTITY_SENTINEL)
    real_count = segs.unique_count - has_sentinel.astype(segs.unique_count.dtype)
    slot_live = jnp.arange(b_cap) < real_count
    slot_entity = jnp.where(slot_live, segs.seg_entity[:b_cap], -1)
    slot_count = jnp.where(slot_live,
                           jnp.minimum(segs.seg_counts[:b_cap], n_cap), 0)
    dropped = jnp.sum((ent_sorted != ENTITY_SENTINEL) & ~keep)
    return blocks, slot_entity, slot_count, dropped


def per_entity_sample_counts(entity_ids: jnp.ndarray) -> jnp.ndarray:
    """[N] per-RECORD count of its entity's samples (for active/passive
    bounding on device — DataPartitioner.getGroupId's broadcast-join count)."""
    segs = group_by_entity_device(entity_ids)
    counts_sorted = segs.seg_counts[segs.segment_ids]
    inv = jnp.zeros_like(segs.order).at[segs.order].set(
        jnp.arange(entity_ids.shape[0]))
    return counts_sorted[inv]


def assign_group_ids_device(entity_ids: jnp.ndarray, uids: jnp.ndarray,
                            min_samples: int | None,
                            max_samples: int | None) -> jnp.ndarray:
    """Device version of the partitioner's group-id rule: 0 = active,
    −1 = below lower bound, >0 = upper-bound overflow (uid mod group count)."""
    n = entity_ids.shape[0]
    if min_samples is None and max_samples is None:
        return jnp.zeros((n,), jnp.int32)
    counts = per_entity_sample_counts(entity_ids)
    if max_samples is not None:
        group_count = counts // max_samples + 1
    else:
        group_count = jnp.ones_like(counts)
    group = jnp.mod(uids, group_count.astype(uids.dtype)).astype(jnp.int32)
    if min_samples is not None:
        group = jnp.where(counts < min_samples, -1, group)
    return group
