"""Cross-tier lane packing + pow-2 batch decomposition (VERDICT r3 task 7):
the bucket plan must cover every entity exactly once, only PROMOTE (n_cap >=
every member's count), keep batch pieces pow-2-friendly, and cut the padded
lane-block compute of the heavy-tail mix vs per-entity pow-2 tiering."""
import numpy as np

from gdmix_tpu.data.bucketing import (LANE_BLOCK, _sample_caps,
                                      plan_lane_buckets)


def _next_pow2(x, lo=8):
    p = lo
    while p < x:
        p *= 2
    return p


def _block_cost(plan):
    """What the fused lanes kernel actually computes: ceil-to-128 lanes of
    the pow-2-padded batch, times the bucket's n_cap."""
    total = 0
    for n_cap, members in plan:
        b = _next_pow2(len(members))
        total += -(-b // LANE_BLOCK) * LANE_BLOCK * n_cap
    return total


def test_plan_covers_promotes_and_decomposes():
    rng = np.random.RandomState(1)
    counts = np.clip((rng.pareto(1.2, 20_000) * 8).astype(np.int64) + 2,
                     2, 2048)
    caps = np.asarray(_sample_caps(counts, 8))
    plan = plan_lane_buckets(counts, caps)
    seen = np.concatenate([m for _, m in plan])
    assert len(seen) == len(counts)
    assert len(np.unique(seen)) == len(counts)          # exact cover
    for n_cap, members in plan:
        assert counts[members].max() <= n_cap           # promote-only
        assert n_cap in caps
    # at most 3 pieces per tier; the first two are pow-2 lane-block
    # multiples, the tail is pow-2-padded by the bucket builder
    from collections import Counter
    per_tier = Counter(n_cap for n_cap, _ in plan)
    assert max(per_tier.values()) <= 3
    seen_tail = set()
    for n_cap, members in plan:
        s = len(members)
        if n_cap in seen_tail:
            raise AssertionError("piece after tail")
        if s >= 2 * LANE_BLOCK and (s & (s - 1)) == 0 \
                and s % LANE_BLOCK == 0:
            continue                                    # pow-2 piece
        seen_tail.add(n_cap)                            # tail (any size)


def test_plan_cuts_heavy_tail_padding():
    rng = np.random.RandomState(1)
    counts = np.clip((rng.pareto(1.2, 20_000) * 8).astype(np.int64) + 2,
                     2, 2048)
    caps = np.asarray(_sample_caps(counts, 8))
    packed = _block_cost(plan_lane_buckets(counts, caps))
    # the pre-packing assignment: every entity its own pow-2 tier, one
    # pow-2-padded bucket per tier
    tier = np.searchsorted(caps, counts, side="left")
    old = _block_cost([(int(caps[t]), np.flatnonzero(tier == t))
                       for t in range(len(caps)) if (tier == t).any()])
    real = counts.sum()
    assert packed < 0.80 * old, (packed / real, old / real)
    assert packed < 1.75 * real                          # measured ~1.67x


def test_plan_tiny_batch():
    counts = np.asarray([3, 9, 17, 2], np.int64)
    caps = np.asarray(_sample_caps(counts, 8))
    plan = plan_lane_buckets(counts, caps)
    # all four fit one lane block: a single bucket at the max member's cap
    assert len(plan) == 1
    n_cap, members = plan[0]
    assert n_cap == 24 or n_cap == 32        # _sample_caps last cap rule
    assert sorted(members.tolist()) == [0, 1, 2, 3]
