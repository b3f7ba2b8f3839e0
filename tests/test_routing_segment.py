"""On-device grouping + all-to-all routing tests on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gdmix_tpu.ops.segment import (assign_group_ids_device,
                                   group_by_entity_device,
                                   per_entity_sample_counts)
from gdmix_tpu.data.partitioner import assign_group_ids
from gdmix_tpu.parallel.mesh import get_mesh
from gdmix_tpu.parallel.routing import route_to_entity_shards


def test_group_by_entity_device():
    e = jnp.asarray([5, 3, 5, 1, 3, 3, 7], jnp.int64)
    segs = jax.jit(group_by_entity_device)(e)
    assert int(segs.unique_count) == 4
    order = np.asarray(segs.order)
    sorted_e = np.asarray(e)[order]
    assert list(sorted_e) == sorted(list(np.asarray(e)))
    np.testing.assert_array_equal(np.asarray(segs.seg_counts)[:4], [1, 3, 2, 1])
    np.testing.assert_array_equal(np.asarray(segs.seg_entity)[:4], [1, 3, 5, 7])
    np.testing.assert_array_equal(np.asarray(segs.seg_starts)[:4], [0, 1, 4, 6])
    # stability: records of entity 3 keep original relative order (idx 1,4,5)
    assert list(order[1:4]) == [1, 4, 5]


def test_per_entity_counts_and_group_ids_match_host():
    rng = np.random.RandomState(0)
    e = rng.randint(0, 20, 200).astype(np.int64)
    uids = np.arange(200, dtype=np.int64)
    counts = np.asarray(per_entity_sample_counts(jnp.asarray(e)))
    _, inverse, c = np.unique(e, return_inverse=True, return_counts=True)
    np.testing.assert_array_equal(counts, c[inverse])

    for lo, hi in ((None, None), (5, None), (None, 4), (5, 4)):
        dev = np.asarray(assign_group_ids_device(jnp.asarray(e),
                                                 jnp.asarray(uids), lo, hi))
        host = assign_group_ids(e.astype(object).astype(str), uids, lo, hi)
        np.testing.assert_array_equal(dev, host, err_msg=f"bounds {lo},{hi}")


def test_route_to_entity_shards():
    mesh = get_mesh()
    num_shards = mesh.shape["data"]
    n = 64 * num_shards
    rng = np.random.RandomState(1)
    uid = np.arange(n, dtype=np.int64)
    payload = rng.randn(n, 3)
    target = rng.randint(0, num_shards, n).astype(np.int32)

    sh = NamedSharding(mesh, P("data"))
    sh2 = NamedSharding(mesh, P("data", None))
    arrays = {"uid": jax.device_put(jnp.asarray(uid), sh),
              "payload": jax.device_put(jnp.asarray(payload), sh2)}
    routed = route_to_entity_shards(mesh, arrays,
                                    jax.device_put(jnp.asarray(target), sh),
                                    capacity=48)
    assert int(jnp.sum(routed.overflow)) == 0
    got_uid = np.asarray(routed.arrays["uid"])
    got_payload = np.asarray(routed.arrays["payload"])
    valid = np.asarray(routed.valid)

    # every record arrives exactly once, on the shard that owns its entity
    assert valid.sum() == n
    arrived = np.sort(got_uid[valid])
    np.testing.assert_array_equal(arrived, uid)
    slots_per_shard = len(valid) // num_shards
    for i, u in enumerate(got_uid):
        if valid[i]:
            shard_of_slot = i // slots_per_shard
            assert target[u] == shard_of_slot
            np.testing.assert_allclose(got_payload[i], payload[u])


def test_route_overflow_reported():
    mesh = get_mesh()
    num_shards = mesh.shape["data"]
    n = 16 * num_shards
    # everything targets shard 0 with a capacity that can't hold it
    target = np.zeros(n, np.int32)
    sh = NamedSharding(mesh, P("data"))
    arrays = {"uid": jax.device_put(jnp.arange(n), sh)}
    routed = route_to_entity_shards(mesh, arrays,
                                    jax.device_put(jnp.asarray(target), sh),
                                    capacity=8)
    # each shard kept 8 of its 16 local records
    assert int(jnp.sum(routed.overflow)) == n - 8 * num_shards
    assert int(np.asarray(routed.valid).sum()) == 8 * num_shards
