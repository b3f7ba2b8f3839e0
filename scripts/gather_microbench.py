#!/usr/bin/env python
"""Is a host-predicted row GATHER cheaper than the on-device SORT the sharded
plane's pack_tier pays today? Times, at the bench's stage scale (1.2M routed
records, 2.2M block cells):
  - jnp.take of [1.2M, 8] f32 rows by a static [2.2M] int32 index
  - jnp.sort / argsort of 1.2M int32 keys (what build_entity_blocks pays)
  - the full 5-column gather a tier pack would need
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gdmix_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)
N = 1_221_192
M = 2_200_000
rng = np.random.RandomState(0)
rows = jnp.asarray(rng.randn(N, 8), jnp.float32)
col = jnp.asarray(rng.randn(N), jnp.float32)
keys = jnp.asarray(rng.randint(0, 100_000, N), jnp.int32)
G = jnp.asarray(rng.randint(0, N, M), jnp.int32)


def timeit(tag, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # relay sync
    ts = []
    for _ in range(4):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.time() - t0)
    print(f"{tag}: min={min(ts)*1e3:.1f}ms reps={[round(t*1e3,1) for t in ts]}")


timeit("take rows [1.2M,8] by [2.2M]", jax.jit(lambda r, g: jnp.take(r, g, axis=0)), rows, G)
timeit("take col [1.2M] by [2.2M]", jax.jit(lambda c, g: jnp.take(c, g, axis=0)), col, G)
timeit("argsort 1.2M i32", jax.jit(lambda k: jnp.argsort(k)), keys)
timeit("sort_key_val 1.2M", jax.jit(lambda k, c: jax.lax.sort_key_val(k, c)), keys, col)


@jax.jit
def pack5(rows, col, g):
    return (jnp.take(rows, g, axis=0), jnp.take(rows, g, axis=0),
            jnp.take(col, g, axis=0), jnp.take(col, g, axis=0),
            jnp.take(col, g, axis=0))


timeit("5-column tier pack gather", pack5, rows, col, G)
print("done")
