#!/usr/bin/env python
"""Profile the RE stage path (fit_flat -> sharded plane + avro export/reload)
standalone with per-phase INFO logs — bench.py's re_stage sub-metric, isolated.

Usage: python scripts/profile_stage.py [entities] [reps]
Env: BENCH_RE_MODE=host to profile the host plane instead.
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

import bench  # noqa: E402

entities = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

fg = bench.make_workload_flat(entities, seed=3)
rate = bench.run_re_stage(fg, reps)
print(f"stage rate: {rate:.1f} models/sec")
