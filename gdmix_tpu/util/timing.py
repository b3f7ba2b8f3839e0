"""Timing / profiling / memory instrumentation.

The reference's observability is wall-clock log lines per phase plus psutil RSS
per L-BFGS funcall (SURVEY.md §5). This module provides the same surface —
`phase(...)` context timers with RSS deltas — plus what the TPU stack adds for
free: `device_profile(...)` wraps a block in a jax.profiler trace (set
GDMIX_TPU_PROFILE=/dir or pass log_dir) viewable in XProf/TensorBoard.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

logger = logging.getLogger(__name__)


def rss_gb() -> float:
    """Resident set size in GB (psutil if present, /proc fallback)."""
    try:
        import psutil
        return psutil.Process(os.getpid()).memory_info().rss / 1e9
    except ImportError:
        try:
            with open("/proc/self/statm") as f:
                pages = int(f.read().split()[1])
            return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
        except OSError:
            return float("nan")


@contextlib.contextmanager
def phase(name: str, log=logger) -> Iterator[None]:
    """Wall-clock + RSS phase timer (the reference's per-phase log lines)."""
    t0 = time.time()
    r0 = rss_gb()
    try:
        yield
    finally:
        log.info("%s --- %.3f seconds --- memory used: %.2f GB (Δ%+.2f)",
                 name, time.time() - t0, rss_gb(), rss_gb() - r0)


@contextlib.contextmanager
def device_profile(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace around a block. Active when log_dir is given or
    GDMIX_TPU_PROFILE is set; no-op otherwise."""
    log_dir = log_dir or os.environ.get("GDMIX_TPU_PROFILE")
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote device trace to %s", log_dir)
