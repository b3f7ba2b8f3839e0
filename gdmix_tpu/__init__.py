"""gdmix-tpu: a TPU-native generalized mixed-effect (GDMix-capability) training engine.

One JAX/XLA codebase providing blockwise coordinate descent over a global fixed-effect
model plus per-entity random-effect models, replacing the reference linkedin/gdmix
TF1 + scipy + Spark + Kubeflow stack. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"

# Restore env-var authority over the jax platform selection. Some deployment
# images preload jax via sitecustomize and pin the platform list
# programmatically, which silently overrides JAX_PLATFORMS / JAX_ENABLE_X64 for
# every subprocess (e.g. jobs launched by workflow.distributed.execute_job_dag).
# If the user set those env vars, they win.
import os as _os  # noqa: E402

if "JAX_PLATFORMS" in _os.environ or "JAX_ENABLE_X64" in _os.environ:
    import jax as _jax  # noqa: E402

    if _os.environ.get("JAX_PLATFORMS"):
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    if _os.environ.get("JAX_ENABLE_X64"):
        _jax.config.update(
            "jax_enable_x64",
            _os.environ["JAX_ENABLE_X64"].lower() in ("1", "true", "yes"))


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set (platform.machine +
    /proc/cpuinfo flags) — partitions the default compile-cache dir per
    machine type."""
    import hashlib
    import platform
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    sig += line
                    break
    except OSError:
        pass
    return hashlib.sha256(sig.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    A cold pipeline run is compile-bound (~50% of wall on CPU; far worse on
    remote-relay TPU where each jit costs 2–200 s), and GDMix's shapes are
    highly repeatable across runs (power-of-two bucket tiers, fixed FE padding
    policy) — so a disk cache converts every rerun/sweep/retry into a cache
    hit (measured 18.8 s → 7.8 s on the 100k-rating pipeline).
    GDMIX_TPU_COMPILE_CACHE: unset → ~/.cache/gdmix_tpu/xla-<host-cpu-hash>
    when the platform list names a TPU backend (tpu/axon) — the hash keeps
    machine-feature-specific XLA:CPU AOT entries from crossing hosts (a
    legacy un-suffixed dir is adopted once by rename); anything else — including an unset
    platform that may resolve to CPU — stays opt-in because XLA:CPU AOT
    entries are machine-feature-specific and can SIGILL when moved between
    hosts. A path value → that directory on any backend; "0"/"off" →
    disabled. Respects an explicit JAX_COMPILATION_CACHE_DIR /
    jax_compilation_cache_dir if already set.
    """
    raw = _os.environ.get("GDMIX_TPU_COMPILE_CACHE", "")
    if raw.lower() in ("0", "off", "false", "no"):
        return
    import jax as _jax  # noqa: E402

    if _jax.config.jax_compilation_cache_dir:  # user already configured one
        return
    platforms = str(_jax.config.jax_platforms or "").lower()
    if not raw and not any(p in platforms for p in ("tpu", "axon")):
        return  # default-on only where compiles are expensive (TPU relay)
    # Suffix the default dir with a host-CPU fingerprint: XLA:CPU AOT cache
    # entries are machine-feature-specific, and a process that enables the
    # cache under a TPU platform can still compile CPU executables later
    # (e.g. dryrun_multichip falls back to virtual host devices in-process).
    # Loading another machine's entries prints cpu_aot_loader feature-
    # mismatch errors and can SIGILL/SIGSEGV — a fresh host gets a fresh
    # dir instead (explicit GDMIX_TPU_COMPILE_CACHE paths are used as-is).
    if raw:
        path = raw
    else:
        path = _os.path.join(_os.path.expanduser("~"), ".cache",
                             "gdmix_tpu", f"xla-{_host_fingerprint()}")
        legacy = _os.path.join(_os.path.expanduser("~"), ".cache",
                               "gdmix_tpu", "xla")
        if _os.path.isdir(legacy) and not _os.path.exists(path):
            try:  # adopt the un-fingerprinted dir once (same-host entries)
                _os.rename(legacy, path)
            except OSError:
                pass
    try:
        _os.makedirs(path, exist_ok=True)
    except OSError:
        return  # read-only home: run uncached rather than fail the import
    _jax.config.update("jax_compilation_cache_dir", path)
    # Relay-attached TPU compiles are worth caching at any size; keep a small
    # floor so trivial host-side jits don't churn inodes (explicit
    # JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS still wins).
    if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in _os.environ:
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def _tune_host_allocator() -> None:
    """Disable numpy's MADV_HUGEPAGE on large buffers.

    On kernels with THP `defrag=madvise` (this deployment), every madvised
    first touch triggers synchronous compaction: measured 19.5 s vs 0.17 s to
    fill a fresh 320 MB array (115x). The host data path (decode, grouping,
    bucketizing, score marshaling) allocates large fresh buffers constantly,
    so those stalls dominate cold-run wall clock; the TLB wins from hugepages
    are negligible for streaming passes. GDMIX_TPU_HUGEPAGE_MADVISE=1
    restores numpy's default. Uses numpy's runtime switch because the
    NUMPY_MADVISE_HUGEPAGE env var is read at import time and this
    environment's sitecustomize imports numpy before user code runs.
    """
    if _os.environ.get("GDMIX_TPU_HUGEPAGE_MADVISE", "").lower() in (
            "1", "on", "true", "yes"):
        return
    try:
        from numpy._core import multiarray  # numpy >= 2
    except ImportError:  # pragma: no cover - numpy < 2
        try:
            from numpy.core import multiarray
        except ImportError:
            return
    try:
        multiarray._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - private API drift
        pass


_enable_persistent_compile_cache()
_tune_host_allocator()
