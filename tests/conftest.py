"""Test harness configuration.

Multi-host/multi-chip behavior is simulated with 8 virtual CPU devices (the JAX
equivalent of the reference's TF_CONFIG fakery, see SURVEY.md §4). Numerics tests
run in float64 on CPU to compare against scipy oracles bit-tightly; the TPU path
itself is dtype-parametric.

Note: the environment preloads jax with a remote-TPU backend via sitecustomize
(JAX_PLATFORMS=axon), so we must override — not setdefault — and also flip the
already-imported jax config before any backend initializes.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402  (already imported by sitecustomize; reconfigure it)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; jax backend initialized too early: "
    f"{jax.devices()}")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA executable accumulation.

    The full suite compiles ~1000 programs into one process; past some
    accumulation the NEXT large XLA:CPU compile segfaults inside
    backend_compile_and_load (observed repeatedly at the same test near the
    end of the alphabet, while every file window and the file alone pass —
    3 crashes / 4 full serial runs on 2026-08-20). Clearing jax's caches at
    module boundaries keeps the live-executable count bounded; modules
    recompile what they share (a few seconds each) and the crash window
    never builds up."""
    yield
    import jax
    jax.clear_caches()
