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
