"""Test harness configuration.

Multi-host/multi-chip behavior is simulated with 8 virtual CPU devices (the JAX
equivalent of the reference's TF_CONFIG fakery, see SURVEY.md §4). Numerics tests
run in float64 on CPU to compare against scipy oracles bit-tightly; the TPU path
itself is dtype-parametric.
"""
import os

# Must happen before jax is imported anywhere.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
