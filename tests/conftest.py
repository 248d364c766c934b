"""
Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that sharding/mesh logic is
exercised without TPU hardware (SURVEY §4: the pure-JAX design lets the
CPU run the identical compiled program, unlike the reference whose tests all
require a physical GPU).
"""

import os

# Must be set before jax import.  Tests force the CPU backend (override any
# ambient TPU/axon platform) unless WDT_TEST_PLATFORM says otherwise.
os.environ["JAX_PLATFORMS"] = os.environ.get("WDT_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# jax may already have been imported by a sitecustomize hook (which latches
# JAX_PLATFORMS at import time); force the platform through the config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices for tests"
