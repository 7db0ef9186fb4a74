"""Test harness config: run on a virtual 8-device CPU mesh with x64 support.

Per SURVEY.md §4: multi-host/multi-chip paths are validated without a cluster
via XLA's host-platform device-count flag; float64 is enabled so parity tests
can match the NumPy oracle bit-for-bit while fast-path tests pass float32
inputs explicitly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon environment pre-sets jax_platforms="axon,cpu"; force pure CPU for
# the test suite (the bench runs on the real chip, tests on the virtual mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
