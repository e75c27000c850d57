"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (for sharding tests)
and 64-bit mode enabled so the f64 value tables ported from the reference
(`/root/reference/tests/`) can be checked at full precision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
