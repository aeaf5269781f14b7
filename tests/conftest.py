"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device sharding tests run on fake CPU devices so the suite never needs
real TPU hardware; single-device numerics still exercise the same code paths.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
