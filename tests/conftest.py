"""Test config: force an 8-device virtual CPU mesh before any test runs.

The container's sitecustomize force-registers the axon TPU backend and sets
``JAX_PLATFORMS=axon`` in a way plain env vars can't override, so we override
through jax.config *after* import.  Multi-device sharding tests then run on
fake CPU devices; the real chip stays free for benchmarks.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
