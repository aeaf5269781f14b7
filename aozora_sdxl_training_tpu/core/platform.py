"""Platform/runtime helpers shared by CLIs and tools.

Centralizes the environment knobs:
* ``AOZORA_PLATFORM`` — force a JAX platform (the container's sitecustomize
  pins JAX_PLATFORMS to the TPU plugin in a way env vars can't override, so
  this goes through jax.config after import);
* persistent XLA compilation cache (first full-UNet compile through the
  remote-TPU tunnel is minutes; subsequent runs hit the disk cache);
* device memory statistics for the reporter's "VRAM" line.
"""

from __future__ import annotations

import os


def apply_platform_override(default: str | None = None) -> None:
    """Honor AOZORA_PLATFORM (cpu / tpu) before any device use."""
    platform = os.environ.get("AOZORA_PLATFORM", default)
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    cache_dir = path or os.environ.get("AOZORA_COMPILE_CACHE", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def device_memory_gb() -> tuple[float, float]:
    """(peak_or_limit_gb, in_use_gb) for the first accelerator."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0) / 1e9
        limit = stats.get("bytes_reservable_limit",
                          stats.get("bytes_limit", 0)) / 1e9
        peak = stats.get("peak_bytes_in_use", in_use) / 1e9
        return peak or limit, in_use
    except Exception:  # noqa: BLE001 — CPU/driver without memory stats
        return 0.0, 0.0
