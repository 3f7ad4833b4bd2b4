"""Device (HBM) memory introspection.

Analog of the reference's GPU memory facilities: cudaMemGetInfo gating the
memory-pressure keyframe merge (bad_slam.cc:962-972) and
PrintGPUMemoryUsage diagnostics. Uses PJRT `Device.memory_stats()` — a
host-side allocator query, NOT a device->host data read (safe in the
steady state)."""

from __future__ import annotations

from typing import Optional


def device_memory_stats(device=None) -> Optional[dict]:
    """Raw PJRT allocator stats dict, or None when the backend doesn't
    report them (CPU usually doesn't)."""
    import jax

    try:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats()
    except Exception:
        return None
    return stats or None


def free_device_memory_mb(device=None) -> Optional[float]:
    """Free HBM in MiB (limit - in-use), or None if unknown."""
    stats = device_memory_stats(device)
    if not stats:
        return None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    in_use = stats.get("bytes_in_use")
    if limit is None or in_use is None:
        return None
    return (limit - in_use) / (1024.0 * 1024.0)


def format_memory_usage(device=None) -> str:
    """PrintGPUMemoryUsage-style one-liner."""
    stats = device_memory_stats(device)
    if not stats:
        return "device memory stats unavailable"
    mb = 1024.0 * 1024.0
    in_use = stats.get("bytes_in_use", 0) / mb
    limit = (stats.get("bytes_limit") or 0) / mb
    peak = stats.get("peak_bytes_in_use", 0) / mb
    return (f"device memory: {in_use:.1f} MiB in use"
            + (f" / {limit:.1f} MiB" if limit else "")
            + (f" (peak {peak:.1f} MiB)" if peak else ""))
