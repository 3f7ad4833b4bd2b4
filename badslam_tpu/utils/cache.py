"""Persistent XLA compilation-cache setup.

One shared helper for cli.py, bench.py, tests/conftest.py and the tools:
enables the on-disk compile cache at ``~/.cache/badslam_tpu/xla``.

CPU-backend caution (learned the hard way, 2026-08-17): XLA:CPU caches
AOT-compiled machine code specialized to the exact host CPU (including
LLVM tuning pseudo-features like ``prefer-no-scatter`` chosen from the
CPU *model*, not just its ISA flags). This VM pool migrates between
hosts; loading an entry AOT-compiled on a previous host first logs
``cpu_aot_loader ... could lead to execution errors such as SIGILL`` and
can then hard-abort the process (observed killing the test suite inside
``compilation_cache.get_executable_and_time``). TPU(axon) executables
are relay-side binaries and don't have this failure mode.

Fix: CPU cache entries live under a per-host fingerprint subdirectory
(cpu model name + ISA flags), so entries from a different host are never
loaded — a migration costs a cold compile instead of an abort.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Stable-ish fingerprint of the host CPU (model + flags of cpu0)."""
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.strip()
                elif not flags and line.startswith("flags"):
                    flags = line.strip()
                if model and flags:
                    break
    except OSError:
        pass
    return hashlib.sha1(f"{model}\n{flags}".encode()).hexdigest()[:12]


def enable_compile_cache(min_compile_secs: float = 5.0) -> None:
    """Enable the persistent compilation cache (idempotent, never raises).

    Must be called after the backend choice is final (e.g. after a
    ``jax.config.update("jax_platforms", ...)`` override): the CPU
    backend gets the host-fingerprinted subdirectory.
    """
    import jax

    path = os.path.expanduser("~/.cache/badslam_tpu/xla")
    try:
        if jax.default_backend() == "cpu":
            path = os.path.join(path, f"host-{_host_fingerprint()}")
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass
