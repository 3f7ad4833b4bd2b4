"""Persistent XLA compilation-cache setup.

One shared helper for cli.py, bench.py, tests/conftest.py and the tools:
enables the on-disk compile cache at ``~/.cache/badslam_tpu/xla`` —
**TPU backend only**.

CPU-backend caution (learned the hard way, 2026-08-17): XLA:CPU's
executable (de)serialization is NOT safe on this box. Two distinct fatal
crashes were observed the same day:

  * a hard abort loading a cached entry AOT-compiled on a previous host
    of this migrating VM pool (``cpu_aot_loader`` logs a machine-feature
    mismatch — LLVM tuning pseudo-features like ``prefer-no-scatter``
    are chosen from the CPU *model* — then
    ``compilation_cache.get_executable_and_time`` aborts), and
  * a segfault *serializing* a freshly compiled executable on the cache
    write path (``put_executable_and_time``), with the cache directory
    already host-fingerprinted.

Each killed a full test-suite run. TPU(axon) entries are relay-side
binaries and have shown neither failure mode, so the cache stays on
there (compiles through the relay cost minutes and the cache is
load-bearing). On CPU the cache is simply disabled: a cold compile costs
seconds-to-minutes; a crashed process costs the whole run.
"""

from __future__ import annotations

import os


def enable_compile_cache(min_compile_secs: float = 5.0) -> None:
    """Enable the persistent compilation cache on non-CPU backends
    (idempotent, never raises). Call after the backend choice is final
    (e.g. after a ``jax.config.update("jax_platforms", ...)`` override).
    """
    import jax

    try:
        if jax.default_backend() == "cpu":
            return  # see module docstring: XLA:CPU (de)serialization crashes
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/badslam_tpu/xla"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass
