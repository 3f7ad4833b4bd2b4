import os

# Tests run on CPU with a virtual 8-device mesh for sharding tests.
#
# Env vars alone do NOT work here: the machine's sitecustomize registers the
# axon TPU PJRT plugin at interpreter start and force-sets
# jax_platforms="axon,cpu", so we must override the config after import
# (before any backend initialization).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compile cache, keyed per host CPU: loading a CPU AOT
# entry compiled on a previous host (this VM pool migrates) can abort the
# whole process (see badslam_tpu/utils/cache.py).
import sys  # noqa: E402

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]
from badslam_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_secs=2.0)

# ---------------------------------------------------------------------------
# Memory-map budget: XLA:CPU JIT-compiles every executable into mmap'd code
# sections that stay mapped for as long as jax's jit caches hold the
# executable. Across the full suite that accumulates ~2.6k maps/min on this
# box and crosses the kernel's vm.max_map_count (65530) around the 80th
# test, at which point the next big compile's failed mmap SEGFAULTS the
# process inside LLVM (observed 4x on 2026-08-17, always at the same item:
# the first 8-device shard_map compile after ~40 min of suite; maps sampled
# at 39.7k twelve minutes in). The two compile-cache crashes documented in
# PERF_NOTES.md were earlier symptoms of the same exhaustion. Fix: drop
# jax's compiled-executable caches whenever the map count nears the limit;
# the handful of recompiles this forces is noise next to a dead suite.
import pytest  # noqa: E402


def _raise_map_limit() -> int:
    """Raise vm.max_map_count if we can (root on our own VM); return the
    effective limit. At 262144 the suite never comes near the limit and
    the clear_caches backstop below goes dormant — no forced recompiles."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            limit = int(f.read())
        if limit < 262144:
            with open(path, "w") as f:
                f.write("262144")
            with open(path) as f:
                limit = int(f.read())
        return limit
    except OSError:
        return 65530  # kernel default


_MAP_BUDGET = int(0.7 * _raise_map_limit())


def _map_count() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _jit_cache_map_budget():
    yield
    if _map_count() > _MAP_BUDGET:
        import jax as _jax

        _jax.clear_caches()


# ---------------------------------------------------------------------------
# `slow` marker: multi-minute fixtures (full-SLAM loop-closure runs, long
# scaling probes) are opt-in via --runslow so the DEFAULT suite stays under
# ~15 min on this 1-core box (round-3 verdict #9). CI/builders run the full
# suite with --runslow before each snapshot.
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute fixtures)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test, opt-in via --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
