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
# Persistent XLA compile cache (same dir cli.py/bench.py use): repeated
# suite runs skip recompiling the fused tracker/BA programs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/badslam_tpu/xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
