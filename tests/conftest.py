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
