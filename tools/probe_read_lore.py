"""Re-test the read-degradation lore on the current relay build.

PERF_NOTES.md (2026-08-16) established that ONE device->host value read
permanently degrades the axon session ~1000x (per-kernel sync fallback).
The whole read-free architecture rests on that measurement. This probe
re-checks it cheaply: time the watchdog canary program (64 sequential
fusions), do one scalar read, time the canary again, read again, and
print the three timings. If post-read canary time stays <10 ms the lore
no longer holds on this relay build and mid-run reads become an option
(e.g. reading long-run ATE before the D2H wedge threshold).

Run on the TPU: `python tools/probe_read_lore.py`.
"""
import sys
import time

sys.path[:0] = ["/root/repo"]

import numpy as np


def median_canary_s(reps: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.watchdog import _canary_fn

    fn = _canary_fn()
    x = jnp.asarray(np.float32(0.5))
    jax.block_until_ready(fn(x))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})", flush=True)

    t_before = median_canary_s()
    print(f"canary before any read: {1e3 * t_before:.2f} ms", flush=True)

    x = jnp.asarray(np.float32(41.0)) + 1.0
    t0 = time.perf_counter()
    v = float(x)  # THE read
    print(f"read #1: value={v} in {time.perf_counter() - t0:.3f} s",
          flush=True)

    t_after1 = median_canary_s()
    print(f"canary after 1 read: {1e3 * t_after1:.2f} ms "
          f"({t_after1 / max(t_before, 1e-9):.1f}x)", flush=True)

    for i in range(2, 5):
        t0 = time.perf_counter()
        v = float(jnp.asarray(np.float32(i)) * 2.0)
        print(f"read #{i}: value={v} in {time.perf_counter() - t0:.3f} s",
              flush=True)

    t_after4 = median_canary_s()
    print(f"canary after 4 reads: {1e3 * t_after4:.2f} ms "
          f"({t_after4 / max(t_before, 1e-9):.1f}x)", flush=True)
    verdict = "LORE HOLDS (degraded)" if t_after4 > 10 * t_before + 0.01 \
        else "lore NOT reproduced on this build"
    print(verdict, flush=True)


if __name__ == "__main__":
    main()
