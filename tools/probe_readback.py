#!/usr/bin/env python
"""Re-validate the axon readback-degradation quirk (PERF_NOTES.md).

Measures a small jitted program's steady-state step time, performs ONE
scalar device->host read, then measures again. If the post-read time is
~the pre-read time, readbacks are safe and the synced high-water surfel
bucket (config.sync_surfel_bucket) can be enabled on this backend; if it
is orders of magnitude slower, the read-free design stands.

SAFE TO RUN ONLY IN A THROWAWAY PROCESS: on a degraded-relay session the
slowdown is permanent for the process.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) + 0.1
        return x

    x = jnp.array(np.random.default_rng(0).normal(size=(512, 512)),
                  jnp.float32)

    def measure(n=30):
        r = step(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = step(x)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    print(f"backend: {jax.default_backend()}", flush=True)
    before = measure()
    print(f"step time before any read: {1e3 * before:.3f} ms", flush=True)

    # Phase 1: ASYNC host copy, consumed after it has long completed.
    s = jnp.sum(x)
    try:
        s.copy_to_host_async()
        time.sleep(1.0)
        value = float(s)
        print(f"async-prefetched read ok: {value:.3f}", flush=True)
        after_async = measure()
        print(f"step time after async read: {1e3 * after_async:.3f} ms "
              f"({after_async / max(before, 1e-12):.2f}x)", flush=True)
    except Exception as e:
        print(f"copy_to_host_async failed: {e}", flush=True)

    # Phase 2: the blunt synchronous read.
    value = float(jnp.sum(x))
    print(f"sync scalar read ok: {value:.3f}", flush=True)
    after = measure()
    print(f"step time after sync read: {1e3 * after:.3f} ms", flush=True)
    ratio = after / max(before, 1e-12)
    print(f"ratio: {ratio:.2f}x "
          + ("(degradation CONFIRMED)" if ratio > 5 else "(no degradation)"),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
