#!/usr/bin/env python
"""Measure host->device upload cost by dtype and method on the relay."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    import jax
    import jax.numpy as jnp

    h, w = 480, 640
    arrays = {
        "u16": np.random.randint(0, 1000, (h, w), np.uint16),
        "u8rgb": np.random.randint(0, 255, (h, w, 3), np.uint8),
        "f32": np.random.rand(h, w).astype(np.float32),
        "i32": np.random.randint(0, 1000, (h, w), np.int32),
    }

    @jax.jit
    def consume(x):
        return x.astype(jnp.float32).sum()

    for name, a in arrays.items():
        for method in ("jnp.array", "device_put"):
            up = (lambda a=a: jnp.array(a)) if method == "jnp.array" \
                else (lambda a=a: jax.device_put(a))
            jax.block_until_ready(consume(up()))
            t0 = time.perf_counter()
            for _ in range(20):
                r = consume(up())
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 20
            print(f"{name:>6} {method:>11}: {1e3 * dt:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
