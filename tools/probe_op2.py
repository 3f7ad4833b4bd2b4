#!/usr/bin/env python
"""Fine-grained bisect of the association op's relay degradation.

    python tools/probe_op2.py <op>

Ops:
  gather_flat   - jnp.take of [N] indices from a flat VGA image
  gather_2d     - img[py, px] advanced indexing
  math_only     - association arithmetic without any gather
  proj_gather   - projection + single gather (no normals/stddev)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    op = sys.argv[1]

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/badslam_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x))

    def floor(tag):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(tiny(x))
        dt = (time.perf_counter() - t0) / 10
        print(f"floor {tag:<8} {1e3 * dt:8.2f} ms", flush=True)

    h, w, n = 480, 640, 1 << 17
    img = jnp.zeros((h, w), jnp.float32)
    px = jnp.zeros((n,), jnp.int32)
    py = jnp.zeros((n,), jnp.int32)
    pos = jnp.zeros((n, 3), jnp.float32)
    jax.block_until_ready((img, px, py, pos))
    floor("setup")

    if op == "gather_flat":
        fn = jax.jit(lambda img, px, py: jnp.take(
            img.reshape(-1), (py * w + px).reshape(-1), axis=0))
        jax.block_until_ready(fn(img, px, py))

    elif op == "gather_2d":
        fn = jax.jit(lambda img, px, py: img[py, px])
        jax.block_until_ready(fn(img, px, py))

    elif op == "math_only":
        @jax.jit
        def fn(pos):
            lx, ly, lz = pos[..., 0], pos[..., 1], pos[..., 2]
            proj = lz > 0
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = 500.0 * lx / safe_z + 320.0
            pxy_y = 500.0 * ly / safe_z + 240.0
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            return proj, px, py
        jax.block_until_ready(fn(pos))

    elif op == "proj_gather":
        @jax.jit
        def fn(pos, img):
            lz = pos[..., 2]
            proj = lz > 0
            safe_z = jnp.where(proj, lz, 1.0)
            pxf = jnp.floor(500.0 * pos[..., 0] / safe_z + 320.0)
            pyf = jnp.floor(500.0 * pos[..., 1] / safe_z + 240.0)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            d = jnp.take(img.reshape(-1), (py * w + px).reshape(-1), axis=0)
            return proj & (d > 0)
        jax.block_until_ready(fn(pos, img))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


if __name__ == "__main__":
    sys.exit(main())
