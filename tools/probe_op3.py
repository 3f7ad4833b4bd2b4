#!/usr/bin/env python
"""Build-up bisect toward the full association program.

    python tools/probe_op3.py <op>

Ops:
  assoc_small    - full association, N=4096
  assoc_big      - full association, N=131072 (known to degrade)
  assoc_few_out  - full association math, but return only `valid`
  assoc_no_rot   - full association, no quat_to_matrix (identity R)
  g3             - 3 gathers + projection math, 15 outputs
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

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.mapping.association import associate_surfels_with_frame

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

    cfg = BadSlamConfig()
    cam = syn.default_camera(640, 480)
    h, w = 480, 640
    img = jnp.zeros((h, w), jnp.float32)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)

    n = 4096 if op == "assoc_small" else 1 << 17
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    jax.block_until_ready((img, pos))
    floor("setup")

    if op in ("assoc_small", "assoc_big"):
        fn = jax.jit(lambda: associate_surfels_with_frame(
            cam, pos, nrm, msk, q0, t0v, img, img, img, cfg.baseline_fx))
        jax.block_until_ready(fn().valid)

    elif op == "assoc_few_out":
        fn = jax.jit(lambda: associate_surfels_with_frame(
            cam, pos, nrm, msk, q0, t0v, img, img, img,
            cfg.baseline_fx).valid)
        jax.block_until_ready(fn())

    elif op == "assoc_no_rot":
        @jax.jit
        def fn():
            local = pos + t0v
            lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
            proj = msk & (lz > 0)
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = cam.fx * lx / safe_z + cam.cx
            pxy_y = cam.fy * ly / safe_z + cam.cy
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            flat = img.reshape(-1)
            d_pix = jnp.take(flat, py * w + px, axis=0)
            projects = proj & (d_pix > 0)
            nlx, nly, nlz = nrm[..., 0], nrm[..., 1], nrm[..., 2]
            un_x = cam.fx_inv * px.astype(jnp.float32) + cam.cx_inv
            un_y = cam.fy_inv * py.astype(jnp.float32) + cam.cy_inv
            stddev = 0.1 * jnp.abs(nlx * un_x + nly * un_y + nlz) * d_pix**2
            gap = d_pix - lz
            fsv = projects & (gap > stddev)
            depth_ok = projects & (jnp.abs(gap) <= stddev)
            facing = (lx * nlx + ly * nly + lz * nlz) <= 0
            m_nx = jnp.take(flat, py * w + px, axis=0)
            m_ny = jnp.take(flat, py * w + px, axis=0)
            normal_ok = (nlx * m_nx + nly * m_ny) >= 0.766
            valid = depth_ok & facing & normal_ok
            return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                    nlx, nly, nlz, d_pix, stddev)
        jax.block_until_ready(fn())

    elif op == "g3":
        @jax.jit
        def fn():
            lz = pos[..., 2]
            safe_z = jnp.where(lz > 0, lz, 1.0)
            px = jnp.clip(jnp.floor(cam.fx * pos[..., 0] / safe_z
                                    + cam.cx).astype(jnp.int32), 0, w - 1)
            py = jnp.clip(jnp.floor(cam.fy * pos[..., 1] / safe_z
                                    + cam.cy).astype(jnp.int32), 0, h - 1)
            flat = img.reshape(-1)
            a = jnp.take(flat, py * w + px, axis=0)
            b = jnp.take(flat, py * w + px + 1, axis=0)
            c = jnp.take(flat, py * w + px + 2, axis=0)
            return a, b, c, px, py, lz, a + b, b + c, a * c, a - b, c - a,
        jax.block_until_ready(fn())

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


if __name__ == "__main__":
    sys.exit(main())
