#!/usr/bin/env python
"""Discriminate the association-degradation trigger.

    python tools/probe_op4.py <op>

Ops:
  realimg_hardcam - preprocess-produced images + hardcoded cam floats
  zeroimg_realcam - jnp.zeros images + traced PinholeCamera pytree
  realimg_realcam - both real (expect degrade)
  sum_consume     - trivial jnp.sum over preprocess outputs
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
    from badslam_tpu.ops.preprocess import preprocess_frame

    @jax.jit
    def tiny(x):
        return x + 1.0

    xx = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(xx))

    def floor(tag):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(tiny(xx))
        dt = (time.perf_counter() - t0) / 10
        print(f"floor {tag:<8} {1e3 * dt:8.2f} ms", flush=True)

    cfg = BadSlamConfig()
    cam = syn.default_camera(640, 480)
    h, w, n = 480, 640, 1 << 17

    scene = syn.random_plane_scene(np.random.default_rng(0), 3)
    depth_np, inten_np = syn.render_scene(cam, scene, syn.identity_pose())
    g = np.clip(inten_np * 255, 0, 255).astype(np.uint8)
    frame = preprocess_frame(cam, jnp.array(depth_np),
                             jnp.array(np.stack([g, g, g], -1)),
                             max_depth=cfg.max_depth)
    zero_img = jnp.zeros((h, w), jnp.float32)
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    jax.block_until_ready((frame.depth, zero_img, pos))
    floor("setup")

    def assoc_like(pos, nrm, msk, depth, fnx, fny, fx, fy, cx, cy):
        lx, ly, lz = pos[..., 0], pos[..., 1], pos[..., 2]
        proj = msk & (lz > 0)
        safe_z = jnp.where(proj, lz, 1.0)
        pxy_x = fx * lx / safe_z + cx
        pxy_y = fy * ly / safe_z + cy
        pxf = jnp.floor(pxy_x)
        pyf = jnp.floor(pxy_y)
        proj &= (pxf >= 0) & (pyf >= 0) & (pxf < w) & (pyf < h)
        px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
        py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
        flat = depth.reshape(-1)
        d_pix = jnp.take(flat, py * w + px, axis=0)
        projects = proj & (d_pix > 0)
        nlx, nly, nlz = nrm[..., 0], nrm[..., 1], nrm[..., 2]
        stddev = 0.1 * jnp.abs(nlx + nly + nlz) * d_pix * d_pix
        gap = d_pix - lz
        fsv = projects & (gap > stddev)
        depth_ok = projects & (jnp.abs(gap) <= stddev)
        facing = (lx * nlx + ly * nly + lz * nlz) <= 0
        m_nx = jnp.take(fnx.reshape(-1), py * w + px, axis=0)
        m_ny = jnp.take(fny.reshape(-1), py * w + px, axis=0)
        m_nz = -jnp.sqrt(jnp.maximum(0.0, 1.0 - m_nx**2 - m_ny**2))
        normal_ok = (nlx * m_nx + nly * m_ny + nlz * m_nz) >= 0.766
        valid = depth_ok & facing & normal_ok
        return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                nlx, nly, nlz, d_pix, stddev)

    if op == "realimg_hardcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, 525.0, 525.0, 320.0, 240.0))
        jax.block_until_ready(f(pos, nrm, msk, frame.depth, frame.nx,
                                frame.ny))

    elif op == "zeroimg_realcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, cam.fx, cam.fy, cam.cx, cam.cy))
        jax.block_until_ready(f(pos, nrm, msk, zero_img, zero_img, zero_img))

    elif op == "realimg_realcam":
        f = jax.jit(lambda pos, nrm, msk, d, fnx, fny: assoc_like(
            pos, nrm, msk, d, fnx, fny, cam.fx, cam.fy, cam.cx, cam.cy))
        jax.block_until_ready(f(pos, nrm, msk, frame.depth, frame.nx,
                                frame.ny))

    elif op == "sum_consume":
        f = jax.jit(lambda d, fnx, fny: jnp.sum(d) + jnp.sum(fnx)
                    + jnp.sum(fny))
        jax.block_until_ready(f(frame.depth, frame.nx, frame.ny))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


if __name__ == "__main__":
    sys.exit(main())
