#!/usr/bin/env python
"""Final bisect: the real associate_surfels_with_frame vs no-quat variant.

    python tools/probe_op5.py <op>     # real | noquat | quatonly
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
    from badslam_tpu.geometry import se3
    from badslam_tpu.geometry.linalg import rotate3, transform3
    from badslam_tpu.mapping.association import associate_surfels_with_frame
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
    n = 1 << 17
    scene = syn.random_plane_scene(np.random.default_rng(0), 3)
    depth_np, inten_np = syn.render_scene(cam, scene, syn.identity_pose())
    g = np.clip(inten_np * 255, 0, 255).astype(np.uint8)
    frame = preprocess_frame(cam, jnp.array(depth_np),
                             jnp.array(np.stack([g, g, g], -1)),
                             max_depth=cfg.max_depth)
    pos = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    msk = jnp.zeros((n,), jnp.bool_)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)
    jax.block_until_ready((frame.depth, pos))
    floor("setup")

    if op == "real":
        f = jax.jit(lambda pos, nrm, msk, q, t, d, fnx, fny:
                    associate_surfels_with_frame(
                        cam, pos, nrm, msk, q, t, d, fnx, fny,
                        cfg.baseline_fx))
        out = f(pos, nrm, msk, q0, t0v, frame.depth, frame.nx, frame.ny)
        jax.block_until_ready(out.valid)

    elif op == "quatonly":
        @jax.jit
        def f(pos, q, t):
            R = se3.quat_to_matrix(q)
            local = transform3(R, t, pos)
            nl = rotate3(R, pos)
            return local, nl
        jax.block_until_ready(f(pos, q0, t0v))

    elif op == "noquat":
        from badslam_tpu.ops import robust
        from badslam_tpu.ops.interp import gather_nearest
        from badslam_tpu.ops.preprocess import normal_z

        @jax.jit
        def f(positions, normals, surfel_mask, R, frame_t, depth, f_nx,
              f_ny):
            h, w = depth.shape
            local = transform3(R, frame_t, positions)
            lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
            proj = surfel_mask & (lz > 0)
            safe_z = jnp.where(proj, lz, 1.0)
            pxy_x = cam.fx * lx / safe_z + cam.cx
            pxy_y = cam.fy * ly / safe_z + cam.cy
            pxf = jnp.floor(pxy_x)
            pyf = jnp.floor(pxy_y)
            proj &= ((pxy_x >= 0) & (pxy_y >= 0) & (pxf < w) & (pyf < h)
                     & (pxf >= 0) & (pyf >= 0))
            px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
            py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)
            d_pix = gather_nearest(depth, px, py)
            projects = proj & (d_pix > 0)
            nl = rotate3(R, normals)
            nlx, nly, nlz = nl[..., 0], nl[..., 1], nl[..., 2]
            dtype = positions.dtype
            un_x = cam.fx_inv * px.astype(dtype) + cam.cx_inv
            un_y = cam.fy_inv * py.astype(dtype) + cam.cy_inv
            stddev = (robust.DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
                      * jnp.abs(nlx * un_x + nly * un_y + nlz)
                      * (d_pix * d_pix)) / cfg.baseline_fx
            gap = d_pix - lz
            threshold = robust.DEPTH_TUKEY_PARAM * stddev
            fsv = projects & (gap > threshold)
            depth_ok = projects & (jnp.abs(gap) <= threshold)
            facing = (lx * nlx + ly * nly + lz * nlz) <= 0
            m_nx = gather_nearest(f_nx, px, py)
            m_ny = gather_nearest(f_ny, px, py)
            m_nz = normal_z(m_nx, m_ny)
            normal_ok = ((nlx * m_nx + nly * m_ny + nlz * m_nz)
                         >= robust.COS_NORMAL_COMPATIBILITY_THRESHOLD)
            valid = depth_ok & facing & normal_ok
            return (valid, projects, fsv, px, py, pxy_x, pxy_y, lx, ly, lz,
                    nlx, nly, nlz, d_pix, stddev)

        R0 = jnp.eye(3, dtype=jnp.float32)
        jax.block_until_ready(f(pos, nrm, msk, R0, t0v, frame.depth,
                                frame.nx, frame.ny))

    else:
        raise SystemExit(f"unknown op {op}")

    floor("after-op")
    return 0


if __name__ == "__main__":
    sys.exit(main())
