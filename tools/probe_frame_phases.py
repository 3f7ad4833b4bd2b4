#!/usr/bin/env python
"""Serialized per-phase cost of the steady-state frame path (bench config).

Blocks after every phase (upload / preprocess / pyramid / track / update),
so each number is true device+dispatch time with an idle queue. Slower
than the pipelined loop in total, but attributes time honestly.
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

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam, _predict_pose, _frame_update
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.tracking.pairwise import track_frame_pairwise

    from bench import _InMemoryVideo, _render_frames

    frames = 40
    cfg = BadSlamConfig(
        num_scales=5, keyframe_interval=10,
        max_num_ba_iterations_per_keyframe=10,
        max_surfel_count=1 << 20, tracking_max_iterations=30,
        enable_loop_detection=False,
    )
    rng = np.random.default_rng(0)
    cam = syn.default_camera(640, 480)
    scene = syn.random_plane_scene(rng, num_planes=3)
    gt = syn.smooth_trajectory(frames, scale=0.002)
    depths, rgbs = _render_frames(cam, scene, gt, cfg.raw_to_float_depth)
    video = _InMemoryVideo(cam, depths, rgbs)
    slam = BadSlam(cfg, video)

    # Bootstrap: process frame 0 normally (first keyframe + surfels).
    slam.process_frame(0)
    jax.block_until_ready(slam.traj_q)

    acc = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        acc[name] = acc.get(name, 0.0) + (time.perf_counter() - t0)
        return out

    c = cfg
    params = slam.direct_ba.depth_params
    n_run = 0
    for i in range(1, frames):
        if (i % cfg.keyframe_interval) == 0:
            continue  # steady-state frames only
        n_run += 1
        depth_u16 = video.depth_u16(i)
        rgb = video.color_u8(i)
        d_dev = phase("upload_depth", lambda: jnp.array(depth_u16))
        rgb_dev = phase("upload_rgb", lambda: jnp.array(rgb))
        frame = phase("preprocess", lambda: preprocess_frame(
            slam.cam, d_dev, rgb_dev,
            max_depth=c.max_depth,
            sigma_xy=c.bilateral_filter_sigma_xy,
            radius_factor=c.bilateral_filter_radius_factor,
            sigma_inv_depth=c.bilateral_filter_sigma_inv_depth,
            a=params.a, cfactor=params.cfactor,
            cell_size=c.sparse_surfel_cell_size,
            raw_to_float_depth=c.raw_to_float_depth,
        ))
        pyr = phase("pyramid", lambda: build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, c.num_scales))
        n = min(slam._hist_n, 3)
        pred = phase("predict", lambda: _predict_pose(
            slam._hist_q, slam._hist_t, n))
        e1q, e1t, e2q, e2t = pred
        res = phase("track", lambda: track_frame_pairwise(
            slam.cams_pyramid, slam.base_kf_pyramid, pyr,
            e1q, e1t, e2q, e2t,
            baseline_fx=c.baseline_fx, use_depth=True, use_descriptor=True,
            test_two_initial_estimates=(n >= 3),
            max_iterations=c.tracking_max_iterations))
        upd = phase("frame_update", lambda: _frame_update(
            jnp.asarray(slam.base_kf_global_T_frame.q),
            jnp.asarray(slam.base_kf_global_T_frame.t),
            res.q, res.t, slam.traj_q, slam.traj_t,
            slam._hist_q, slam._hist_t, jnp.int32(i)))
        (slam.traj_q, slam.traj_t, slam._hist_q, slam._hist_t,
         _, _) = upd
        slam._hist_n += 1

    print(f"{n_run} steady frames, per-frame phase costs:")
    total = 0.0
    for k, v in acc.items():
        print(f"  {k:<14} {1e3 * v / n_run:8.2f} ms")
        total += v
    print(f"  {'TOTAL':<14} {1e3 * total / n_run:8.2f} ms "
          f"(serialized; pipelined will overlap)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
