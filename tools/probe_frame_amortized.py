#!/usr/bin/env python
"""Amortized per-phase cost (N back-to-back calls, ONE sync) of the
steady-state frame path with bench-config args — true device+dispatch
cost without per-call sync latency. Compare with probe_frame_phases.py
(serialized) to expose the relay's per-sync overhead.
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
    from badslam_tpu.frontend import BadSlam, _predict_pose
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.tracking.pairwise import track_frame_pairwise

    from bench import _InMemoryVideo, _render_frames

    frames = 12
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
    slam.process_frame(0)
    slam.process_frame(1)
    jax.block_until_ready(slam.traj_q)

    c = cfg
    params = slam.direct_ba.depth_params
    d_dev = jnp.array(video.depth_u16(2))
    rgb_dev = jnp.array(video.color_u8(2))

    def run_preprocess():
        return preprocess_frame(
            slam.cam, d_dev, rgb_dev,
            max_depth=c.max_depth,
            sigma_xy=c.bilateral_filter_sigma_xy,
            radius_factor=c.bilateral_filter_radius_factor,
            sigma_inv_depth=c.bilateral_filter_sigma_inv_depth,
            a=params.a, cfactor=params.cfactor,
            cell_size=c.sparse_surfel_cell_size,
            raw_to_float_depth=c.raw_to_float_depth,
        )

    frame = run_preprocess()

    def run_pyramid():
        return build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, c.num_scales)

    pyr = run_pyramid()
    e1q, e1t, e2q, e2t = _predict_pose(slam._hist_q, slam._hist_t, 2)

    def run_track():
        return track_frame_pairwise(
            slam.cams_pyramid, slam.base_kf_pyramid, pyr,
            e1q, e1t, e2q, e2t,
            baseline_fx=c.baseline_fx, use_depth=True, use_descriptor=True,
            test_two_initial_estimates=False,
            max_iterations=c.tracking_max_iterations)

    def bench(name, fn, n=16):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:<12} {1e3 * dt:8.2f} ms/call (amortized over {n})",
              flush=True)

    bench("preprocess", run_preprocess)
    bench("pyramid", run_pyramid)
    bench("predict", lambda: _predict_pose(slam._hist_q, slam._hist_t, 2))
    bench("track", run_track)

    # Serialized single-call (sync per call) comparison
    def bench_sync(name, fn, n=8):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / n
        print(f"{name:<12} {1e3 * dt:8.2f} ms/call (synced per call)",
              flush=True)

    bench_sync("preprocess", run_preprocess)
    bench_sync("pyramid", run_pyramid)
    bench_sync("predict", lambda: _predict_pose(slam._hist_q, slam._hist_t, 2))
    bench_sync("track", run_track)
    return 0


if __name__ == "__main__":
    sys.exit(main())
