#!/usr/bin/env python
"""Per-stage device-time profile of the full SLAM loop (runs on whatever
backend JAX selects — the real TPU under axon, CPU with JAX_PLATFORMS=cpu).

Uses config.sync_stage_profiling so every BA stage blocks on its outputs
(block_until_ready — a sync, never a value read) and the Timing registry
records real device time per stage. Prints the bench-style setup's timing
report; use it to find where the keyframe-frame budget goes.

    python tools/profile_slam.py [--frames 40] [--width 640 --height 480]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--keyframe_interval", type=int, default=10)
    p.add_argument("--ba_iterations", type=int, default=10)
    p.add_argument("--track_iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.utils.timing import Timing

    from bench import _InMemoryVideo, _render_frames

    cfg = BadSlamConfig(
        num_scales=5,
        keyframe_interval=args.keyframe_interval,
        max_num_ba_iterations_per_keyframe=args.ba_iterations,
        max_surfel_count=1 << 20,
        tracking_max_iterations=args.track_iters,
        enable_loop_detection=False,
        sync_stage_profiling=True,
    )
    rng = np.random.default_rng(0)
    cam = syn.default_camera(args.width, args.height)
    scene = syn.random_plane_scene(rng, num_planes=3)
    gt = syn.smooth_trajectory(args.frames, scale=0.002)
    depths, rgbs = _render_frames(cam, scene, gt, cfg.raw_to_float_depth)

    def one_pass(timed: bool):
        video = _InMemoryVideo(cam, depths, rgbs)
        slam = BadSlam(cfg, video)
        Timing.reset()
        t0 = time.perf_counter()
        for i in range(len(video)):
            slam.process_frame(i)
        jax.block_until_ready(slam.traj_q)
        dt = time.perf_counter() - t0
        return dt

    one_pass(timed=False)  # compile
    dt = one_pass(timed=True)
    print(f"backend: {jax.default_backend()}")
    print(f"{args.frames} frames in {dt:.2f}s = {args.frames / dt:.2f} FPS "
          "(per-stage sync ON — slower than the async pipeline)")
    print(Timing.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
