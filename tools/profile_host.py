#!/usr/bin/env python
"""cProfile of the host side of the full SLAM loop (bench configuration).

Shows where wall time goes on the host: uploads, dispatch, numpy, python.
Device work is async; anything big here is host-blocking.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    import jax

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam

    from bench import _InMemoryVideo, _render_frames

    frames = 60
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

    def one_pass():
        video = _InMemoryVideo(cam, depths, rgbs)
        slam = BadSlam(cfg, video)
        t0 = time.perf_counter()
        for i in range(len(video)):
            slam.process_frame(i)
        jax.block_until_ready(slam.traj_q)
        return time.perf_counter() - t0

    print(f"warmup: {one_pass():.2f}s", flush=True)
    prof = cProfile.Profile()
    prof.enable()
    dt = one_pass()
    prof.disable()
    print(f"timed: {dt:.2f}s = {frames / dt:.2f} FPS", flush=True)
    prof.dump_stats("/tmp/host_profile.pstats")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(35)
    print("\n=== callers of apply_primitive ===", flush=True)
    st.print_callers("dispatch.py:84")
    print("\n=== callers of array_constructors.array ===", flush=True)
    st.print_callers("array_constructors.py:85")
    return 0


if __name__ == "__main__":
    sys.exit(main())
