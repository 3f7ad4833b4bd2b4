#!/usr/bin/env python
"""Reproduce + attribute the headline chunked-pass decay (BENCH r04).

Observed in the r04 driver bench (value_runs): chunked passes collapsed
526 -> 49 -> 52 FPS while the per-frame passes interleaved between them
stayed healthy (305/231/277) — so the decay is specific to the CHUNKED
path, not session-wide degradation. This probe runs the exact headline
configuration (bench.bench_slam: 60 VGA frames, loop detection off) and
prints per-pass FPS with the dispatch-loop wall time separated from the
final block_until_ready wall time, plus per-pass Timing deltas
(chunk upload vs fused dispatch), for a scripted pass sequence.

    python tools/probe_chunk_decay.py            # ch x6, pf x3, ch x3
    python tools/probe_chunk_decay.py bench      # warm, then (ch, pf) x3

NO device value reads anywhere (PERF_NOTES.md read rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    # TPU-only guarded cache (utils/cache.py): XLA:CPU executable
    # (de)serialization crashes on this VM pool — never set the config
    # keys directly (advisor r04).
    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    import jax

    import bench
    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.utils.timing import Timing

    rng = np.random.default_rng(0)
    cam = syn.default_camera(bench.WIDTH, bench.HEIGHT)
    scene = syn.random_plane_scene(rng, num_planes=3)

    cfg = BadSlamConfig(
        num_scales=bench.NUM_SCALES,
        keyframe_interval=bench.KEYFRAME_INTERVAL,
        max_num_ba_iterations_per_keyframe=bench.BA_ITERATIONS,
        max_surfel_count=1 << 20,
        tracking_max_iterations=bench.TRACK_ITERS,
        enable_loop_detection=False,
        fps_restriction=0,
    )
    gt = syn.smooth_trajectory(bench.SLAM_FRAMES, scale=0.002)
    depths, rgbs = bench._render_frames(cam, scene, gt,
                                        cfg.raw_to_float_depth)

    cleanup = os.environ.get("PROBE_CLEANUP", "0") != "0"

    def one_pass(chunking: bool, tag: str):
        if cleanup:  # drop prior passes' device buffers before timing
            import gc

            gc.collect()
        video = bench._InMemoryVideo(cam, depths, rgbs)
        slam = BadSlam(
            dataclasses.replace(cfg, steady_frame_chunking=chunking), video)
        snap0 = Timing.snapshot()
        t0 = time.perf_counter()
        slam.process_frames(0, len(video))
        t_loop = time.perf_counter() - t0
        jax.block_until_ready(slam.traj_q)
        t_all = time.perf_counter() - t0
        phases = {k: round(v, 3) for k, v in sorted(
            Timing.delta(snap0, Timing.snapshot()).items(),
            key=lambda kv: -kv[1])[:5]}
        print(json.dumps({
            "pass": tag, "chunking": chunking,
            "fps": round(bench.SLAM_FRAMES / t_all, 1),
            "loop_s": round(t_loop, 3),
            "tail_block_s": round(t_all - t_loop, 3),
            "phases_s": phases,
        }), flush=True)
        return slam

    mode = sys.argv[1] if len(sys.argv) > 1 else "script"
    print(json.dumps({"mode": mode, "frames": bench.SLAM_FRAMES,
                      "size": [bench.WIDTH, bench.HEIGHT]}), flush=True)

    # Warmups (compile; persistent cache makes later processes cheap).
    one_pass(True, "warm-ch")
    one_pass(False, "warm-pf")

    if mode == "bench":  # the exact bench_slam order
        for i in range(3):
            one_pass(True, f"ch{i + 1}")
            one_pass(False, f"pf{i + 1}")
    else:
        for i in range(6):
            one_pass(True, f"ch{i + 1}")
        for i in range(3):
            one_pass(False, f"pf{i + 1}")
        for i in range(3):
            one_pass(True, f"ch-again{i + 1}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
