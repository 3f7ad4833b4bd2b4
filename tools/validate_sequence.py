#!/usr/bin/env python
"""Long-sequence end-to-end validation: full SLAM (tracking + keyframe-rate
BA + loop detection + final BA) over a synthetic TUM dataset, evaluated
with the TUM ATE protocol (tools/evaluate_ate.py).

This is the harness behind BASELINE.md's accuracy target: point it at any
real TUM/ETH3D directory with --dataset the moment one is mounted; without
one it generates a synthetic sequence. Prints one JSON summary line.

    python tools/validate_sequence.py [--frames 240] [--width 320]
    python tools/validate_sequence.py --dataset /data/eth3d/seq --gt groundtruth.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=None,
                   help="existing TUM/ETH3D dataset dir (else synthetic)")
    p.add_argument("--gt", default="groundtruth.txt")
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--keyframe_interval", type=int, default=10)
    p.add_argument("--ba_iterations", type=int, default=10)
    p.add_argument("--max_keyframe_count", type=int, default=512)
    p.add_argument("--final_ba", action="store_true")
    p.add_argument("--no_loop", action="store_true")
    p.add_argument("--use_pcg", action="store_true",
                   help="final BA uses the global PCG solver")
    p.add_argument("--distorted", action="store_true",
                   help="render through a radtan camera (the pipeline then "
                        "undistorts on device inside the fused frame — the "
                        "real-ETH3D input shape)")
    p.add_argument("--median", type=int, default=0,
                   help="median_filter_and_densify_iterations")
    p.add_argument("--depth_noise", type=float, default=0.0,
                   help="sigma = depth_noise * d^2 (stereo sensor model)")
    p.add_argument("--align", default="se3", choices=["se3", "sim3", "none"])
    args = p.parse_args(argv)

    import jax

    # TPU-only guarded persistent compile cache (utils/cache.py — never
    # set the config keys directly; XLA:CPU (de)serialization crashes on
    # this VM pool).
    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.cli import main as cli_main

    if args.dataset is None:
        dataset = tempfile.mkdtemp(prefix="badslam_validate_")
        cam = syn.default_camera(args.width, args.height)
        scene = syn.random_plane_scene(np.random.default_rng(11), 6)
        gt = syn.smooth_trajectory(args.frames, scale=0.003)
        syn.write_tum_dataset(
            dataset, cam, scene, gt,
            distortion=(-0.28, 0.07, 0.0002, -0.0001) if args.distorted
            else None,
            depth_noise=args.depth_noise,
        )
    else:
        dataset = args.dataset

    est_path = os.path.join(dataset, "validate_est.txt")
    cli_args = [
        dataset,
        "--keyframe_interval", str(args.keyframe_interval),
        "--max_num_ba_iterations_per_keyframe", str(args.ba_iterations),
        "--max_keyframe_count", str(args.max_keyframe_count),
        "--export_poses", est_path,
        "--quiet",
    ]
    if args.final_ba:
        cli_args.append("--final_ba")
    if args.use_pcg:
        cli_args += ["--use_pcg", "true"]
    if args.median:
        cli_args += ["--median_filter_and_densify_iterations",
                     str(args.median)]
    if args.no_loop:
        cli_args += ["--enable_loop_detection", "false"]
    t0 = time.perf_counter()
    rc = cli_main(cli_args)
    wall = time.perf_counter() - t0
    if rc != 0:
        print(json.dumps({"ok": False, "rc": rc}))
        return rc

    from tools.evaluate_ate import associate_and_evaluate

    gt_path = os.path.join(dataset, args.gt)
    stats = associate_and_evaluate(est_path, gt_path, align=args.align)
    n_frames = args.frames if args.dataset is None else stats.get("pairs", 0)
    print(json.dumps({
        "ok": True,
        "frames": n_frames,
        "wall_s": round(wall, 2),
        "fps": round(n_frames / wall, 2),
        "ate_rmse_m": stats["rmse"],
        "align": args.align,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
