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
    p.add_argument("--chrono", action="store_true",
                   help="TPU evidence mode: run through the library (same "
                        "disk-IO/preload/undistortion path), print the FPS "
                        "line BEFORE any device read, and extract the ATE "
                        "via the chronometric timing channel "
                        "(utils/timeread.py) — on the axon relay every "
                        "post-run D2H read crashes or hangs the TPU worker "
                        "(PERF_NOTES round 5), so --export_poses cannot "
                        "finish there. Synthetic sequences only (index-"
                        "associated gt). Exports are attempted afterwards "
                        "as a bounded best-effort postscript.")
    args = p.parse_args(argv)

    import jax

    # BADSLAM_PLATFORM=cpu forces the CPU backend (the machine's
    # sitecustomize force-registers the axon TPU plugin; the config must
    # be set after importing jax). The non-chrono path repeats this inside
    # cli.main — harmless; the chrono path needs it HERE.
    plat = os.environ.get("BADSLAM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

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

    if args.chrono:
        return _chrono_main(args, dataset)

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


def _chrono_main(args, dataset: str) -> int:
    """TPU evidence path: library-driven run (same loader/preload/
    undistortion as the CLI), evidence-first output ordering, ATE via the
    chronometric channel, exports as a bounded postscript. Mirrors the
    bench long-run child's read discipline (bench.py `_longrun_child`)."""
    import threading

    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.io.dataset import load_tum_dataset
    from badslam_tpu.utils import timeread

    video = load_tum_dataset(dataset, args.gt)
    n_frames = len(video)
    cfg = BadSlamConfig(
        keyframe_interval=args.keyframe_interval,
        max_num_ba_iterations_per_keyframe=args.ba_iterations,
        max_keyframe_count=args.max_keyframe_count,
        use_pcg=args.use_pcg,
        median_filter_and_densify_iterations=args.median,
        enable_loop_detection=not args.no_loop,
        fps_restriction=0,
    )

    # Pre-pay the chrono channel + the on-device ATE executable BEFORE the
    # run (post-run compiles through the relay cost minutes and expired
    # the first round-5 chrono attempt).
    warm = timeread.chrono_warmup(unit_ms=25.0, deadline_s=900.0)
    z = np.zeros((n_frames, 3), np.float32)
    jax.block_until_ready(syn.ate_rmse_device(jnp.asarray(z), z))

    slam = BadSlam(cfg, video)
    t0 = time.perf_counter()
    slam.run(progress=False)
    if args.final_ba:
        slam.final_bundle_adjustment()
    jax.block_until_ready(slam.traj_q)
    wall = time.perf_counter() - t0
    out = {
        "ok": True,
        "frames": n_frames,
        "wall_s": round(wall, 2),
        "fps": round(n_frames / wall, 2),
        "align": "se3",
        "backend": jax.default_backend(),
        "chrono_warmup": {k: warm[k] for k in ("unit_ms", "reps",
                                               "elapsed_s")},
        "final_ba": bool(args.final_ba),
        "use_pcg": bool(args.use_pcg),
    }
    print(json.dumps(out), flush=True)  # evidence BEFORE any read risk

    # Ground truth positions, index-associated (the synthetic writer emits
    # one gt line per frame in order).
    gt_path = os.path.join(dataset, args.gt)
    gt = np.loadtxt(gt_path, comments="#")
    gt_t = np.asarray(gt[:, 1:4], np.float32)
    n = min(slam.traj_t.shape[0], len(gt_t), n_frames)
    try:
        a = timeread.chronometric_read(
            syn.ate_rmse_device(slam.traj_t[:n], gt_t[:n]),
            scale=1e7, digits=8, deadline_s=600.0)
        out["ate_rmse_m"] = a["value"]
        out["ate_read"] = {"channel": "chronometric",
                           "checksum_ok": a["checksum_ok"],
                           "unit_ms": a["unit_ms"],
                           "elapsed_s": a["elapsed_s"]}
    except Exception as e:
        out["ate_error"] = repr(e)[:160]
    print(json.dumps(out), flush=True)

    # Best-effort export postscript on a bounded daemon thread: the D2H
    # inside export_trajectory is exactly the read that crashes/hangs the
    # relay post-run; a failure here must not take the evidence with it.
    est_path = os.path.join(dataset, "validate_est.txt")
    box = {}

    def _export():
        try:
            slam.export_trajectory(est_path)
            box["ok"] = True
        except Exception as e:  # pragma: no cover - relay faults
            box["e"] = repr(e)[:160]

    th = threading.Thread(target=_export, daemon=True)
    th.start()
    th.join(120.0)
    out["export"] = ("ok" if box.get("ok")
                     else box.get("e", "hung > 120s; abandoned"))
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # a wedged export read cannot be joined at teardown


if __name__ == "__main__":
    sys.exit(main())
