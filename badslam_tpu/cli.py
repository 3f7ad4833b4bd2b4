"""Command-line entry point.

Rebuild of the reference CLI (applications/badslam/src/badslam/main.cc:69-908):
dataset playback, SLAM, final BA, and exports. Run as

    python -m badslam_tpu.cli <dataset_dir> [options]

Flags mirror doc/command_line.md names where applicable.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

from badslam_tpu.config import BadSlamConfig


def _config_help() -> dict:
    """Per-field help text harvested from badslam_tpu/config.py's own
    comments (inline `# ...` and comment blocks above a field) — the
    analog of the reference's per-parameter help-string constants
    (bad_slam_config.h:41-377), without a second copy to keep in sync."""
    import inspect
    import re

    from badslam_tpu import config as config_mod

    helps = {}
    pending: list = []
    for raw in inspect.getsource(config_mod).splitlines():
        line = raw.strip()
        if line.startswith("# ---") or not line:
            pending = []
            continue
        if line.startswith("#"):
            pending.append(line.lstrip("# ").rstrip())
            continue
        m = re.match(r"(\w+)\s*:\s*\w[\w\[\]\. ]*=\s*[^#]*(?:#\s*(.*))?",
                     line)
        if m:
            name, inline = m.group(1), m.group(2)
            text = " ".join(pending) if pending else (inline or "")
            if text:
                helps[name] = text.strip()
        pending = []
    return helps


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="badslam_tpu",
        description="TPU-native direct RGB-D SLAM (BAD SLAM capabilities)",
    )
    p.add_argument("dataset", nargs="?", default=None,
                   help="TUM/ETH3D-format dataset directory (omit with "
                        "--live)")
    p.add_argument("--trajectory_filename", default=None,
                   help="optional ground-truth/init trajectory in the dataset dir")
    p.add_argument("--live", default=None,
                   help="live input instead of a dataset: 'dir:<path>' "
                        "(follow a frame-drop directory), 'tcp:<port>' "
                        "(binary frame stream), or 'realsense'/'k4a'/"
                        "'structure' (vendor SDK required)")
    p.add_argument("--live_max_frames", type=int, default=10000,
                   help="capacity of the live-mode trajectory buffers")

    # Mirror BadSlamConfig fields as flags automatically, with help text
    # harvested from the config source comments.
    cfg = BadSlamConfig()
    helps = _config_help()
    for f in dataclasses.fields(BadSlamConfig):
        name = f.name
        default = getattr(cfg, name)
        help_text = helps.get(name)
        if isinstance(default, bool):
            p.add_argument(f"--{name}", type=lambda s: s.lower() in
                           ("1", "true", "yes"), default=default,
                           metavar="BOOL", help=help_text)
        elif isinstance(default, int):
            p.add_argument(f"--{name}", type=int, default=default,
                           help=help_text)
        elif isinstance(default, float):
            p.add_argument(f"--{name}", type=float, default=default,
                           help=help_text)
        else:
            p.add_argument(f"--{name}", type=str, default=default,
                           help=help_text)

    # Outputs (main.cc export options).
    p.add_argument("--export_poses", default=None,
                   help="write final trajectory in TUM format to this path")
    p.add_argument("--export_point_cloud", default=None,
                   help="write final surfel cloud as binary PLY")
    p.add_argument("--export_final_timings", default=None,
                   help="write the timing report to this path")
    p.add_argument("--save_timings", default=None,
                   help="stream per-BA-run timing rows to this file "
                        "(reference --save_timings analog; combine with "
                        "--sync_stage_profiling true for per-stage rows)")
    p.add_argument("--save_state", default=None,
                   help="write a full state snapshot (.npz) after the run")
    p.add_argument("--load_state", default=None,
                   help="resume from a state snapshot before processing")
    p.add_argument("--export_calibration", default=None,
                   help="write calibration text files with this prefix")
    p.add_argument("--export_viewer", default=None,
                   help="write a self-contained HTML map viewer to this path")
    p.add_argument("--live_viewer_dir", default=None,
                   help="serve a quasi-live map view from this directory "
                        "(snapshot every --live_viewer_interval keyframes; "
                        "each snapshot is a device sync — do not benchmark "
                        "with this on)")
    p.add_argument("--live_viewer_port", type=int, default=8765,
                   help="HTTP port for --live_viewer_dir (0 = random)")
    p.add_argument("--live_viewer_interval", type=int, default=5,
                   help="keyframes between live-viewer snapshots")
    p.add_argument("--final_ba", action="store_true",
                   help="run windowed + global final BA after the frame loop")
    p.add_argument("--final_ba_window_size", type=int, default=16)
    p.add_argument("--final_ba_window_stride", type=int, default=8)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--autotune", action="store_true",
                   help="tune kernel parameters for this dataset's image "
                        "size before running (persisted; one-time cost)")
    p.add_argument("--profile", default=None,
                   help="capture a JAX profiler trace of the run into this "
                        "directory (view with xprof/tensorboard)")
    return p


def config_from_args(args) -> BadSlamConfig:
    kwargs = {}
    for f in dataclasses.fields(BadSlamConfig):
        if hasattr(args, f.name):
            kwargs[f.name] = getattr(args, f.name)
    return BadSlamConfig(**kwargs)



def _recover_by_exec(slam, args, err) -> None:
    """Save a full state snapshot and replace this process with a fresh
    one resuming via --load_state (the session degradation is per-process;
    see utils/watchdog.py). Never returns."""
    import tempfile

    from badslam_tpu.io.state import save_state
    from badslam_tpu.utils.logging import warning

    path = os.path.join(
        tempfile.gettempdir(),
        f"badslam_recover_{os.getpid()}.npz")
    save_state(slam, path)
    slam.close()
    warning(
        "RECOVERY: session degraded after frame %d — state saved to %s, "
        "exec'ing a fresh process to resume (recovery event #%d)",
        err.last_frame_index, path,
        int(os.environ.get("BADSLAM_RECOVERY_COUNT", "0")) + 1)
    new_argv = []
    skip = False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a == "--load_state":
            skip = True
            continue
        if a.startswith("--load_state="):
            continue
        new_argv.append(a)
    new_argv += ["--load_state", path]
    env = dict(os.environ)
    env.pop("BADSLAM_FAKE_DEGRADE_AT", None)  # injection fires only once
    env["BADSLAM_RECOVERY_COUNT"] = str(
        int(env.get("BADSLAM_RECOVERY_COUNT", "0")) + 1)
    if int(env["BADSLAM_RECOVERY_COUNT"]) > 3:
        raise RuntimeError(
            "giving up: the session degraded again after 3 recovery "
            "restarts") from err
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "badslam_tpu.cli"] + new_argv, env)


def main(argv=None) -> int:
    # Persistent XLA compilation cache: tracker/BA compiles through the
    # axon relay take minutes; caching makes reruns start in seconds.
    # (Host-fingerprinted on CPU — see badslam_tpu/utils/cache.py.)
    # BADSLAM_PLATFORM=cpu forces the CPU backend (tests / machines whose
    # sitecustomize force-registers a TPU plugin: the env var alone is not
    # honored there, the config must be set after importing jax).
    plat = os.environ.get("BADSLAM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.io.dataset import load_tum_dataset
    from badslam_tpu.utils.timing import Timing

    profiler_cm = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profiler_cm = True

    live_input = None
    if args.live:
        from badslam_tpu.io.live_inputs import open_live_input

        live_input = open_live_input(args.live, config)
        video = live_input.start(
            max_frames=args.live_max_frames,
            depth_scaling=1.0 / config.raw_to_float_depth,
        )
    elif args.dataset:
        video = load_tum_dataset(args.dataset, args.trajectory_filename)
    else:
        build_parser().error("either a dataset directory or --live is "
                             "required")
    if args.autotune:
        from badslam_tpu.ops.pallas_kernels import autotune_preprocess

        lvl = 2 ** config.pyramid_level_for_depth
        autotune_preprocess(video.camera.height // lvl,
                            video.camera.width // lvl,
                            max_depth=config.max_depth)
    if args.load_state:
        from badslam_tpu.io.state import load_state

        slam = load_state(args.load_state, video)
        start = slam.last_frame_index + 1
    else:
        slam = BadSlam(config, video)
        start = None
    timings_file = None
    if args.save_timings:
        timings_file = open(args.save_timings, "w")
        slam.direct_ba.set_save_timings(timings_file)
    live = None
    if args.live_viewer_dir:
        from badslam_tpu.viz.viewer import LiveViewer

        live = LiveViewer(args.live_viewer_dir, port=args.live_viewer_port,
                          interval=args.live_viewer_interval)
        slam.live_viewer = live
        print(f"live viewer: http://127.0.0.1:{live.port}/index.html")
    from badslam_tpu.utils.watchdog import DegradedSessionError

    try:
        if live_input is not None:
            try:
                slam.run_live(progress=not args.quiet)
            finally:
                live_input.stop()
        else:
            slam.run(start=start, progress=not args.quiet)
    except DegradedSessionError as e:
        # Degradation RECOVERY (round-3 verdict #5; the act-on-detection
        # analog of the reference's OOM guard, bad_slam.cc:962-972): the
        # per-kernel sync fallback is per-PROCESS, so the only cure is a
        # fresh process. Snapshot the full SLAM state and exec a new
        # process that resumes from it — load_state restarts the frame
        # loop at last_frame_index + 1 with all map/pose/BA state intact.
        if live_input is not None or argv is not None:
            # Live streams can't be resumed from a snapshot (frames are
            # gone), and in-process callers (tests/libraries) must handle
            # recovery themselves: re-raise.
            raise
        _recover_by_exec(slam, args, e)

    if args.final_ba:
        slam.final_bundle_adjustment(
            args.final_ba_window_size, args.final_ba_window_stride
        )

    if profiler_cm:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}")

    if args.export_poses:
        slam.export_trajectory(args.export_poses)
        print(f"poses written to {args.export_poses}")
    if args.export_point_cloud:
        slam.export_point_cloud(args.export_point_cloud)
        print(f"point cloud written to {args.export_point_cloud}")
    if args.export_viewer:
        from badslam_tpu.viz import export_html_viewer

        export_html_viewer(slam, args.export_viewer)
        print(f"viewer written to {args.export_viewer}")
    if args.save_state:
        from badslam_tpu.io.state import save_state

        save_state(slam, args.save_state)
        print(f"state written to {args.save_state}")
    if args.export_calibration:
        from badslam_tpu.io.state import save_calibration

        save_calibration(slam.cam, slam.direct_ba.depth_params,
                         args.export_calibration)
    if live is not None:
        live.snapshot(slam)  # final state
        live.close()
    if timings_file is not None:
        timings_file.close()
    if args.export_final_timings:
        Timing.save(args.export_final_timings)
    if not args.quiet:
        from badslam_tpu.utils.memory import format_memory_usage

        print(Timing.report())
        print(format_memory_usage())  # PrintGPUMemoryUsage analog
    slam.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
