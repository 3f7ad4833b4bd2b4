#!/usr/bin/env python
"""D2H-wedge bisection, stage 2: find WHEN in the real QVGA long-run the
transfer path wedges (PERF_NOTES.md; stage 1 = tools/probe_wedge.py found
no synthetic trigger).

Reproduces bench.py's long-run setup EXACTLY (same cfg, same 120-frame
video length, so prebudgeted shapes hit the warm persistent cache), but
stops processing after `n` frames, then attempts ONE sentinel read with a
hang timeout. One process per cut point: the wedge is per-process state,
and a SUCCESSFUL read would degrade the session (PERF_NOTES.md) so only
one attempt per process is meaningful.

Usage:  python tools/probe_wedge_slam.py <n_frames> [flags]
Flags:  nochunk  noba  smallmap  delslam  readtwice
(smallmap: 16k-surfel map — does read latency scale with live HBM?;
delslam: drop every SLAM device reference + wait before reading;
readtwice: is the cost one-time per session or per read?)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = ["/root/repo"]

FRAMES = int(os.environ.get("PROBE_FRAMES", 120))
W, H = 320, 240


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else FRAMES
    flags = set(sys.argv[2:])
    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.utils.cache import enable_compile_cache
    from tools.probe_wedge import timed_read

    enable_compile_cache()
    out = {"n": n, "flags": sorted(flags), "backend": jax.default_backend()}

    cam = syn.default_camera(W, H)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(FRAMES, loop_frames=max(FRAMES - 70,
                                                     int(FRAMES * 0.9)))
    cfg = BadSlamConfig(
        num_scales=5,
        max_surfel_count=1 << 14 if "smallmap" in flags else 1 << 20,
        loop_detection_image_frequency=0.5,
        loop_detection_images_width=W,
        loop_detection_images_height=H,
        fps_restriction=0,
        enable_loop_detection=False,
        steady_frame_chunking="nochunk" not in flags,
    )
    if "noba" in flags:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_num_ba_iterations_per_keyframe=0)
    rng = np.random.default_rng(7)
    depths, rgbs = [], []
    for p in gt:
        depth, inten = syn.render_scene(
            cam, scene, p, albedo=lambda q: syn.textured_intensity_at(
                q, cell=0.07))
        sigma = 0.01 * depth * depth
        depth = np.where(depth > 0, np.maximum(
            depth + sigma * rng.standard_normal(depth.shape), 1e-3), 0.0)
        depths.append(np.clip(depth / cfg.raw_to_float_depth, 0,
                              65535).astype(np.uint16))
        inten = inten + (3.0 / 255.0) * rng.standard_normal(inten.shape)
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rgbs.append(np.stack([gray, gray, gray], axis=-1))

    import bench

    video = bench._InMemoryVideo(cam, depths, rgbs)
    sentinel = jnp.asarray(np.float32(42.0))
    jax.block_until_ready(sentinel)

    slam = BadSlam(cfg, video)
    t0 = time.perf_counter()
    i = 0
    while i < n:  # n=0: init only (map/keyframe-store allocation, no frames)
        if slam.chunk_eligible(i, n):
            c = slam._chunk_len()
            slam._process_chunk(i, c)
            i += c
        else:
            slam.process_frame(i)
            i += 1
    jax.block_until_ready(slam.traj_q)
    out["run_s"] = round(time.perf_counter() - t0, 3)

    if "cbread" in flags:
        # Host-callback channel instead of a classic D2H read: does
        # debug.print / io_callback deliver a value where the first
        # normal read pays a 16-315 s session sync (or crashes the
        # worker)? If yes, the bench can ship ATE/closure evidence
        # through this path and never issue a classic read.
        t0 = time.perf_counter()
        try:
            @jax.jit
            def emit(x):
                jax.debug.print("CBVALUE {v}", v=x)
                return x + 0.0

            jax.block_until_ready(emit(sentinel))
            out["debug_print_s"] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            out["debug_print_error"] = repr(e)[:120]
        t0 = time.perf_counter()
        try:
            import jax.experimental as jex

            box = {}

            def sink(v):
                box["v"] = float(v)
                print(f"IOCB {box['v']}", flush=True)
                return np.float32(0.0)

            @jax.jit
            def emit2(x):
                return jex.io_callback(sink, jax.ShapeDtypeStruct((), jnp.float32), x)

            jax.block_until_ready(emit2(sentinel))
            out["io_callback_s"] = round(time.perf_counter() - t0, 3)
            out["io_callback_value"] = box.get("v")
        except Exception as e:
            out["io_callback_error"] = repr(e)[:120]
    if "delslam" in flags:
        import gc

        del slam, video
        gc.collect()
        time.sleep(5.0)  # let the relay process the frees
        out["post_del_sleep_s"] = 5.0
    try:
        to = float(os.environ.get("PROBE_TIMEOUT", 60))
        v, dt = timed_read(sentinel, timeout_s=to)
        out["sentinel_read"] = float(v)
        out["read_s"] = round(dt, 3)
        out["wedged"] = False
        if "readtwice" in flags:
            v2, dt2 = timed_read(sentinel, timeout_s=to)
            out["read2_s"] = round(dt2, 3)
    except Exception as e:
        out["read_error"] = repr(e)[:120]
        out["wedged"] = True
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    if out["wedged"]:
        os._exit(0)  # jax atexit would join the wedged transfer


if __name__ == "__main__":
    main()
