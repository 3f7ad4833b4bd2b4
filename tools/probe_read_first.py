#!/usr/bin/env python
"""Does a t=0 device read (before ANY compiled program) pre-pay the relay's
first-read session sync without degrading the session?

Facts so far (PERF_NOTES.md): the FIRST D2H of a process with device state
pays a 16-315 s sync or crashes the worker; a read in a fresh empty
process costs 0.4 s; one read AFTER programs have run degrades every
later program ~1000x. Untested combination: read FIRST, then run.

  phase 0: upload tiny x, read it immediately (expected fast).
  phase 1: measure the canary program's steady-state time (healthy
           ~0.02-10 ms; degraded >100 ms).
  phase 2: build real device state (BadSlam init), run 10 frames.
  phase 3: read a post-run scalar — instant if the t=0 read pre-paid the
           sync, 16-315 s if the sync is armed by STATE not by reads.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = ["/root/repo"]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache
    from tools.probe_wedge import timed_read

    enable_compile_cache()
    out = {"backend": jax.default_backend()}

    x = jnp.asarray(np.float32(7.0))
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    v, dt = timed_read(x, timeout_s=120)
    out["t0_read_s"] = round(dt, 3)

    # Canary AFTER the read: is the session degraded?
    from badslam_tpu.utils.watchdog import probe_degradation

    t0 = time.perf_counter()
    out["canary_degraded"] = probe_degradation()
    out["canary_total_s"] = round(time.perf_counter() - t0, 3)

    # Real state + a short run (same shapes as the long-run bench).
    os.environ.setdefault("PROBE_FRAMES", "120")
    import tools.probe_wedge_slam as pws
    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    import bench

    cam = syn.default_camera(pws.W, pws.H)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(120, loop_frames=50)
    cfg = BadSlamConfig(
        num_scales=5, max_surfel_count=1 << 20, fps_restriction=0,
        enable_loop_detection=False)
    depths, rgbs = bench._render_frames(cam, scene, gt,
                                        cfg.raw_to_float_depth)
    video = bench._InMemoryVideo(cam, depths, rgbs)
    slam = BadSlam(cfg, video)
    t0 = time.perf_counter()
    slam.process_frames(0, 10)
    jax.block_until_ready(slam.traj_q)
    out["run10_s"] = round(time.perf_counter() - t0, 3)

    sentinel = jnp.asarray(np.float32(42.0))
    try:
        v, dt = timed_read(sentinel, timeout_s=600)
        out["post_run_read_s"] = round(dt, 3)
        out["post_run_read"] = float(v)
    except Exception as e:
        out["post_run_read_error"] = repr(e)[:120]
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
