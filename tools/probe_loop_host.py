#!/usr/bin/env python
"""Host-cost breakdown of the loop-detection pipeline (round-3 verdict
weak #3: 'loop detection (worker thread)' at 34 ms/call on the 1-core box
strangles the dispatch path in the final long-run segments).

Replays the long-run bench's detection workload (72 keyframes, 320x240,
textured room scene, organic revisit at the end) through the detector on
CPU and times each phase per call: feature extraction, BoW add, candidate
query, descriptor match + RANSAC. Pure host code — no device involved.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from badslam_tpu import synthetic as syn
    from badslam_tpu.geometry.camera import PinholeCamera  # noqa: F401
    from badslam_tpu.loop.detector import LoopDetector

    w, h = 320, 240
    frames = 720
    loop_frames = max(frames - 70, int(frames * 0.9))
    cam = syn.default_camera(w, h)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(frames, loop_frames=loop_frames)
    det = LoopDetector(cam=cam, image_frequency=0.5)

    phases = {k: [] for k in ("add", "detect", "align")}
    candidates = alignments = 0
    rng = np.random.default_rng(7)
    for i, kf_id in enumerate(range(0, frames, 10)):
        p = gt[kf_id]
        depth, inten = syn.render_scene(
            cam, scene, p,
            albedo=lambda q: syn.textured_intensity_at(q, cell=0.07))
        inten = inten + (3.0 / 255.0) * rng.standard_normal(inten.shape)
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)

        t0 = time.perf_counter()
        det.add_keyframe(gray, depth.astype(np.float32), kf_id=i)
        t1 = time.perf_counter()
        cand = det.detect_candidate(i)
        t2 = time.perf_counter()
        phases["add"].append(t1 - t0)
        phases["detect"].append(t2 - t1)
        if cand is not None:
            candidates += 1
            t3 = time.perf_counter()
            init = det.initial_alignment(i, cand)
            phases["align"].append(time.perf_counter() - t3)
            if init is not None:
                alignments += 1

    n = len(phases["add"])
    print(f"{n} keyframes; {candidates} candidates, {alignments} alignments")
    for k, v in phases.items():
        if not v:
            continue
        v = np.array(v) * 1e3
        print(f"{k:<8} n={len(v):3d}  mean={v.mean():7.2f} ms  "
              f"p50={np.median(v):7.2f}  max={v.max():7.2f}  "
              f"total={v.sum() / 1e3:6.2f} s")

    # Fine-grained: where inside add/detect does the time go?
    import cProfile
    import pstats

    det2 = LoopDetector(cam=cam, image_frequency=0.5)
    prof = cProfile.Profile()
    rng = np.random.default_rng(7)
    grays = []
    for kf_id in range(0, frames, 10):
        depth, inten = syn.render_scene(
            cam, scene, gt[kf_id],
            albedo=lambda q: syn.textured_intensity_at(q, cell=0.07))
        inten = inten + (3.0 / 255.0) * rng.standard_normal(inten.shape)
        grays.append((np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8),
                      depth.astype(np.float32)))
    prof.enable()
    for i, (gray, depth) in enumerate(grays):
        det2.add_keyframe(gray, depth, kf_id=i)
        c = det2.detect_candidate(i)
        if c is not None:
            det2.initial_alignment(i, c)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(18)
    return 0


if __name__ == "__main__":
    sys.exit(main())
