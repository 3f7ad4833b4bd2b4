#!/usr/bin/env python
"""Bisect which pipeline call degrades the axon relay to sync fallback.

Measures the relay floor (trivial jitted program, synced) after each
phase; the first phase after which the floor jumps ~100x is the culprit.
Run phases selectively with --phases (comma list) to bisect cheaply.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--phases", default="")
    args = p.parse_args()
    only = set(args.phases.split(",")) if args.phases else None

    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.ops.preprocess import preprocess_frame

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x))

    def floor(tag):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(tiny(x))
        dt = (time.perf_counter() - t0) / 10
        print(f"floor after {tag:<28} {1e3 * dt:8.2f} ms", flush=True)

    def want(tag):
        return only is None or tag in only

    floor("start")

    cfg = BadSlamConfig(num_scales=5, max_surfel_count=1 << 20,
                        enable_loop_detection=False)
    rng = np.random.default_rng(0)
    cam = syn.default_camera(640, 480)
    scene = syn.random_plane_scene(rng, 3)
    gt = syn.smooth_trajectory(4, scale=0.02)

    depth, inten = syn.render_scene(cam, scene, gt[0])
    g = np.clip(inten * 255, 0, 255).astype(np.uint8)
    rgb = np.stack([g, g, g], -1)

    if want("preprocess"):
        frame = preprocess_frame(cam, jnp.array(depth), jnp.array(rgb),
                                 max_depth=cfg.max_depth)
        jax.block_until_ready(frame.depth)
        floor("preprocess")
    else:
        frame = preprocess_frame(cam, jnp.array(depth), jnp.array(rgb),
                                 max_depth=cfg.max_depth)

    from badslam_tpu.ba.scheme import DirectBA

    ba = DirectBA(cam, cfg)
    floor("DirectBA ctor")

    if want("add_keyframe"):
        ba.add_keyframe(frame, gt[0], 0)
        jax.block_until_ready(ba.keyframes.q)
        floor("add_keyframe")

    if want("create_surfels"):
        ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
        jax.block_until_ready(ba.surfels.pos)
        floor("create_surfels")

    if want("more_keyframes"):
        for i in range(1, 4):
            d2, i2 = syn.render_scene(cam, scene, gt[i])
            g2 = np.clip(i2 * 255, 0, 255).astype(np.uint8)
            f2 = preprocess_frame(cam, jnp.array(d2),
                                  jnp.array(np.stack([g2, g2, g2], -1)),
                                  max_depth=cfg.max_depth)
            ba.add_keyframe(f2, gt[i], i)
            ba.create_surfels_for_keyframe(i)
        jax.block_until_ready(ba.surfels.pos)
        floor("more_keyframes")

    if want("ba_iter"):
        ba.bundle_adjustment(max_iterations=1)
        jax.block_until_ready(ba.surfels.pos)
        floor("ba_iter")

    if want("ba_iter2"):
        ba.bundle_adjustment(max_iterations=2)
        jax.block_until_ready(ba.surfels.pos)
        floor("ba_iter2")

    floor("end")
    return 0


if __name__ == "__main__":
    sys.exit(main())
