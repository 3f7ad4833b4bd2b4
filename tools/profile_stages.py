#!/usr/bin/env python
"""Isolated BA-stage device-time measurement with amortized sync.

The axon relay has a large per-synchronization latency (~30 ms), so
blocking after every stage (sync_stage_profiling) measures latency, not
compute. Here each stage runs N times back-to-back with ONE final
block_until_ready, giving amortized per-call device+dispatch time. Also
reports the relay's sync floor (trivial program, synced per call) and the
async dispatch cost.

Builds a bench-like state first: VGA camera, K keyframes, surfels created.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.ba.scheme import DirectBA, _begin_iteration_masks
    from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
    from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.mapping import surfels as sf
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.tracking.pairwise import track_frame_pairwise

    print(f"backend: {jax.default_backend()}", flush=True)

    # --- relay floor ---
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(tiny(x))
    per_sync = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    r = x
    for _ in range(200):
        r = tiny(r)
    jax.block_until_ready(r)
    per_async = (time.perf_counter() - t0) / 200
    print(f"relay sync floor: {1e3 * per_sync:.2f} ms/call; "
          f"async dispatch: {1e3 * per_async:.3f} ms/call", flush=True)

    # --- representative state: K=6 VGA keyframes, surfels created ---
    K = 6
    cfg = BadSlamConfig(num_scales=5, max_surfel_count=1 << 20,
                        enable_loop_detection=False)
    rng = np.random.default_rng(0)
    cam = syn.default_camera(640, 480)
    scene = syn.random_plane_scene(rng, 3)
    ba = DirectBA(cam, cfg)
    gt = syn.smooth_trajectory(K, scale=0.02)
    for i, pose in enumerate(gt):
        depth, inten = syn.render_scene(cam, scene, pose)
        g = np.clip(inten * 255, 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], -1)
        frame = preprocess_frame(cam, jnp.array(depth), jnp.array(rgb),
                                 max_depth=cfg.max_depth)
        ba.add_keyframe(frame, pose, i)
        ba.create_surfels_for_keyframe(i, filter_new_surfels=(i > 0))
    bucket = ba._bucket_size(ba.known_surfel_bound)
    print(f"keyframe capacity: {ba.keyframes.capacity}, "
          f"surfel bound {ba.known_surfel_bound} -> bucket {bucket}",
          flush=True)
    view = jax.tree.map(
        lambda a: a[:bucket] if getattr(a, "ndim", 0) > 0 else a, ba.surfels)
    ks = ba.keyframes

    def bench(name, fn, n=8):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:<38} {1e3 * dt:9.2f} ms/call", flush=True)

    create_mask, _, _ = _begin_iteration_masks(
        ks.valid, ks.activation, ks.last_active_iter, ks.last_covis_iter,
        jnp.int32(99))

    bench("begin_iteration_masks", lambda: _begin_iteration_masks(
        ks.valid, ks.activation, ks.last_active_iter, ks.last_covis_iter,
        jnp.int32(99))[0])
    bench("surfel creation (masked scan)", lambda: sf.create_surfels_for_keyframes(
        view, cam, ks.stack(), ks.radius2, create_mask, ks.covis,
        jnp.int32(1), baseline_fx=cfg.baseline_fx,
        cell_size=cfg.sparse_surfel_cell_size, rgb_stack=ks.rgb)[0].pos)
    bench("surfel activation", lambda: sf.update_surfel_activation(
        view, cam, ks.stack(ks.active_mask(include_covisible=False)),
        baseline_fx=cfg.baseline_fx).active)
    bench("geometry optimization", lambda: optimize_geometry_iteration(
        view, cam, ks.stack(), baseline_fx=cfg.baseline_fx,
        use_depth=True, use_descriptor=True).pos)
    bench("surfel merge (masked scan)", lambda: sf.merge_surfels_for_keyframes(
        view, cam, ks.stack(), create_mask, baseline_fx=cfg.baseline_fx,
        cell_size=cfg.sparse_surfel_cell_size).pos)
    bench("surfel compaction", lambda: sf.compact_surfels(view).pos)
    bench("pose optimization (30 GN)", lambda: optimize_keyframe_poses(
        view, cam, ks.stack(), baseline_fx=cfg.baseline_fx,
        use_depth=True, use_descriptor=True, max_iterations=30).q)
    bench("delete+radii (scheme end)", lambda: sf.delete_surfels_and_update_radii(
        view, cam, ks.stack(), jnp.int32(1),
        baseline_fx=cfg.baseline_fx).valid)

    # tracking step for reference
    pyr_cams = tuple(cam.pyramid_level(i) for i in range(5))
    depth, inten = syn.render_scene(cam, scene, gt[0])
    g = np.clip(inten * 255, 0, 255).astype(np.uint8)
    frame = preprocess_frame(cam, jnp.array(depth),
                             jnp.array(np.stack([g, g, g], -1)),
                             max_depth=cfg.max_depth)
    pyr = build_pyramid(frame.depth, frame.nx, frame.ny, frame.intensity, 5)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)
    bench("tracking (30 GN x 5 scales)", lambda: track_frame_pairwise(
        pyr_cams, pyr, pyr, q0, t0v, q0, t0v,
        baseline_fx=cfg.baseline_fx, max_iterations=30).q)

    # Re-measure the relay floor: if it degraded vs the start-of-run value,
    # something in the state build / stages triggered the sync fallback
    # (PERF_NOTES.md) and every number above is inflated.
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(tiny(x))
    per_sync2 = (time.perf_counter() - t0) / 20
    print(f"relay sync floor at end: {1e3 * per_sync2:.2f} ms/call "
          f"(start: {1e3 * per_sync:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
