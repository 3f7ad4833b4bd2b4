"""Headline benchmark: full VGA odometry frame throughput on one chip.

Mirrors the reference's operating point (BASELINE.md): per frame, the
pipeline uploads the raw depth + RGB planes, runs the fused preprocessing
program (brightness, bilateral filter, normals, radii), builds the 5-scale
pyramid, and runs the multi-scale direct tracker (geometric + photometric
residuals). The reference claims real-time (30 FPS input) on a GTX 1080;
`vs_baseline` is measured FPS / 30.

NO device->host value reads happen before or during the timed region
(PERF_NOTES.md: a single read permanently degrades the axon session).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/badslam_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.geometry import se3
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.tracking.pairwise import track_frame_pairwise

    width, height, num_scales = 640, 480, 5
    rng = np.random.default_rng(0)
    cam = syn.default_camera(width, height)
    cams = tuple(cam.pyramid_level(i) for i in range(num_scales))
    scene = syn.random_plane_scene(rng, num_planes=3)

    def pyramid_for(world_T_frame):
        depth, inten = syn.render_scene(cam, scene, world_T_frame)
        rgb = np.clip(inten[..., None] * 255.0, 0, 255).astype(np.uint8)
        rgb = np.repeat(rgb, 3, axis=-1)
        frame = preprocess_frame(
            cam, jnp.array(depth), jnp.array(rgb),
            max_depth=20.0, sigma_xy=1.5, radius_factor=2.0,
            sigma_inv_depth=0.005,
        )
        return build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, num_scales
        )

    base_pyr = pyramid_for(syn.identity_pose())

    # Pre-render a small set of frames on the host (numpy); the timed loop
    # replays them, including the host->device upload each frame.
    n_distinct = 4
    host_frames = []
    for i in range(n_distinct):
        d, inten = syn.render_scene(
            cam, scene, syn.pose(tx=0.01 + 0.002 * i, ty=0.002, ry=0.004)
        )
        rgb = np.repeat(
            np.clip(inten[..., None] * 255.0, 0, 255).astype(np.uint8), 3, -1
        )
        host_frames.append((d, rgb))

    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)

    def frame_step(depth_np, rgb_np, q, t):
        """Full per-frame odometry: upload -> preprocess -> pyramid -> track."""
        frame = preprocess_frame(
            cam, jnp.array(depth_np), jnp.array(rgb_np),
            max_depth=20.0, sigma_xy=1.5, radius_factor=2.0,
            sigma_inv_depth=0.005,
        )
        pyramid = build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, num_scales
        )
        return track_frame_pairwise(
            cams, base_pyr, pyramid, q, t, q, t,
            baseline_fx=40.0, use_depth=True, use_descriptor=True,
            test_two_initial_estimates=False, max_iterations=15,
        )

    # Warmup / compile.
    for d, rgb in host_frames:
        r = frame_step(d, rgb, q0, t0)
    jax.block_until_ready(r)

    n = 60
    t_start = time.perf_counter()
    for i in range(n):
        d, rgb = host_frames[i % n_distinct]
        r = frame_step(d, rgb, q0, t0)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t_start) / n

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "vga_odometry_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
