"""Headline benchmark: VGA odometry tracking throughput on one chip.

Mirrors the reference's operating point (BASELINE.md): direct RGB-D
odometry at 640x480 with 5 pyramid scales, geometric + photometric
residuals, constant-motion initialization. The reference claims real-time
(30 FPS input) on a GTX 1080; `vs_baseline` is measured FPS / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
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
    tracked_pyr = pyramid_for(syn.pose(tx=0.01, ty=0.002, ry=0.004))
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)

    def step(q, t):
        r = track_frame_pairwise(
            cams, base_pyr, tracked_pyr, q, t, q, t,
            baseline_fx=40.0, use_depth=True, use_descriptor=True,
            test_two_initial_estimates=False, max_iterations=15,
        )
        return r

    # Warmup / compile.
    r = step(q0, t0)
    jax.block_until_ready(r)

    n = 30
    t_start = time.perf_counter()
    for _ in range(n):
        r = step(q0, t0)
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
