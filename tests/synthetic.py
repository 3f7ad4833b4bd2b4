"""Synthetic analytic scenes for round-trip tests.

Re-creates the reference's test fixture pattern (e.g.
/root/reference/applications/badslam/src/badslam/test/
test_pose_optimization_geometric_residual.cc:50-174): a few analytic planes
rendered into depth maps, a smooth world-space intensity function for
photometric cues, ground-truth poses perturbed and recovered.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry import se3
import jax.numpy as jnp


class PlaneScene(NamedTuple):
    points: np.ndarray   # [P, 3] a point on each plane (world frame)
    normals: np.ndarray  # [P, 3] unit normals


def default_camera(width: int = 320, height: int = 240) -> PinholeCamera:
    # fx/fy chosen VGA-like, corner-convention principal point at center.
    f = 0.55 * width
    return PinholeCamera(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
                         width=width, height=height)


def random_plane_scene(rng: np.random.Generator, num_planes: int = 3) -> PlaneScene:
    """Planes roughly facing the camera at ~2m depth (like the reference test)."""
    points = np.stack(
        [
            rng.uniform(-0.5, 0.5, num_planes),
            rng.uniform(-0.5, 0.5, num_planes),
            rng.uniform(1.7, 2.3, num_planes),
        ],
        axis=-1,
    )
    normals = rng.normal(size=(num_planes, 3))
    normals[:, 2] = -np.abs(normals[:, 2]) - 1.5  # face the camera
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return PlaneScene(points.astype(np.float32), normals.astype(np.float32))


def intensity_at(points: np.ndarray) -> np.ndarray:
    """Smooth, locally-varying world-space albedo in [0, 1]."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    v = (
        0.5
        + 0.17 * np.sin(9.0 * x + 3.0 * z)
        + 0.17 * np.cos(8.0 * y - 2.0 * x)
        + 0.12 * np.sin(6.0 * (x + y + z))
    )
    v = np.clip(v, 0.0, 1.0)
    # Quantize to the u8 grid like real inputs.
    return np.floor(v * 255.0 + 0.5) / 255.0


def render_scene(
    cam: PinholeCamera,
    scene: PlaneScene,
    world_T_frame: se3.SE3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast the plane scene. Returns (depth [H,W] f32, intensity [H,W] f32).

    Depth is the z-depth of the nearest plane intersection in front of the
    camera; pixels hitting no plane get 0.
    """
    w2f = se3.inverse(world_T_frame)
    R_fw = np.asarray(se3.quat_to_matrix(w2f.q))
    t_fw = np.asarray(w2f.t)

    # Plane into camera frame: n_c = R n_w; p_c = R p_w + t
    n_c = scene.normals @ R_fw.T
    p_c = scene.points @ R_fw.T + t_fw

    ys, xs = np.mgrid[0 : cam.height, 0 : cam.width]
    dx = cam.fx_inv * xs + cam.cx_inv
    dy = cam.fy_inv * ys + cam.cy_inv
    # Ray direction (dx, dy, 1); z-depth d solves n·(d*dir - p) = 0.
    best = np.full((cam.height, cam.width), np.inf, np.float32)
    for i in range(len(scene.points)):
        denom = n_c[i, 0] * dx + n_c[i, 1] * dy + n_c[i, 2]
        num = n_c[i] @ p_c[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            d = num / denom
        d = np.where((np.abs(denom) > 1e-9) & (d > 0.05), d, np.inf)
        best = np.minimum(best, d.astype(np.float32))

    depth = np.where(np.isfinite(best), best, 0.0).astype(np.float32)

    # Intensity from world-space position of the hit point.
    pts_cam = np.stack([depth * dx, depth * dy, depth], axis=-1)
    R_wf = np.asarray(se3.quat_to_matrix(world_T_frame.q))
    pts_world = pts_cam @ R_wf.T + np.asarray(world_T_frame.t)
    inten = intensity_at(pts_world).astype(np.float32)
    inten = np.where(depth > 0, inten, 0.0)
    return depth, inten


def pose(tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0) -> se3.SE3:
    return se3.exp(jnp.array([tx, ty, tz, rx, ry, rz], jnp.float32))
