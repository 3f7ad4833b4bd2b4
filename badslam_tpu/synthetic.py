"""Synthetic analytic scenes for round-trip tests.

Re-creates the reference's test fixture pattern (e.g.
/root/reference/applications/badslam/src/badslam/test/
test_pose_optimization_geometric_residual.cc:50-174): a few analytic planes
rendered into depth maps, a smooth world-space intensity function for
photometric cues, ground-truth poses perturbed and recovered.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

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


def textured_intensity_at(points: np.ndarray, cell: float = 0.05,
                          seed: int = 0) -> np.ndarray:
    """Blocky world-space albedo: constant within `cell`-sized 3D cells,
    discontinuous across them — corner-rich so FAST/ORB find features
    (the smooth sinusoid of `intensity_at` defeats corner detectors).
    Deterministic integer hash per cell."""
    c = np.floor(points / cell).astype(np.int64)
    h = (c[..., 0] * 73856093) ^ (c[..., 1] * 19349663) \
        ^ (c[..., 2] * 83492791) ^ (np.int64(seed) * 2654435761)
    v = ((h ^ (h >> 13)) & 0xFFFF).astype(np.float64) / 65535.0
    v = 0.15 + 0.7 * v
    return np.floor(v * 255.0 + 0.5) / 255.0


def room_scene(size: float = 3.0) -> PlaneScene:
    """Box room: 6 inward-facing planes centered at the origin. A camera
    near the center sees walls at ~size/2 in every direction — the fixture
    for in-place loop trajectories (multi-wall revisiting scenes)."""
    half = size / 2.0
    pts = np.array([
        [half, 0, 0], [-half, 0, 0],
        [0, half, 0], [0, -half, 0],
        [0, 0, half], [0, 0, -half],
    ], np.float32)
    normals = -pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    return PlaneScene(pts, normals.astype(np.float32))


def loop_trajectory(
    num_frames: int,
    loop_frames: Optional[int] = None,
    orbit_radius: float = 0.8,
    height_wobble: float = 0.03,
) -> list:
    """Walking-loop revisiting trajectory: the camera travels a circle of
    `orbit_radius`, facing its direction of travel (tangent), completing
    the loop in `loop_frames` frames and then KEEPING GOING — frames past
    `loop_frames` re-observe the start sector with all the drift the
    odometry accumulated along the ~2*pi*r path. The organic loop-closure
    fixture (the reference validates closures on real revisiting ETH3D
    sequences, README.md:162)."""
    if loop_frames is None:
        loop_frames = max(1, int(num_frames * 0.9))
    poses = []
    for i in range(num_frames):
        th = 2.0 * np.pi * i / loop_frames
        p = pose(ry=th + np.pi / 2.0)  # camera +z along the tangent
        t = np.array([orbit_radius * np.sin(th),
                      height_wobble * np.sin(3.0 * th),
                      orbit_radius * (np.cos(th) - 1.0)], np.float32)
        poses.append(se3.SE3(p.q, t))
    return poses


def _np_quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """Host-side wxyz quaternion -> rotation matrix (NO device work: on the
    axon runtime a device->host read permanently degrades the session to a
    per-kernel synchronous mode ~1000x slower, so fixtures must stay numpy)."""
    w, x, y, z = (float(v) for v in q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


class HostSE3:
    """Tiny host-only SE3 (q wxyz numpy, t numpy) for fixtures."""

    __slots__ = ("q", "t")

    def __init__(self, q, t):
        self.q = np.asarray(q, np.float64)
        self.t = np.asarray(t, np.float64)

    def inverse(self) -> "HostSE3":
        R = _np_quat_to_matrix(self.q)
        return HostSE3(
            np.array([self.q[0], -self.q[1], -self.q[2], -self.q[3]]),
            -(R.T @ self.t),
        )


def _host_pose(world_T_frame) -> HostSE3:
    if isinstance(world_T_frame, HostSE3):
        return world_T_frame
    if not isinstance(world_T_frame.q, np.ndarray):
        # np.asarray of a DEVICE array is a d2h read, which permanently
        # degrades the axon session (PERF_NOTES.md) — reject there; on CPU
        # backends the convert is harmless (tests).
        import jax

        if jax.default_backend() != "cpu":
            raise TypeError(
                "render_scene needs a host-backed pose (synthetic.pose / "
                "HostSE3): a device->host read here would degrade the session"
            )
    return HostSE3(np.asarray(world_T_frame.q), np.asarray(world_T_frame.t))


def render_scene(
    cam: PinholeCamera,
    scene: PlaneScene,
    world_T_frame,
    albedo=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast the plane scene. Returns (depth [H,W] f32, intensity [H,W] f32).

    Depth is the z-depth of the nearest plane intersection in front of the
    camera; pixels hitting no plane get 0. Pure numpy on the host.
    `albedo(points_world) -> [..,]` overrides the default smooth intensity
    (e.g. textured_intensity_at for feature-rich images)."""
    ys, xs = np.mgrid[0 : cam.height, 0 : cam.width]
    dx = cam.fx_inv * xs + cam.cx_inv
    dy = cam.fy_inv * ys + cam.cy_inv
    return _render_from_dirs(dx, dy, scene, world_T_frame, albedo)


def render_scene_radtan(rtcam, scene, world_T_frame, iterations: int = 10):
    """Ray-cast through a radtan-DISTORTED camera (geometry.camera
    .RadTanCamera): per source pixel, the undistorted normalized direction
    is recovered by fixed-point inversion of the Brown model, then the same
    plane ray-cast runs. Produces distorted source images for undistortion
    tests (the reference validates tracking per distortion mode,
    test_pairwise_frame_tracking.cc:280-370)."""
    cam = rtcam.pinhole
    ys, xs = np.mgrid[0 : cam.height, 0 : cam.width]
    xd = (xs + 0.5 - cam.cx) / cam.fx
    yd = (ys + 0.5 - cam.cy) / cam.fy
    nx, ny = xd.copy(), yd.copy()
    for _ in range(iterations):
        r2 = nx * nx + ny * ny
        radial = 1.0 + rtcam.k1 * r2 + rtcam.k2 * r2 * r2
        tx = 2.0 * rtcam.p1 * nx * ny + rtcam.p2 * (r2 + 2.0 * nx * nx)
        ty = rtcam.p1 * (r2 + 2.0 * ny * ny) + 2.0 * rtcam.p2 * nx * ny
        nx = (xd - tx) / radial
        ny = (yd - ty) / radial
    return _render_from_dirs(nx, ny, scene, world_T_frame)


def _render_from_dirs(dx, dy, scene, world_T_frame, albedo=None):
    """Plane-scene ray-cast along per-pixel directions (dx, dy, 1)."""
    hp = _host_pose(world_T_frame)
    w2f = hp.inverse()
    R_fw = _np_quat_to_matrix(w2f.q)
    t_fw = w2f.t

    # Plane into camera frame: n_c = R n_w; p_c = R p_w + t
    n_c = scene.normals @ R_fw.T
    p_c = scene.points @ R_fw.T + t_fw

    height, width = dx.shape
    # Ray direction (dx, dy, 1); z-depth d solves n·(d*dir - p) = 0.
    best = np.full((height, width), np.inf, np.float32)
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
    R_wf = _np_quat_to_matrix(hp.q)
    pts_world = pts_cam @ R_wf.T + hp.t
    inten = (albedo or intensity_at)(pts_world).astype(np.float32)
    inten = np.where(depth > 0, inten, 0.0)
    return depth, inten


class HeightmapMesh(NamedTuple):
    """Random-heightmap triangle mesh fixture (the reference's heaviest
    tracker test scene, test_pairwise_frame_tracking.cc:280-340)."""

    vertices: np.ndarray   # [V, 3] world-space positions
    faces: np.ndarray      # [F, 3] int32 vertex indices
    colors: np.ndarray     # [V] f32 per-vertex intensity in [0, 1]


def heightmap_mesh_scene(
    rng: np.random.Generator,
    vertices_x: int = 31,
    vertices_y: int = 31,
    extent: float = 5.0,
    z_distance: float = 1.0,
    z_variation: float = 0.05,
) -> HeightmapMesh:
    """Random heightmap at z~1 with +-z_variation noise, borders pulled back
    to avoid self-occlusion, random per-vertex colors — the reference's
    fixture parameters (kHeightmapVerticesX/Y=61, width/height=5,
    z=1 +- 0.05, test_pairwise_frame_tracking.cc:292-340)."""
    xs = np.linspace(-0.5, 0.5, vertices_x)
    ys = np.linspace(-0.5, 0.5, vertices_y)
    gx, gy = np.meshgrid(xs, ys)
    z = z_distance + rng.uniform(-z_variation, z_variation, gx.shape)
    z -= 6.0 * np.sqrt(gx * gx + gy * gy)  # pull back borders
    vertices = np.stack(
        [gx * extent, gy * extent, z], axis=-1).reshape(-1, 3)
    colors = rng.integers(0, 256, len(vertices)).astype(np.float32) / 255.0

    faces = []
    for y in range(vertices_y - 1):
        for x in range(vertices_x - 1):
            i00 = x + y * vertices_x
            i10 = (x + 1) + y * vertices_x
            i01 = x + (y + 1) * vertices_x
            i11 = (x + 1) + (y + 1) * vertices_x
            faces.append((i01, i10, i00))
            faces.append((i01, i11, i10))
    return HeightmapMesh(vertices.astype(np.float32),
                         np.array(faces, np.int32), colors)


def render_mesh(
    cam: PinholeCamera,
    mesh: HeightmapMesh,
    world_T_frame,
    min_depth: float = 0.1,
    max_depth: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Z-buffer rasterization of the mesh (host numpy; replaces the
    reference's offscreen OpenGL renderer for tests). Perspective-correct
    barycentric interpolation of depth and vertex intensity.
    Returns (depth [H,W] f32 z-depth, intensity [H,W] f32)."""
    hp = _host_pose(world_T_frame)
    w2f = hp.inverse()
    R = _np_quat_to_matrix(w2f.q)
    vc = mesh.vertices @ R.T + w2f.t  # camera-frame vertices

    h, w = cam.height, cam.width
    depth_buf = np.full((h, w), np.inf, np.float64)
    inten_buf = np.zeros((h, w), np.float64)

    z = vc[:, 2]
    px = cam.fx * vc[:, 0] / np.where(z > 0, z, 1.0) + cam.cx
    py = cam.fy * vc[:, 1] / np.where(z > 0, z, 1.0) + cam.cy

    for f in mesh.faces:
        if np.any(vc[f, 2] <= min_depth):
            continue
        tx, ty = px[f], py[f]
        x0 = max(int(np.floor(tx.min())), 0)
        x1 = min(int(np.ceil(tx.max())), w - 1)
        y0 = max(int(np.floor(ty.min())), 0)
        y1 = min(int(np.ceil(ty.max())), h - 1)
        if x1 < x0 or y1 < y0:
            continue
        gy, gx = np.mgrid[y0:y1 + 1, x0:x1 + 1]
        # Pixel centers in corner convention.
        pxc = gx + 0.5
        pyc = gy + 0.5
        d = ((ty[1] - ty[2]) * (tx[0] - tx[2])
             + (tx[2] - tx[1]) * (ty[0] - ty[2]))
        if abs(d) < 1e-12:
            continue
        b0 = ((ty[1] - ty[2]) * (pxc - tx[2])
              + (tx[2] - tx[1]) * (pyc - ty[2])) / d
        b1 = ((ty[2] - ty[0]) * (pxc - tx[2])
              + (tx[0] - tx[2]) * (pyc - ty[2])) / d
        b2 = 1.0 - b0 - b1
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        inv_z = (b0 / vc[f[0], 2] + b1 / vc[f[1], 2] + b2 / vc[f[2], 2])
        zi = 1.0 / np.maximum(inv_z, 1e-12)
        ci = (b0 * mesh.colors[f[0]] / vc[f[0], 2]
              + b1 * mesh.colors[f[1]] / vc[f[1], 2]
              + b2 * mesh.colors[f[2]] / vc[f[2], 2]) * zi
        win_d = depth_buf[y0:y1 + 1, x0:x1 + 1]
        win_i = inten_buf[y0:y1 + 1, x0:x1 + 1]
        closer = inside & (zi < win_d)
        win_d[closer] = zi[closer]
        win_i[closer] = ci[closer]

    depth = np.where(
        np.isfinite(depth_buf) & (depth_buf <= max_depth), depth_buf, 0.0
    ).astype(np.float32)
    inten = np.floor(np.clip(inten_buf, 0, 1) * 255.0 + 0.5) / 255.0
    return depth, np.where(depth > 0, inten, 0.0).astype(np.float32)


def pose(tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0) -> se3.SE3:
    """SE3 from a twist — computed on HOST (numpy Rodrigues), returned as the
    usual jnp-backed se3.SE3 without any device->host read."""
    v = np.array([tx, ty, tz], np.float64)
    w = np.array([rx, ry, rz], np.float64)
    theta = float(np.linalg.norm(w))
    if theta < 1e-12:
        q = np.array([1.0, 0.0, 0.0, 0.0])
        t = v
    else:
        axis = w / theta
        half = theta / 2.0
        q = np.concatenate([[np.cos(half)], np.sin(half) * axis])
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        K /= theta
        V = (np.eye(3) + (1 - np.cos(theta)) / theta * K
             + (theta - np.sin(theta)) / theta * (K @ K))
        t = V @ v
    # numpy-backed: usable as a host value AND as a jit input, with no
    # device round-trip either way.
    return se3.SE3(q.astype(np.float32), np.asarray(t, np.float32))


def frame_from_render(cam, depth, intensity):
    """ProcessedFrame from ground-truth renders (no bilateral smoothing),
    like the reference's test-only Keyframe CPU constructor
    (keyframe.h:93-100)."""
    from badslam_tpu.ops.preprocess import (
        ProcessedFrame,
        compute_normals,
        compute_radii_and_remove_isolated,
    )

    d = jnp.array(depth)
    d1, nx, ny = compute_normals(cam, d)
    d2, r2 = compute_radii_and_remove_isolated(cam, d1)
    keep = d2 > 0
    return ProcessedFrame(
        depth=d2,
        nx=jnp.where(keep, nx, 0.0),
        ny=jnp.where(keep, ny, 0.0),
        radius2=r2,
        intensity=jnp.array(intensity),
    )


def identity_pose() -> se3.SE3:
    """Host-backed identity SE3 (no device work)."""
    return se3.SE3(np.array([1, 0, 0, 0], np.float32), np.zeros(3, np.float32))


def smooth_trajectory(num_frames: int, scale: float = 0.004):
    """GT poses along a smooth arc (world_T_frame per frame)."""
    poses = []
    for i in range(num_frames):
        s = i * scale
        poses.append(
            pose(tx=3.0 * s, ty=0.8 * np.sin(0.15 * i) * s, tz=-1.2 * s,
                 ry=2.0 * s, rz=0.5 * s)
        )
    return poses


def write_tum_dataset(
    path: str,
    cam: PinholeCamera,
    scene: PlaneScene,
    poses: Sequence[se3.SE3],
    raw_to_float_depth: float = 1.0 / 5000.0,
    write_gt: bool = True,
    distortion=None,  # optional (k1, k2[, p1, p2]) — write DISTORTED images
    albedo=None,      # optional world-space intensity fn (textured scenes)
    depth_noise: float = 0.0,      # sigma = depth_noise * d^2 [1/m] (stereo model)
    depth_bias: float = 0.0,       # systematic scale bias: d *= (1 + bias)
    depth_bias_quadratic: float = 0.0,  # depth-dependent bias: d *= (1 + q*d)
    intensity_noise: float = 0.0,  # additive gray-level sigma (u8 scale)
    noise_seed: int = 0,
) -> None:
    """Write a synthetic TUM/ETH3D-format dataset directory: calibration.txt,
    associated.txt, rgb/depth 16-bit PNGs, optional groundtruth.txt.
    With `distortion`, images are rendered through the radtan model and
    calibration.txt carries the extended "fx fy cx cy k1 k2 p1 p2" line.
    `depth_noise`/`intensity_noise` add per-pixel sensor noise (the
    quadratic depth-sigma model matches the association test's sigma,
    cost_function.cuh:81-88) — clean renders barely drift, so noisy
    datasets are what make loop-closure fixtures realistic."""
    import os

    import cv2

    noise_rng = np.random.default_rng(noise_seed)

    rtcam = None
    if distortion is not None:
        from badslam_tpu.geometry.camera import RadTanCamera

        k = list(distortion) + [0.0] * (4 - len(distortion))
        rtcam = RadTanCamera(pinhole=cam, k1=k[0], k2=k[1], p1=k[2], p2=k[3])

    os.makedirs(os.path.join(path, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(path, "depth"), exist_ok=True)
    with open(os.path.join(path, "calibration.txt"), "w") as f:
        line = f"{cam.fx} {cam.fy} {cam.cx} {cam.cy}"
        if rtcam is not None:
            line += f" {rtcam.k1} {rtcam.k2} {rtcam.p1} {rtcam.p2}"
        f.write(line + "\n")

    assoc_lines = []
    gt_lines = []
    for i, world_T_frame in enumerate(poses):
        if rtcam is not None:
            depth, inten = render_scene_radtan(rtcam, scene, world_T_frame)
        else:
            depth, inten = render_scene(cam, scene, world_T_frame, albedo)
        if depth_bias != 0.0 or depth_bias_quadratic != 0.0:
            # Uncorrected sensor miscalibration (what the reference's
            # depth-deformation self-calibration models, util.cuh:62-79).
            # NOTE: a GLOBAL scale bias only rescales the map (gauge-
            # invisible to loop closure); the depth-DEPENDENT quadratic
            # term warps the geometry and accumulates real odometry drift.
            depth = depth * (1.0 + depth_bias + depth_bias_quadratic * depth)
        if depth_noise > 0:
            sigma = depth_noise * depth * depth
            depth = np.where(
                depth > 0,
                np.maximum(depth + sigma * noise_rng.standard_normal(
                    depth.shape), 1e-3),
                0.0,
            ).astype(np.float32)
        depth_u16 = np.clip(depth / raw_to_float_depth, 0, 65535).astype(
            np.uint16
        )
        if intensity_noise > 0:
            inten = inten + (intensity_noise / 255.0) \
                * noise_rng.standard_normal(inten.shape)
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rgb = np.stack([gray, gray, gray], axis=-1)
        ts = f"{i / 30.0:.6f}"
        rgb_rel = f"rgb/{i:05d}.png"
        depth_rel = f"depth/{i:05d}.png"
        cv2.imwrite(os.path.join(path, rgb_rel), rgb)
        cv2.imwrite(os.path.join(path, depth_rel), depth_u16)
        assoc_lines.append(f"{ts} {rgb_rel} {ts} {depth_rel}")
        q = np.asarray(world_T_frame.q, np.float64)
        t = np.asarray(world_T_frame.t, np.float64)
        gt_lines.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}"
        )

    with open(os.path.join(path, "associated.txt"), "w") as f:
        f.write("\n".join(assoc_lines) + "\n")
    if write_gt:
        with open(os.path.join(path, "groundtruth.txt"), "w") as f:
            f.write("\n".join(gt_lines) + "\n")


def ate_moments_device(traj_t, gt_t):
    """Device half of the SE3-aligned ATE: reduce the device trajectory and
    an uploaded [F, 3] ground truth to the Horn/Umeyama sufficient
    statistics (C = E^T G [3,3], sum|E|^2, sum|G|^2) with mean/center/
    matmul ops ONLY. The SVD runs on the HOST (`ate_rmse_from_moments`):
    `jnp.linalg.svd` crashed the axon TPU worker at the post-long-run read
    in BOTH round-4 bench children ("kernel fault", BENCH_r04
    long_run.read_error) — and an 11-float moments read is as cheap as the
    former one-scalar read while keeping the device program crash-proof
    reductions."""
    global _ATE_MOMENTS_FN
    import jax

    if _ATE_MOMENTS_FN is None:
        # Module-level singleton: a fresh @jax.jit per call would RETRACE
        # (and re-fetch the compile) every invocation — the warm-before-run
        # discipline (bench.py, utils/timeread.py) needs the post-run call
        # to hit the exact executable compiled pre-run.
        @jax.jit
        def _m(est, gt):
            est = est.astype(jnp.float32)
            gt = gt.astype(jnp.float32)
            mu_e = est.mean(0)
            mu_g = gt.mean(0)
            E, G = est - mu_e, gt - mu_g
            # Full-f32 matmul, NOT the TPU default (bf16 passes): the host
            # half subtracts 2*sum(sv(C)) from se+sg — a ~1e3x cancellation
            # at bench trajectory scales, where bf16 moment error inflated
            # the reported ATE ~8x (round-4 bench: 8.2e-4 vs 1.0e-4 true).
            C = jnp.matmul(E.T, G, precision=jax.lax.Precision.HIGHEST)
            return C, (E * E).sum(), (G * G).sum()

        _ATE_MOMENTS_FN = _m
    return _ATE_MOMENTS_FN(traj_t, jnp.asarray(np.asarray(gt_t, np.float32)))


_ATE_MOMENTS_FN = None


def ate_rmse_from_moments(C, se, sg, n: int) -> float:
    """Host half: closed-form minimum of the aligned residual.
    min_R sum|R E_i - G_i|^2 = se + sg - 2*(s1 + s2 + sign(det(U V^T))*s3)
    with C = U diag(s) V^T (Kabsch). Matches ate_rmse(align="se3")."""
    C = np.asarray(C, np.float64)
    U, sv, Vt = np.linalg.svd(C)
    s = np.sign(np.linalg.det(U @ Vt))
    resid = max(float(se) + float(sg)
                - 2.0 * (sv[0] + sv[1] + s * sv[2]), 0.0)
    return float(np.sqrt(resid / n))


def ate_rmse_device(traj_t, gt_t):
    """Fully ON-DEVICE SE3-aligned ATE RMSE: ONE device scalar, no SVD, no
    host half, no D2H read. Built for the chronometric readout
    (utils/timeread.py): on the current relay every post-run D2H read
    crashes or hangs the TPU worker, so the whole metric must live on
    device and leave through the timing channel.

    Method: Horn's closed-form absolute orientation via the quaternion
    eigen-problem — the optimal R is the dominant eigenvector of the 4x4
    symmetric K(S) with S = E^T G — solved by 30 shifted matrix SQUARINGS
    (power iteration to the 2^30th power: converges for any eigengap that
    matters, 4x4 matmuls only, TPU-trivial). The residual is then computed
    DIRECTLY as sum|E_i R^T - G_i|^2 rather than Horn's se+sg-2*lambda
    difference form: at bench scales that difference cancels ~1e8x and was
    the round-4 8x-ATE-inflation bug; the direct form is a plain positive
    sum, exact in f32. First-order optimality makes the residual
    insensitive to eigenvector error (quadratic minimum), so f32 power
    iteration is ample. Both rotation conventions are evaluated and the
    min taken — the suboptimal one is never smaller, so this is exact and
    convention-proof.

    Equivalent of the reference's TUM/ETH3D ATE evaluation protocol
    (reference README.md benchmark workflow); matches
    `ate_rmse(align="se3")` to f32 precision (tested)."""
    global _ATE_DEVICE_FN
    import jax

    if _ATE_DEVICE_FN is not None:
        return _ATE_DEVICE_FN(traj_t, jnp.asarray(np.asarray(gt_t,
                                                             np.float32)))

    @jax.jit
    def _ate(est, gt):
        est = est.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        n = est.shape[0]
        E = est - est.mean(0)
        G = gt - gt.mean(0)
        S = jnp.matmul(E.T, G, precision=jax.lax.Precision.HIGHEST)
        t = jnp.trace(S)
        # Horn's K: dominant eigenvector q -> R rotating E-frame into
        # G-frame (convention hedged by the final min).
        K = jnp.array(
            [[t, S[1, 2] - S[2, 1], S[2, 0] - S[0, 2], S[0, 1] - S[1, 0]],
             [S[1, 2] - S[2, 1], 2 * S[0, 0] - t,
              S[0, 1] + S[1, 0], S[2, 0] + S[0, 2]],
             [S[2, 0] - S[0, 2], S[0, 1] + S[1, 0],
              2 * S[1, 1] - t, S[1, 2] + S[2, 1]],
             [S[0, 1] - S[1, 0], S[2, 0] + S[0, 2],
              S[1, 2] + S[2, 1], 2 * S[2, 2] - t]])
        # Shift to make lambda_max(K) the dominant eigenvalue of a PSD
        # matrix (Gershgorin bound), then square 30 times; renormalize by
        # max|B| each squaring to stay in f32 range.
        B = K + (1.0 + jnp.sum(jnp.abs(K))) * jnp.eye(4, dtype=K.dtype)

        def _sq(B, _):
            B = jnp.matmul(B, B, precision=jax.lax.Precision.HIGHEST)
            return B / jnp.max(jnp.abs(B)), None

        B, _ = jax.lax.scan(_sq, B / jnp.max(jnp.abs(B)), None, length=30)
        q = B[:, jnp.argmax(jnp.sum(B * B, axis=0))]
        q = q / jnp.linalg.norm(q)
        w, x, y, z = q[0], q[1], q[2], q[3]
        R = jnp.array(
            [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
              2 * (x * z + w * y)],
             [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
              2 * (y * z - w * x)],
             [2 * (x * z - w * y), 2 * (y * z + w * x),
              1 - 2 * (x * x + y * y)]])
        r1 = jnp.sum((jnp.matmul(E, R.T,
                                 precision=jax.lax.Precision.HIGHEST)
                      - G) ** 2)
        r2 = jnp.sum((jnp.matmul(E, R,
                                 precision=jax.lax.Precision.HIGHEST)
                      - G) ** 2)
        return jnp.sqrt(jnp.minimum(r1, r2) / n)

    # Module-level singleton (see ate_moments_device): the post-run call
    # must reuse the executable the pre-run warmup compiled.
    _ATE_DEVICE_FN = _ate
    return _ate(traj_t, jnp.asarray(np.asarray(gt_t, np.float32)))


_ATE_DEVICE_FN = None


def ate_rmse(est_poses, gt_poses, align: str = "se3") -> float:
    """ATE RMSE after trajectory alignment (Horn / Umeyama; the ETH3D
    benchmark metric). `align`: "se3" (rigid), "sim3" (rigid + scale — the
    TUM benchmark's scale-invariant variant), or "none"."""
    est = np.array([np.asarray(p.t, np.float64) for p in est_poses])
    gt = np.array([np.asarray(p.t, np.float64) for p in gt_poses])
    if align == "none":
        return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, sv, Vt = np.linalg.svd(E.T @ G)
    sign = np.sign(np.linalg.det(U @ Vt))
    S = np.diag([1.0, 1.0, sign])
    R = (U @ S @ Vt).T
    if align == "sim3":
        # Umeyama: c = tr(diag(sv) S) / sum ||E_i||^2.
        scale = float(np.sum(sv * np.diag(S))
                      / max(np.sum(E * E), 1e-30))
    else:
        scale = 1.0
    t = mu_g - scale * (R @ mu_e)
    aligned = scale * (est @ R.T) + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))))
