import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera, unproject_map


CAM = PinholeCamera(fx=176.0, fy=176.0, cx=160.0, cy=120.0, width=320, height=240)


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, CAM.width, 50)
    py = rng.integers(0, CAM.height, 50)
    depth = rng.uniform(0.5, 3.0, 50).astype(np.float32)
    p = CAM.unproject(jnp.array(px, jnp.float32), jnp.array(py, jnp.float32),
                      jnp.array(depth))
    pxy = CAM.project(p)
    # Center-convention unprojection maps back to pixel centers (idx + 0.5).
    np.testing.assert_allclose(np.asarray(pxy[:, 0]), px + 0.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pxy[:, 1]), py + 0.5, atol=1e-3)
    # Floor recovers the pixel index.
    assert np.all(np.floor(np.asarray(pxy[:, 0])).astype(int) == px)


def test_project_valid_bounds():
    p = jnp.array(
        [
            [0.0, 0.0, 1.0],      # center, valid
            [0.0, 0.0, -1.0],     # behind camera
            [100.0, 0.0, 1.0],    # far out of image
        ],
        jnp.float32,
    )
    _, _, valid = CAM.project_valid(p)
    assert np.asarray(valid).tolist() == [True, False, False]


def test_scaled_camera_consistency():
    half = CAM.scaled(0.5)
    assert (half.width, half.height) == (160, 120)
    # A 3D point projecting to corner coords (x, y) projects to (x/2, y/2).
    p = jnp.array([[0.3, -0.2, 1.7]], jnp.float32)
    full_xy = np.asarray(CAM.project(p))[0]
    half_xy = np.asarray(half.project(p))[0]
    np.testing.assert_allclose(half_xy, full_xy / 2.0, atol=1e-5)


def test_pyramid_level_matches_repeated_scaling():
    lvl2 = CAM.pyramid_level(2)
    assert (lvl2.width, lvl2.height) == (80, 60)
    np.testing.assert_allclose(lvl2.fx, CAM.fx / 4.0)
    np.testing.assert_allclose(lvl2.cx, CAM.cx / 4.0)


def test_unproject_map_shape():
    depth = jnp.ones((CAM.height, CAM.width), jnp.float32)
    pts = unproject_map(CAM, depth)
    assert pts.shape == (CAM.height, CAM.width, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 1.0)


# ---------------------------------------------------------------------------
# Distorted camera models (RadTan, ThinPrismFisheye) + undistortion
# (camera.h:287-295 hierarchy; undistortion.cc:33-130)
# ---------------------------------------------------------------------------


def _models():
    from badslam_tpu.geometry.camera import (
        RadTanCamera,
        ThinPrismFisheyeCamera,
    )

    core = PinholeCamera(fx=180.0, fy=175.0, cx=162.0, cy=118.0,
                         width=320, height=240)
    return [
        RadTanCamera(pinhole=core, k1=-0.12, k2=0.03, p1=1e-3, p2=-5e-4),
        ThinPrismFisheyeCamera(pinhole=core, k1=-0.05, k2=0.01, k3=-2e-3,
                               k4=1e-4, p1=5e-4, p2=-3e-4, sx1=2e-4,
                               sy1=-1e-4),
    ]


def test_distort_undistort_roundtrip():
    from badslam_tpu.geometry.camera import _unproject_normalized

    rng = np.random.default_rng(0)
    for model in _models():
        nx = rng.uniform(-0.5, 0.5, 64)
        ny = rng.uniform(-0.4, 0.4, 64)
        px, py = model.project_normalized(nx, ny)
        nx2, ny2 = _unproject_normalized(model, px, py)
        np.testing.assert_allclose(nx2, nx, atol=1e-6)
        np.testing.assert_allclose(ny2, ny, atol=1e-6)


def test_decide_undistorted_camera_covers_fov():
    from badslam_tpu.geometry.camera import (
        _unproject_normalized,
        decide_undistorted_camera,
    )

    for model in _models():
        und = decide_undistorted_camera(model, avoid_invalid_pixels=False)
        # Every source border pixel's undistorted ray must project inside
        # the decided pinhole image.
        w, h = model.width, model.height
        bx = np.concatenate([np.arange(w) + 0.5, np.arange(w) + 0.5,
                             np.full(h, 0.5), np.full(h, w - 0.5)])
        by = np.concatenate([np.full(w, 0.5), np.full(w, h - 0.5),
                             np.arange(h) + 0.5, np.arange(h) + 0.5])
        nx, ny = _unproject_normalized(model, bx, by)
        px = und.fx * nx + und.cx
        py = und.fy * ny + und.cy
        assert np.all(px >= -1.0) and np.all(px <= und.width + 1.0)
        assert np.all(py >= -1.0) and np.all(py <= und.height + 1.0)
        # Shrink-to-valid must be no larger than cover-everything.
        inner = decide_undistorted_camera(model, avoid_invalid_pixels=True)
        assert inner.width <= und.width and inner.height <= und.height


def test_fisheye_undistortion_map_identity_when_undistorted():
    from badslam_tpu.geometry.camera import ThinPrismFisheyeCamera

    core = PinholeCamera(fx=100.0, fy=100.0, cx=80.0, cy=60.0,
                         width=160, height=120)
    model = ThinPrismFisheyeCamera(pinhole=core)  # all distortion zero
    # theta/r fisheye scaling is NOT identity even with zero coefficients
    # (equidistant model) — but at the image center it is.
    m = model.undistortion_map(core)
    cx_pix = m[60, 80]
    np.testing.assert_allclose(cx_pix, [80.5, 60.5], atol=0.05)


def test_loader_fisheye_calibration(tmp_path):
    """A named thin_prism_fisheye calibration line yields a decided
    pinhole camera + a source-sized undistortion map."""
    from badslam_tpu import synthetic
    from badslam_tpu.io.dataset import load_tum_dataset

    rng = np.random.default_rng(2)
    cam = PinholeCamera(fx=90.0, fy=90.0, cx=64.0, cy=48.0,
                        width=128, height=96)
    scene = synthetic.random_plane_scene(rng, 3)
    gt = synthetic.smooth_trajectory(3)
    ds = str(tmp_path / "ds")
    synthetic.write_tum_dataset(ds, cam, scene, gt)
    import os
    with open(os.path.join(ds, "calibration.txt"), "w") as f:
        f.write("thin_prism_fisheye 90.0 90.0 64.0 48.0 "
                "-0.02 0.004 0 0 0 0 0 0\n")
    video = load_tum_dataset(ds)
    assert video.undistortion_map is not None
    # Map is target-camera sized, holds source-pixel coords.
    th, tw, two = video.undistortion_map.shape
    assert (th, tw) == (video.camera.height, video.camera.width)
    assert two == 2


def test_loader_trajectory_slerp(tmp_path):
    """Frame poses are interpolated between bracketing trajectory stamps
    (rgbd_video_io_tum_dataset.h:149-199), not nearest-snapped."""
    from badslam_tpu import synthetic
    from badslam_tpu.io.dataset import load_tum_dataset

    rng = np.random.default_rng(3)
    cam = PinholeCamera(fx=90.0, fy=90.0, cx=64.0, cy=48.0,
                        width=128, height=96)
    scene = synthetic.random_plane_scene(rng, 3)
    gt = synthetic.smooth_trajectory(4)
    ds = str(tmp_path / "ds")
    synthetic.write_tum_dataset(ds, cam, scene, gt, write_gt=False)
    # Trajectory sampled at half-frame offsets: t = (i + 0.5)/30 with
    # translation x = t; the loader must interpolate x(frame i) = i/30.
    import os
    with open(os.path.join(ds, "traj.txt"), "w") as f:
        for i in range(-1, 6):
            t = (i + 0.5) / 30.0
            f.write(f"{t:.6f} {t} 0 0 0 0 0 1\n")
    video = load_tum_dataset(ds, trajectory_filename="traj.txt")
    for i in range(4):
        x = float(np.asarray(video.poses[i].t)[0])
        np.testing.assert_allclose(x, i / 30.0, atol=1e-6)


def test_associate_frames_window_and_uniqueness():
    """Nearest-timestamp association within associate.py's 0.02 s window:
    drops outside the window, one depth frame pairs at most once, full
    epoch precision (real TUM stamps are ~1.3e9 s; f32 would collapse
    the 33 ms frame spacing)."""
    from badslam_tpu.io.dataset import associate_frames

    t0 = 1305031102.175304  # fr1/desk-scale epoch
    rgb = [(t0 + i / 30.0, f"rgb/{i}.png") for i in range(5)]
    # depth stream: +8 ms offset, frame 2 dropped by the sensor, an
    # extra far-away frame that must never match.
    depth = [(t0 + i / 30.0 + 0.008, f"depth/{i}.png")
             for i in (0, 1, 3, 4)] + [(t0 + 9.0, "depth/late.png")]
    pairs = associate_frames(rgb, depth)
    got = {r.split("/")[1]: d.split("/")[1] for _, r, _, d in pairs}
    assert got == {"0.png": "0.png", "1.png": "1.png",
                   "3.png": "3.png", "4.png": "4.png"}
    # Window enforcement: with the gap larger than max_difference the
    # unmatched rgb frame 2 pairs with nothing (its neighbors are taken).
    assert len(pairs) == 4


def test_loader_associates_raw_tum_download(tmp_path):
    """With no associated.txt (a raw TUM download), the loader pairs
    rgb.txt/depth.txt itself; the reference errors out here and requires
    the benchmark's associate.py (rgbd_video_io_tum_dataset.h:122-127,
    165-169)."""
    import os

    from badslam_tpu import synthetic
    from badslam_tpu.io.dataset import load_tum_dataset

    rng = np.random.default_rng(5)
    cam = PinholeCamera(fx=90.0, fy=90.0, cx=64.0, cy=48.0,
                        width=128, height=96)
    scene = synthetic.random_plane_scene(rng, 3)
    gt = synthetic.smooth_trajectory(4)
    ds = str(tmp_path / "ds")
    synthetic.write_tum_dataset(ds, cam, scene, gt, write_gt=False)
    os.remove(os.path.join(ds, "associated.txt"))
    t0 = 1305031102.2
    with open(os.path.join(ds, "rgb.txt"), "w") as f:
        f.write("# color images\n")
        for i in range(4):
            f.write(f"{t0 + i / 30.0:.6f} rgb/{i:05d}.png\n")
    with open(os.path.join(ds, "depth.txt"), "w") as f:
        for i in (0, 1, 3):  # depth frame 2 dropped by the sensor
            f.write(f"{t0 + i / 30.0 + 0.005:.6f} depth/{i:05d}.png\n")
    video = load_tum_dataset(ds)
    assert len(video) == 3
    assert video.depth_paths[2].endswith("00003.png")
    assert video.color_paths[2].endswith("00003.png")
    # Frames load fine through the normal lazy path.
    assert video.depth_u16(1).shape == (96, 128)


def test_loader_unsorted_trajectory(tmp_path):
    """Out-of-order trajectory lines (real mocap exports interleave) are
    bracketed by the reference's linear scan, not misread by a sorted
    binary search (rgbd_video_io_tum_dataset.h:56-66)."""
    import os

    from badslam_tpu import synthetic
    from badslam_tpu.io.dataset import load_tum_dataset

    rng = np.random.default_rng(6)
    cam = PinholeCamera(fx=90.0, fy=90.0, cx=64.0, cy=48.0,
                        width=128, height=96)
    scene = synthetic.random_plane_scene(rng, 3)
    gt = synthetic.smooth_trajectory(4)
    ds = str(tmp_path / "ds")
    synthetic.write_tum_dataset(ds, cam, scene, gt, write_gt=False)
    # Trajectory x(t) = t at half-frame offsets, lines shuffled.
    stamps = [(i + 0.5) / 30.0 for i in range(-1, 5)]
    order = [3, 0, 4, 1, 5, 2]
    with open(os.path.join(ds, "traj.txt"), "w") as f:
        for k in order:
            t = stamps[k]
            f.write(f"{t:.6f} {t} 0 0 0 0 0 1\n")
    video = load_tum_dataset(ds, trajectory_filename="traj.txt")
    assert len(video) == 4
    for i in range(4):
        x = float(np.asarray(video.poses[i].t)[0])
        np.testing.assert_allclose(x, i / 30.0, atol=1e-6)
