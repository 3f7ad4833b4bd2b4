"""End-to-end residual/input modes: gradmag tracking and distorted-input
undistortion (the reference validates tracking per photometric mode and
distortion mode, test_pairwise_frame_tracking.cc:280-370)."""

import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.io.dataset import load_tum_dataset

import synthetic


def _run(path, cam, scene, gt, **cfg_kw):
    synthetic.write_tum_dataset(
        path, cam, scene, gt,
        distortion=cfg_kw.pop("distortion", None))
    defaults = dict(num_scales=3, max_surfel_count=1 << 13,
                    keyframe_interval=6,
                    max_num_ba_iterations_per_keyframe=0,
                    enable_loop_detection=False)
    expect_fused = cfg_kw.pop("expect_fused", None)
    defaults.update(cfg_kw)
    cfg = BadSlamConfig(**defaults)
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    if expect_fused is not None:
        assert slam._steady_ok == expect_fused, (
            "steady-frame fused-path eligibility mismatch")
    slam.run(progress=False)
    est = [p for p in slam.frame_poses if p is not None]
    assert len(est) == len(gt)
    return synthetic.ate_rmse(est, gt)


def test_gradmag_tracking_mode(tmp_path):
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(7), 4)
    gt = synthetic.smooth_trajectory(13, scale=0.003)
    ate = _run(str(tmp_path / "ds"), cam, scene, gt, use_gradmag=True)
    assert ate < 2e-3, ate


def test_undistortion_end_to_end(tmp_path):
    """Distorted source images + extended calibration: the loader builds the
    remap table, preprocess undistorts on device, and tracking still
    recovers the trajectory."""
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(8), 4)
    gt = synthetic.smooth_trajectory(13, scale=0.003)
    ate = _run(str(tmp_path / "ds"), cam, scene, gt,
               distortion=(-0.08, 0.01), expect_fused=True)
    assert ate < 2e-3, ate


def test_median_filter_end_to_end(tmp_path):
    """median_filter_and_densify_iterations > 0 runs INSIDE the fused
    steady-frame program (the reference does it on the CPU pre-upload,
    bad_slam.cc:650-666) and tracking still recovers the trajectory."""
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(8), 4)
    gt = synthetic.smooth_trajectory(13, scale=0.003)
    ate = _run(str(tmp_path / "ds2"), cam, scene, gt,
               median_filter_and_densify_iterations=2, expect_fused=True)
    assert ate < 2e-3, ate


def test_undistortion_map_identity_for_zero_distortion():
    from badslam_tpu.geometry.camera import RadTanCamera

    cam = synthetic.default_camera(32, 24)
    rt = RadTanCamera(pinhole=cam)
    m = rt.undistortion_map()
    ys, xs = np.mgrid[0:24, 0:32]
    np.testing.assert_allclose(m[..., 0], xs + 0.5, atol=1e-5)
    np.testing.assert_allclose(m[..., 1], ys + 0.5, atol=1e-5)


def test_radtan_render_matches_pinhole_after_undistortion():
    """undistort_image(rendered-distorted) ~= rendered-pinhole away from
    the boundary."""
    import jax.numpy as jnp

    from badslam_tpu.geometry.camera import RadTanCamera
    from badslam_tpu.ops.preprocess import undistort_image

    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(9), 3)
    rt = RadTanCamera(pinhole=cam, k1=-0.08, k2=0.01)
    pose = synthetic.identity_pose()
    d_true, i_true = synthetic.render_scene(cam, scene, pose)
    d_src, i_src = synthetic.render_scene_radtan(rt, scene, pose)
    m = jnp.array(rt.undistortion_map())
    d_un = np.asarray(undistort_image(jnp.array(d_src), m, nearest=True))
    i_un = np.asarray(undistort_image(jnp.array(i_src), m))
    sl = (slice(8, -8), slice(8, -8))
    ok = (d_true[sl] > 0) & (d_un[sl] > 0)
    assert ok.mean() > 0.9
    assert np.abs(d_un[sl] - d_true[sl])[ok].mean() < 5e-3
    assert np.abs(i_un[sl] - i_true[sl])[ok].mean() < 0.02


def test_live_sequential_pcg_ba(tmp_path):
    """--use_pcg --parallel_ba false runs the PCG solver during the live
    per-keyframe BA (bad_slam.cc:485-525 passes config_.use_pcg into the
    sequential BundleAdjustment; the parallel thread refuses PCG)."""
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(9), 4)
    gt = synthetic.smooth_trajectory(13, scale=0.003)
    ate = _run(str(tmp_path / "ds"), cam, scene, gt,
               use_pcg=True, parallel_ba=False,
               max_num_ba_iterations_per_keyframe=4)
    assert ate < 2e-3, ate
