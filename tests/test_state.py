"""Checkpoint/resume round-trip (io.cc SaveState/LoadState analog)."""

import numpy as np

from badslam_tpu import synthetic as syn
from badslam_tpu.frontend import BadSlam
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.io.dataset import load_tum_dataset
from badslam_tpu.io.state import (
    load_calibration,
    load_state,
    save_calibration,
    save_state,
)


def make_dataset(tmp_path, frames=18):
    path = str(tmp_path / "ds")
    cam = syn.default_camera(128, 96)
    scene = syn.random_plane_scene(np.random.default_rng(7), 5)
    gt = syn.smooth_trajectory(frames)
    syn.write_tum_dataset(path, cam, scene, gt)
    return path, gt


def test_state_roundtrip_and_resume(tmp_path):
    path, gt = make_dataset(tmp_path)
    cfg = BadSlamConfig(num_scales=3, max_surfel_count=1 << 13,
                        keyframe_interval=5, enable_loop_detection=False)

    # Run the first half, snapshot.
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    slam.run(start=0, end=9)
    half_pose = np.asarray(slam.frame_poses[8].t)
    snap = str(tmp_path / "state.npz")
    save_state(slam, snap)

    # Resume in a fresh frontend; continue to the end.
    video2 = load_tum_dataset(path)
    slam2 = load_state(snap, video2)
    assert slam2.last_frame_index == 8
    np.testing.assert_allclose(
        np.asarray(slam2.frame_poses[8].t), half_pose, atol=1e-6)
    assert slam2.direct_ba.keyframes.count == slam.direct_ba.keyframes.count
    assert int(slam2.direct_ba.surfels.count) == int(slam.direct_ba.surfels.count)
    # Host queue/counter state must survive the round-trip (parallel-BA
    # work queued at the snapshot point resumes draining).
    assert slam2.queued_ba_iterations == slam.queued_ba_iterations
    assert slam2.loop_closure_count == slam.loop_closure_count
    assert slam.queued_ba_iterations > 0  # fixture actually queued work

    slam2.run(start=9, end=18)

    # Reference continuous run for comparison.
    video3 = load_tum_dataset(path)
    slam3 = BadSlam(cfg, video3)
    slam3.run(start=0, end=18)

    est2 = [p for p in slam2.frame_poses if p is not None]
    est3 = [p for p in slam3.frame_poses if p is not None]
    assert len(est2) == len(est3) == 18
    rmse = syn.ate_rmse(est2, gt)
    rmse_cont = syn.ate_rmse(est3, gt)
    # The resumed run must match the continuous run's quality.
    assert rmse < max(2 * rmse_cont, 2e-3), (rmse, rmse_cont)


def test_calibration_files_roundtrip(tmp_path):
    from badslam_tpu.ba.intrinsics_opt import empty_depth_params

    cam = syn.default_camera(64, 48)
    params = empty_depth_params(48, 64, 4)
    params = params._replace(
        a=params.a + 0.1,
        cfactor=params.cfactor + 0.01,
    )
    prefix = str(tmp_path / "calib")
    save_calibration(cam, params, prefix)
    (fx, fy, cx, cy, w, h), a, cf = load_calibration(prefix)
    assert (w, h) == (64, 48)
    assert abs(fx - cam.fx) < 1e-9 and abs(cy - cam.cy) < 1e-9
    assert abs(a - 0.1) < 1e-6
    np.testing.assert_allclose(cf, 0.01, atol=1e-6)
