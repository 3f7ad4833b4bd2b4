"""Organic loop closure on a long revisiting trajectory (round-2 verdict
top item): the full DEFAULT pipeline — loop detection with the detection
thread, parallel BA, keyframe-rate alternating BA — must detect and close
a loop WITHOUT any injected candidate, and the closure must improve ATE.

Fixture: a textured box room, the camera walking a 0.4 m circle (tangent-
facing) with sensor noise and a depth-DEPENDENT calibration bias
(d *= 1 + q*d, the reference's cfactor-style deformation, util.cuh:62-79)
that accumulates real odometry drift over the ~2.5 m path; frames past the
loop point re-observe the start sector. Mirrors the reference's validation
stance of revisiting real sequences (ETH3D, /root/reference/README.md:162).

This is deliberately the most expensive test in the suite (~2 full SLAM
runs at 128x96): it is the only end-to-end proof that detection,
geometric verification, pose-graph optimization, and trajectory
deformation compose organically.
"""

import numpy as np
import pytest

from badslam_tpu import synthetic as syn
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.io.dataset import load_tum_dataset

W, H = 128, 96
FRAMES, LOOP = 170, 150


def _write_dataset(path: str):
    cam = syn.default_camera(W, H)
    scene = syn.room_scene(3.5)
    gt = syn.loop_trajectory(FRAMES, loop_frames=LOOP, orbit_radius=0.4)
    syn.write_tum_dataset(
        path, cam, scene, gt,
        albedo=lambda p: syn.textured_intensity_at(p, cell=0.07),
        depth_noise=0.004, depth_bias_quadratic=0.004, intensity_noise=2.0)
    return gt


def _run(path, gt, loop_on: bool):
    cfg = BadSlamConfig(
        num_scales=3, max_surfel_count=1 << 15, max_depth=3.5,
        enable_loop_detection=loop_on,
        # Detection-image rate matched to the scaled-down dataset (the
        # reference's dislocal window is 20 s * frequency); images at the
        # dataset's own resolution. Everything else: DEFAULTS (parallel
        # detection thread ON, parallel BA ON, keyframe_interval 10).
        loop_detection_image_frequency=0.3,
        loop_detection_images_width=W, loop_detection_images_height=H,
        fps_restriction=0,
    )
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    closures_before_revisit = None
    for i in range(FRAMES):
        slam.process_frame(i)
        video.clear_frame(i)
        if i == LOOP - 1:
            closures_before_revisit = slam.loop_closure_count
    slam._drain_loop_detections()
    est = [p for p in slam.frame_poses if p is not None]
    assert len(est) == FRAMES
    return (syn.ate_rmse(est, gt), slam.loop_closure_count,
            closures_before_revisit, est)


@pytest.mark.slow
def test_organic_loop_closure(tmp_path):
    path = str(tmp_path / "loop_ds")
    gt = _write_dataset(path)

    ate_on, closures, closures_early, est = _run(path, gt, loop_on=True)
    ate_off, _, _, _ = _run(path, gt, loop_on=False)

    # A closure fired ORGANICALLY (detect_candidate -> RANSAC -> 3-way
    # refinement -> consistency/necessity gates -> pose graph), and only
    # in the revisit sector: the mid-loop BoW aliases must all have been
    # rejected by geometric verification.
    assert closures >= 1, "no organic loop closure fired"
    assert closures_early == 0, "closure fired before the loop was closed"
    # The closure improves the trajectory substantially (probe-measured:
    # ~1.7 m drifted -> ~0.7 m closed; endpoint error drops ~20x).
    assert ate_on < 0.66 * ate_off, (ate_on, ate_off)

    # Endpoint drift (relative start->end error vs GT) nearly eliminated.
    import badslam_tpu.geometry.se3_np as s3

    def rel(a, b):
        return s3.mul(s3.inverse(s3.SE3(np.asarray(a.q, float),
                                        np.asarray(a.t, float))),
                      s3.SE3(np.asarray(b.q, float), np.asarray(b.t, float)))

    err = s3.log(s3.mul(s3.inverse(rel(gt[0], gt[FRAMES - 1])),
                        rel(est[0], est[FRAMES - 1])))
    assert np.linalg.norm(err[:3]) < 0.6, err  # vs ~4 m without closure
