"""Live-input capture tests: directory follower, TCP stream, and a live
end-to-end SLAM drive (input_realsense.cc-family capture-thread analog)."""

from __future__ import annotations

import os
import socket
import threading
import time

import numpy as np

from badslam_tpu import synthetic
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.io.live_inputs import (
    DirectoryInput,
    TCPInput,
    open_live_input,
    send_frame,
)

CAM = PinholeCamera(fx=70.0, fy=70.0, cx=48.0, cy=36.0, width=96, height=72)


def _make_frames(n):
    rng = np.random.default_rng(0)
    scene = synthetic.random_plane_scene(rng, 3)
    gt = synthetic.smooth_trajectory(n, scale=0.003)
    frames = []
    for pose in gt:
        depth, inten = synthetic.render_scene(CAM, scene, pose)
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        g = np.clip(inten * 255 + 0.5, 0, 255).astype(np.uint8)
        frames.append((d16, np.stack([g, g, g], -1)))
    return frames, gt


def test_directory_input_follows_drops(tmp_path):
    import cv2

    path = str(tmp_path)
    os.makedirs(os.path.join(path, "depth"))
    os.makedirs(os.path.join(path, "rgb"))
    with open(os.path.join(path, "calibration.txt"), "w") as f:
        f.write(f"{CAM.fx} {CAM.fy} {CAM.cx} {CAM.cy}\n")
    frames, _ = _make_frames(5)

    def writer():
        for i, (d16, rgb) in enumerate(frames):
            name = f"{i / 30.0:.6f}.png"
            cv2.imwrite(os.path.join(path, "depth", name), d16)
            cv2.imwrite(os.path.join(path, "rgb", name), rgb[..., ::-1])
            time.sleep(0.03)
        open(os.path.join(path, "end"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    inp = DirectoryInput(path, poll_interval=0.01)
    video = inp.start(max_frames=100)
    assert video.camera.width == CAM.width
    # Stream must deliver all 5 frames then end.
    assert video.wait_for_frame(4, timeout=10.0)
    assert not video.wait_for_frame(5, timeout=10.0)
    t.join()
    np.testing.assert_array_equal(video.depth_u16(2), frames[2][0])
    np.testing.assert_array_equal(video.color_u8(3), frames[3][1])
    assert abs(video.timestamps[1] - 1 / 30.0) < 1e-6
    inp.stop()


def test_tcp_input_stream():
    frames, _ = _make_frames(3)
    inp = TCPInput(port=0)

    def client():
        s = socket.create_connection(("127.0.0.1", inp.port), timeout=10)
        for i, (d16, rgb) in enumerate(frames):
            send_frame(s, i * 0.1, d16, rgb, CAM)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    video = inp.start(max_frames=10)
    assert video.wait_for_frame(2, timeout=10.0)
    assert not video.wait_for_frame(3, timeout=10.0)
    t.join()
    assert video.camera.fx == CAM.fx
    np.testing.assert_array_equal(video.depth_u16(1), frames[1][0])
    np.testing.assert_array_equal(video.color_u8(2), frames[2][1])
    inp.stop()


def test_live_slam_end_to_end(tmp_path):
    """SLAM consumes a directory stream while it is being written."""
    import cv2

    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam

    path = str(tmp_path)
    os.makedirs(os.path.join(path, "depth"))
    os.makedirs(os.path.join(path, "rgb"))
    with open(os.path.join(path, "calibration.txt"), "w") as f:
        f.write(f"{CAM.fx} {CAM.fy} {CAM.cx} {CAM.cy}\n")
    n = 8
    frames, gt = _make_frames(n)

    def writer():
        for i, (d16, rgb) in enumerate(frames):
            name = f"{i / 30.0:.6f}.png"
            cv2.imwrite(os.path.join(path, "depth", name), d16)
            cv2.imwrite(os.path.join(path, "rgb", name), rgb[..., ::-1])
            time.sleep(0.02)
        open(os.path.join(path, "end"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    inp = open_live_input(f"dir:{path}")
    video = inp.start(max_frames=32)
    cfg = BadSlamConfig(
        num_scales=3, keyframe_interval=4,
        max_num_ba_iterations_per_keyframe=2,
        max_surfel_count=1 << 12, tracking_max_iterations=8,
        enable_loop_detection=False,
    )
    slam = BadSlam(cfg, video)
    processed = slam.run_live()
    t.join()
    inp.stop()
    assert processed == n
    est = [slam.frame_pose(i) for i in range(n)]
    assert all(p is not None for p in est)
    assert synthetic.ate_rmse(est, gt) < 0.01


def test_vendor_inputs_consume_config_params():
    """The SDK-gated inputs receive the reference's k4a_*/structure_*
    parameters (bad_slam_config.h:287-366) — config threads through
    open_live_input into each class's _sdk_options()."""
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.io.live_inputs import (
        K4AInputThread,
        StructureInputThread,
    )

    cfg = BadSlamConfig(k4a_mode="wfov", k4a_fps=15, k4a_exposure=8000,
                        structure_depth_only=True,
                        structure_depth_diff_threshold=0.1)
    k4a = open_live_input("k4a", cfg)
    assert isinstance(k4a, K4AInputThread)
    opts = k4a._sdk_options()
    assert opts["k4a_mode"] == "wfov" and opts["k4a_fps"] == 15
    assert opts["k4a_exposure"] == 8000
    assert set(opts) == set(K4AInputThread.CONFIG_FIELDS)

    sc = open_live_input("structure", cfg)
    opts = sc._sdk_options()
    assert opts["structure_depth_only"] is True
    assert opts["structure_depth_diff_threshold"] == 0.1
    assert set(opts) == set(StructureInputThread.CONFIG_FIELDS)

    # Without a config, defaults apply (stub behavior unchanged).
    assert open_live_input("realsense")._sdk_options() == {}
