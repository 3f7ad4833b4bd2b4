"""Surfel color pipeline: creation-time RGB, the AssignColors refresh pass
(kernel_assign_colors.cu analog), descriptor-color debug viz, and the
live-viewer snapshot/export path."""

import json
import os
import urllib.request

import jax.numpy as jnp
import numpy as np

from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.mapping import surfels as sf
from badslam_tpu.ops.preprocess import preprocess_frame

import synthetic

CAP = 1 << 13


def _colored_frame(cam, scene, pose, rgb_fill):
    depth, inten = synthetic.render_scene(cam, scene, pose)
    g = np.clip(inten * 255.0, 0, 255).astype(np.uint8)
    rgb = np.empty(g.shape + (3,), np.uint8)
    for ch in range(3):
        rgb[..., ch] = rgb_fill[ch] if rgb_fill[ch] >= 0 else g
    return preprocess_frame(cam, jnp.array(depth), jnp.array(rgb),
                            max_depth=20.0)


def test_creation_samples_rgb():
    rng = np.random.default_rng(31)
    cam = synthetic.default_camera(80, 60)
    scene = synthetic.random_plane_scene(rng, 2)
    ba = DirectBA(cam, BadSlamConfig(max_surfel_count=CAP),
                  surfel_capacity=CAP)
    kf = ba.add_keyframe(
        _colored_frame(cam, scene, synthetic.identity_pose(), (200, -1, 30)),
        se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf, filter_new_surfels=False)
    col = np.asarray(ba.surfels.color)[np.asarray(ba.surfels.valid)]
    assert len(col) > 0
    np.testing.assert_allclose(col[:, 0], 200.0, atol=1.0)
    np.testing.assert_allclose(col[:, 2], 30.0, atol=1.0)
    # green channel carries the rendered intensity — non-constant
    assert col[:, 1].std() > 0.0


def test_assign_colors_averages_observations():
    rng = np.random.default_rng(32)
    cam = synthetic.default_camera(80, 60)
    scene = synthetic.random_plane_scene(rng, 2)
    ba = DirectBA(cam, BadSlamConfig(max_surfel_count=CAP),
                  surfel_capacity=CAP)
    pose0 = synthetic.identity_pose()
    pose1 = synthetic.pose(tx=0.01)
    kf0 = ba.add_keyframe(_colored_frame(cam, scene, pose0, (100, 100, 100)),
                          se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    ba.add_keyframe(_colored_frame(cam, scene, pose1, (200, 200, 200)),
                    se3.SE3(jnp.array(pose1.q, jnp.float32),
                            jnp.array(pose1.t, jnp.float32)), 1)

    smap = sf.assign_colors(ba.surfels, cam, ba.keyframes.stack(),
                            ba.keyframes.rgb, baseline_fx=40.0)
    col = np.asarray(smap.color)[np.asarray(smap.valid)]
    # Surfels seen by both keyframes average to 150; by one only, 100.
    assert col.min() >= 99.0 and col.max() <= 201.0
    both = np.isclose(col[:, 0], 150.0, atol=5.0)
    assert both.mean() > 0.5  # most surfels are observed in both frames


def test_assign_descriptor_colors_finite_and_bounded():
    rng = np.random.default_rng(33)
    cam = synthetic.default_camera(80, 60)
    scene = synthetic.random_plane_scene(rng, 2)
    ba = DirectBA(cam, BadSlamConfig(max_surfel_count=CAP),
                  surfel_capacity=CAP)
    kf = ba.add_keyframe(
        _colored_frame(cam, scene, synthetic.identity_pose(), (-1, -1, -1)),
        se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf, filter_new_surfels=False)
    m = sf.assign_descriptor_colors(ba.surfels)
    col = np.asarray(m.color)
    assert np.isfinite(col).all()
    assert (col >= 0).all() and (col <= 255.99).all()


def test_live_viewer_snapshot_and_http(tmp_path):
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.io.dataset import load_tum_dataset
    from badslam_tpu.viz.viewer import LiveViewer

    cam = synthetic.default_camera(80, 60)
    rng = np.random.default_rng(34)
    scene = synthetic.random_plane_scene(rng, 2)
    cfg = BadSlamConfig(max_surfel_count=CAP, num_scales=3,
                        keyframe_interval=4,
                        max_num_ba_iterations_per_keyframe=0,
                        enable_loop_detection=False)
    gt = synthetic.smooth_trajectory(9, scale=0.002)
    ds = str(tmp_path / "ds")
    synthetic.write_tum_dataset(ds, cam, scene, gt)
    video = load_tum_dataset(ds)
    slam = BadSlam(cfg, video)
    live = LiveViewer(str(tmp_path), port=0, interval=1)
    slam.live_viewer = live
    try:
        for i in range(len(video)):
            slam.process_frame(i)
        assert os.path.exists(tmp_path / "index.html")
        assert os.path.exists(tmp_path / "map_data.json")
        with open(tmp_path / "map_data.json") as f:
            data = json.load(f)
        assert data["generation"] >= 2  # updated DURING the run
        assert data["kf_count"] >= 2
        # Per-keyframe inspection panels (gui_keyframe_dialog analog):
        # every live keyframe ships a pose row + RGB/depth PNG pair.
        assert len(data["kf_poses"]) == data["kf_count"]
        assert len(data["kf_panels"]) == data["kf_count"]
        for rgb_b64, depth_b64 in data["kf_panels"].values():
            import base64

            assert base64.b64decode(rgb_b64)[:4] == b"\x89PNG"
            assert base64.b64decode(depth_b64)[:4] == b"\x89PNG"
        # Served over HTTP.
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/map_data.json", timeout=10).read()
        assert json.loads(body)["generation"] == data["generation"]
        # Control endpoint: pause/resume round-trip (GUI stepping analog).
        state = urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd=pause",
            timeout=10).read()
        assert state == b"paused" and live.paused
        state = urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd=resume",
            timeout=10).read()
        assert state == b"running" and not live.paused
        # Manual BA + densify actions (gui_main_window.cc manual BA/densify
        # analog): queued by /control, applied on the SLAM thread via the
        # on_wake hook, each followed by a fresh snapshot.
        gen_before = live.generation
        urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd=densify", timeout=10)
        urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd=ba", timeout=10)
        live.wait_if_paused(on_wake=slam._apply_viewer_commands)
        assert live.generation == gen_before + 2
        # Runtime config edit (gui_settings_window parameter-form analog):
        # /control?cmd=set:key=value, coerced + applied on the SLAM thread.
        from urllib.parse import quote

        urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd="
            + quote("set:keyframe_interval=7"), timeout=10)
        urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd="
            + quote("set:parallel_ba=false"), timeout=10)
        urllib.request.urlopen(
            f"http://127.0.0.1:{live.port}/control?cmd="
            + quote("set:max_surfel_count=1"), timeout=10)  # not editable
        live.wait_if_paused(on_wake=slam._apply_viewer_commands)
        assert slam.config.keyframe_interval == 7
        assert slam.config.parallel_ba is False
        assert slam.config.max_surfel_count == CAP  # whitelist held
    finally:
        live.close()


def test_live_viewer_step_releases_one_frame():
    from badslam_tpu.viz.viewer import LiveViewer

    import threading
    import time as _time

    lv = LiveViewer.__new__(LiveViewer)  # no server/files needed
    lv.paused = True
    lv._step = threading.Event()
    released = []

    def worker():
        lv.wait_if_paused()
        released.append(1)

    t = threading.Thread(target=worker)
    t.start()
    _time.sleep(0.15)
    assert not released  # blocked while paused
    lv.control("step")
    t.join(timeout=5)
    assert released and lv.paused  # one frame released, still paused
    lv.control("resume")
    lv.wait_if_paused()  # returns immediately when running
