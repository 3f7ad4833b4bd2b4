"""Viewer coverage: HTML export payload, snapshot dict (incl. keyframe
inspection panels), LiveViewer run/pause/step + manual commands, and the
HTTP control/data endpoints (render_window.cc / gui_main_window.cc
analogs, SURVEY §2.5)."""

import base64
import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from badslam_tpu import synthetic as syn
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.io.dataset import load_tum_dataset
from badslam_tpu.viz.viewer import (LiveViewer, _snapshot_dict,
                                    export_html_viewer)


@pytest.fixture(scope="module")
def mini_slam(tmp_path_factory):
    """A tiny finished SLAM run shared by the viewer tests."""
    path = str(tmp_path_factory.mktemp("ds"))
    cam = syn.default_camera(128, 96)
    scene = syn.random_plane_scene(np.random.default_rng(2), 5)
    gt = syn.smooth_trajectory(13)
    syn.write_tum_dataset(path, cam, scene, gt)
    cfg = BadSlamConfig(num_scales=3, keyframe_interval=4,
                        max_surfel_count=1 << 12,
                        enable_loop_detection=False)
    slam = BadSlam(cfg, load_tum_dataset(path))
    slam.process_frames(0, 13)
    return slam


def test_export_html_viewer(mini_slam, tmp_path):
    path = str(tmp_path / "map.html")
    export_html_viewer(mini_slam, path)
    html = open(path).read()
    # Inlined snapshot payload + the GUI-analog surfaces.
    assert '"kf_poses"' in html and '"pos"' in html
    assert "runtime settings" in html
    assert "screenshot" in html and "densify" in html
    assert os.path.getsize(path) > 10_000


def test_snapshot_dict_contents(mini_slam):
    pytest.importorskip("cv2")  # keyframe/current-frame panels need cv2
    d = _snapshot_dict(mini_slam, max_points=1000, generation=3)
    assert d["generation"] == 3
    ks = mini_slam.direct_ba.keyframes
    assert d["kf_count"] == ks.live_count > 0
    # Poses: [qw qx qy qz tx ty tz] per keyframe (inspection dialog).
    assert all(len(p) == 7 for p in d["kf_poses"])
    assert len(d["kf_panels"]) == ks.live_count
    for rgb_b64, depth_b64 in d["kf_panels"].values():
        assert base64.b64decode(rgb_b64)[:4] == b"\x89PNG"
        assert base64.b64decode(depth_b64)[:4] == b"\x89PNG"
    # Point payload: float32 xyz triplets, capped by max_points.
    n = len(base64.b64decode(d["pos"])) // 12
    assert 0 < n <= 1000
    assert d["rgb_png"] is not None and d["depth_png"] is not None


def test_live_viewer_pause_step_resume(tmp_path):
    v = LiveViewer(str(tmp_path / "view"), port=None)
    released = []

    def loop():
        for i in range(3):
            v.wait_if_paused()
            released.append(i)

    v.control("pause")
    t = threading.Thread(target=loop, daemon=True)
    t.start()
    time.sleep(0.15)
    assert released == []            # paused blocks the frame loop
    assert v.control("step") == "paused"
    time.sleep(0.15)
    assert released == [0]           # one frame released
    assert v.control("resume") == "running"
    t.join(timeout=2.0)
    assert released == [0, 1, 2]


def test_live_viewer_manual_commands_run_on_wake(tmp_path):
    v = LiveViewer(str(tmp_path / "view"), port=None)
    v.control("pause")
    v.control("ba")
    v.control("set:max_depth=5.0")
    applied = []

    def on_wake():
        applied.extend(v.take_commands())

    def loop():
        v.wait_if_paused(on_wake=on_wake)

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    time.sleep(0.3)
    # Commands executed on the SLAM thread even while still paused.
    assert applied == ["ba", "set:max_depth=5.0"]
    v.control("resume")
    t.join(timeout=2.0)
    assert not t.is_alive()


def test_live_viewer_http_endpoints(mini_slam, tmp_path):
    v = LiveViewer(str(tmp_path / "view"), port=0, interval=1)
    try:
        base = f"http://127.0.0.1:{v.port}"
        html = urllib.request.urlopen(f"{base}/index.html",
                                      timeout=5).read().decode()
        assert "__DATA__" not in html      # placeholder substituted
        state = urllib.request.urlopen(f"{base}/control?cmd=pause",
                                       timeout=5).read().decode()
        assert state == "paused"
        state = urllib.request.urlopen(f"{base}/control?cmd=resume",
                                       timeout=5).read().decode()
        assert state == "running"

        v.on_keyframe(mini_slam)           # interval=1 -> snapshot now
        data = json.loads(urllib.request.urlopen(
            f"{base}/map_data.json", timeout=5).read())
        assert data["generation"] == 1
        assert data["kf_count"] > 0
        cfg = json.loads(urllib.request.urlopen(
            f"{base}/config.json", timeout=5).read())
        assert cfg["num_scales"] == mini_slam.config.num_scales
    finally:
        v.close()


def test_debug_keyframe_move_and_delete(mini_slam):
    """Manual frame-move + keyframe-delete debug tools
    (gui_main_window.h:143,234 analogs) routed through the viewer command
    queue."""
    slam = mini_slam
    ks = slam.direct_ba.keyframes
    live_before = ks.live_count
    assert live_before >= 3

    # pick a live, non-base slot
    slot = next(s for s in range(ks.count)
                if s not in ks.free_slot_set and s != slam.base_kf_id)
    t_before = np.asarray(ks.t[slot]).copy()

    class _FakeViewer:
        def __init__(self, cmds):
            self._cmds = cmds

        def take_commands(self):
            c, self._cmds = self._cmds, []
            return c

        def snapshot(self, s):
            pass

    slam.live_viewer = _FakeViewer([f"move_kf:{slot}:0.05,0,0"])
    slam._apply_viewer_commands()
    t_after = np.asarray(ks.t[slot])
    assert abs((t_after - t_before)[0] - 0.05) < 1e-6

    slam.live_viewer = _FakeViewer([f"delete_kf:{slot}"])
    slam._apply_viewer_commands()
    assert ks.live_count == live_before - 1
    assert slot in ks.free_slot_set

    # base keyframe refuses deletion; malformed commands are ignored
    slam.live_viewer = _FakeViewer(
        [f"delete_kf:{slam.base_kf_id}", "move_kf:banana", "delete_kf:xyz"])
    slam._apply_viewer_commands()
    assert ks.live_count == live_before - 1
    slam.live_viewer = None

    # the viewer HTML ships the tools
    from badslam_tpu.viz.viewer import _HTML

    assert "kfNudge" in _HTML and "delete_kf:" in _HTML
