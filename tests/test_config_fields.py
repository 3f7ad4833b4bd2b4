"""Previously-inert config fields: input pyramid levels, fps_restriction
pacing, loop-detection frequency window, memory stats plumbing."""

import time

import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.io.dataset import load_tum_dataset

import synthetic


def test_input_pyramid_level(tmp_path):
    """pyramid_level_for_depth/color = 1: the pipeline runs at half
    resolution with a scaled camera and still tracks."""
    path = str(tmp_path / "ds")
    cam = synthetic.default_camera(128, 96)
    scene = synthetic.random_plane_scene(np.random.default_rng(11), 4)
    gt = synthetic.smooth_trajectory(9, scale=0.003)
    synthetic.write_tum_dataset(path, cam, scene, gt)

    cfg = BadSlamConfig(num_scales=3, max_surfel_count=1 << 12,
                        keyframe_interval=4,
                        max_num_ba_iterations_per_keyframe=0,
                        enable_loop_detection=False,
                        pyramid_level_for_depth=1,
                        pyramid_level_for_color=1)
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    assert slam.cam.width == 64 and slam.cam.height == 48
    slam.run(progress=False)
    est = [p for p in slam.frame_poses if p is not None]
    ate = synthetic.ate_rmse(est, gt)
    assert ate < 3e-3, ate


def test_downscale_depth_median_excludes_zeros():
    import jax.numpy as jnp

    from badslam_tpu.ops.preprocess import downscale_depth_median

    d = jnp.array([[1.0, 0.0], [3.0, 2.0]])
    out = np.asarray(downscale_depth_median(d))
    assert out.shape == (1, 1)
    assert out[0, 0] == 2.0  # median of {1, 2, 3} valid samples
    z = np.asarray(downscale_depth_median(jnp.zeros((4, 4))))
    assert (z == 0).all()


def test_fps_restriction_paces_run(tmp_path):
    path = str(tmp_path / "ds")
    cam = synthetic.default_camera(64, 48)
    scene = synthetic.random_plane_scene(np.random.default_rng(12), 3)
    gt = synthetic.smooth_trajectory(5, scale=0.002)
    synthetic.write_tum_dataset(path, cam, scene, gt)

    cfg = BadSlamConfig(num_scales=2, max_surfel_count=1 << 10,
                        keyframe_interval=8,
                        max_num_ba_iterations_per_keyframe=0,
                        enable_loop_detection=False,
                        fps_restriction=2)  # 0.5 s / frame floor
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    slam.run(progress=False)        # warm-up (compiles)
    slam2 = BadSlam(cfg, load_tum_dataset(path))
    t0 = time.perf_counter()
    slam2.run(progress=False)
    elapsed = time.perf_counter() - t0
    assert elapsed >= 5 * 0.5 - 0.25, elapsed


def test_loop_detection_frequency_sets_recency_window(tmp_path):
    path = str(tmp_path / "ds")
    cam = synthetic.default_camera(64, 48)
    scene = synthetic.random_plane_scene(np.random.default_rng(13), 3)
    gt = synthetic.smooth_trajectory(3, scale=0.002)
    synthetic.write_tum_dataset(path, cam, scene, gt)
    video = load_tum_dataset(path)

    # Derived: fps_restriction / keyframe_interval = 30/10 = 3 Hz -> 60.
    slam = BadSlam(BadSlamConfig(num_scales=2, enable_loop_detection=True,
                                 parallel_loop_detection=False), video)
    assert slam.loop_detector.recent_window == 60
    # Explicit frequency wins.
    slam = BadSlam(BadSlamConfig(num_scales=2, enable_loop_detection=True,
                                 parallel_loop_detection=False,
                                 loop_detection_image_frequency=0.1), video)
    assert slam.loop_detector.recent_window == 2


def test_memory_stats_api():
    from badslam_tpu.utils.memory import (
        device_memory_stats,
        format_memory_usage,
        free_device_memory_mb,
    )

    # CPU backend typically reports nothing — the API must degrade cleanly.
    stats = device_memory_stats()
    free = free_device_memory_mb()
    assert stats is None or isinstance(stats, dict)
    assert free is None or free > 0
    assert isinstance(format_memory_usage(), str)


def test_no_inert_config_fields():
    """Every BadSlamConfig field must be consumed somewhere outside
    config.py (or via a config helper that is). Guards against silently
    inert flags (round-2 verdict: disable_deactivation/device_dtype)."""
    import dataclasses
    import pathlib

    import badslam_tpu
    from badslam_tpu.config import BadSlamConfig

    pkg = pathlib.Path(badslam_tpu.__file__).parent
    src = "".join(
        p.read_text() for p in pkg.rglob("*.py") if p.name != "config.py"
    )
    # Fields consumed through a config.py helper method; the helper itself
    # must be used outside config.py.
    via_helper = {
        "min_observation_count_while_bootstrapping_1":
            "min_observation_count_at",
        "min_observation_count_while_bootstrapping_2":
            "min_observation_count_at",
    }
    missing = []
    for f in dataclasses.fields(BadSlamConfig):
        probe = via_helper.get(f.name, f.name)
        if probe not in src:
            missing.append(f.name)
    assert not missing, f"inert config fields (no use outside config.py): {missing}"
