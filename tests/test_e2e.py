import pytest
"""Full-pipeline integration test: synthetic TUM dataset -> CLI -> ATE.

The reference has no such test (SURVEY.md §4 "What's absent"); it validates
externally on the ETH3D benchmark. Here a rendered plane-scene sequence
with known ground truth closes that gap: dataset IO, preprocessing,
odometry, keyframing, bundle adjustment, trajectory deformation, and the
TUM/PLY exports all run in one pass.
"""

import os

import numpy as np

from badslam_tpu import synthetic as syn
from badslam_tpu.cli import main
from badslam_tpu.io.dataset import load_tum_trajectory


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    path = str(tmp_path / "dataset")
    cam = syn.default_camera(160, 120)
    scene = syn.random_plane_scene(np.random.default_rng(5), 6)
    gt = syn.smooth_trajectory(24)
    syn.write_tum_dataset(path, cam, scene, gt)

    est_path = str(tmp_path / "est.txt")
    ply_path = str(tmp_path / "map.ply")
    rc = main([
        path, "--num_scales", "4", "--max_surfel_count", str(1 << 14),
        "--keyframe_interval", "6",
        "--export_poses", est_path, "--export_point_cloud", ply_path,
        "--quiet",
    ])
    assert rc == 0

    _, est = load_tum_trajectory(est_path)
    assert len(est) == len(gt)
    rmse = syn.ate_rmse(est, gt)
    # ~10x the measured value (bench slam_ate ~1.2e-4) so regressions trip
    # (the former 0.01 bound let a 10x regression pass).
    assert rmse < 1e-3, rmse
    assert os.path.getsize(ply_path) > 1000

    # The standalone evaluation harness agrees (tools/evaluate_ate.py:
    # timestamp association + Horn/Umeyama alignment).
    import sys

    sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]
    from evaluate_ate import associate_and_evaluate

    stats = associate_and_evaluate(
        est_path, os.path.join(path, "groundtruth.txt"))
    assert stats["pairs"] == len(gt)
    assert abs(stats["rmse"] - rmse) < 1e-6, (stats["rmse"], rmse)
    sim3 = associate_and_evaluate(
        est_path, os.path.join(path, "groundtruth.txt"), align="sim3")
    assert sim3["rmse"] <= stats["rmse"] + 1e-9
    assert abs(sim3["scale"] - 1.0) < 0.05


@pytest.mark.slow
def test_save_timings_rows(tmp_path):
    """--save_timings streams per-BA-run rows (reference SetSaveTimings,
    direct_ba_alternating.cc:630-688): fused rows by default, per-stage
    rows with sync_stage_profiling."""
    path = str(tmp_path / "dataset")
    cam = syn.default_camera(96, 72)
    scene = syn.random_plane_scene(np.random.default_rng(6), 4)
    gt = syn.smooth_trajectory(13)
    syn.write_tum_dataset(path, cam, scene, gt)

    fused = str(tmp_path / "timings.txt")
    rc = main([path, "--num_scales", "3", "--max_surfel_count", str(1 << 13),
               "--keyframe_interval", "6", "--save_timings", fused,
               "--quiet"])
    assert rc == 0
    rows = open(fused).read().splitlines()
    assert any(r.startswith("BA_count ") and "keyframe_count" in r
               for r in rows), rows

    staged = str(tmp_path / "timings_staged.txt")
    rc = main([path, "--num_scales", "3", "--max_surfel_count", str(1 << 13),
               "--keyframe_interval", "6", "--save_timings", staged,
               "--sync_stage_profiling", "true", "--quiet"])
    assert rc == 0
    srows = open(staged).read().splitlines()
    assert any(r.startswith("BA_pose_optimization ") for r in srows), srows
    assert any("inner_iteration" in r for r in srows)
