import pytest
"""Steady-frame chunking: the fused between-keyframes chunk program
(frontend._chunk_frames_fn) must reproduce the per-frame steady path.

The chunk is a TPU submission-count optimization (ONE program + two
batched uploads per keyframe interval instead of ~9 programs + 18
uploads); the math per frame is identical, so with sequential BA the
trajectories must agree to float tolerance, and with parallel BA (drain
granularity changes from per-frame to per-chunk) the ATE must agree.
"""

import numpy as np

from badslam_tpu import synthetic as syn
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.geometry import se3_np as s3

from bench import _InMemoryVideo, _render_frames

FRAMES = 13


def _run(chunking: bool, parallel_ba: bool):
    cfg = BadSlamConfig(
        num_scales=4, keyframe_interval=6, max_surfel_count=1 << 14,
        enable_loop_detection=False, fps_restriction=0,
        steady_frame_chunking=chunking, parallel_ba=parallel_ba,
    )
    cam = syn.default_camera(160, 120)
    scene = syn.random_plane_scene(np.random.default_rng(5), 6)
    gt = syn.smooth_trajectory(FRAMES, scale=0.003)
    video = _InMemoryVideo(
        cam, *_render_frames(cam, scene, gt, cfg.raw_to_float_depth))
    slam = BadSlam(cfg, video)
    slam.process_frames(0, FRAMES)
    return slam, gt


def _ate(slam, gt):
    q, t = np.asarray(slam.traj_q), np.asarray(slam.traj_t)
    est = [s3.SE3(q[i].astype(float), t[i].astype(float))
           for i in range(len(gt))]
    return syn.ate_rmse(est, gt)


@pytest.mark.slow
def test_chunked_matches_per_frame_sequential_ba():
    ref, gt = _run(chunking=False, parallel_ba=False)
    chk, _ = _run(chunking=True, parallel_ba=False)
    assert ref.chunks_processed == 0
    assert chk.chunks_processed == 2  # frames 1-5 and 7-11
    assert all(chk.has_pose[:FRAMES])
    assert (chk.direct_ba.keyframes.live_count
            == ref.direct_ba.keyframes.live_count)
    # Identical math, different fusion: float-level agreement.
    np.testing.assert_allclose(
        np.asarray(chk.traj_t), np.asarray(ref.traj_t), atol=1e-5)
    qr, qc = np.asarray(ref.traj_q), np.asarray(chk.traj_q)
    # quaternion sign-insensitive
    dot = np.abs(np.sum(qr * qc, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)
    assert abs(_ate(chk, gt) - _ate(ref, gt)) < 1e-5


def test_chunked_parallel_ba_ate_matches():
    # Parallel-BA drain moves from per-frame to per-chunk: trajectories
    # may differ slightly through BA interleaving, but accuracy must not.
    ref, gt = _run(chunking=False, parallel_ba=True)
    chk, _ = _run(chunking=True, parallel_ba=True)
    assert chk.chunks_processed == 2
    assert chk.queued_ba_iterations == ref.queued_ba_iterations
    a_ref, a_chk = _ate(ref, gt), _ate(chk, gt)
    assert a_chk < max(2 * a_ref, 1e-3), (a_chk, a_ref)


def test_chunk_eligibility_gates():
    cfg = BadSlamConfig(
        num_scales=4, keyframe_interval=6, max_surfel_count=1 << 14,
        enable_loop_detection=False, fps_restriction=0,
    )
    cam = syn.default_camera(160, 120)
    scene = syn.random_plane_scene(np.random.default_rng(5), 6)
    gt = syn.smooth_trajectory(FRAMES, scale=0.003)
    video = _InMemoryVideo(
        cam, *_render_frames(cam, scene, gt, cfg.raw_to_float_depth))
    slam = BadSlam(cfg, video)
    slam.process_frame(0)  # first keyframe
    assert slam.chunk_eligible(1, FRAMES)
    # pacing disables chunking (per-frame EndFrame semantics)
    slam.config.fps_restriction = 30
    assert not slam.chunk_eligible(1, FRAMES)
    slam.config.fps_restriction = 0
    # wrong phase (a keyframe would fall inside the chunk)
    assert not slam.chunk_eligible(2, FRAMES)
    # not enough frames left
    assert not slam.chunk_eligible(1, 3)
    # flag off
    slam.config.steady_frame_chunking = False
    assert not slam.chunk_eligible(1, FRAMES)
