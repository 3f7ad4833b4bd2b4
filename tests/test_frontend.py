"""Frontend-level tests: trajectory deformation after BA and keyframe
capacity enforcement (slot recycling under the memory-pressure merge path,
MergeKeyframes analog — direct_ba.cc:251-338, bad_slam.cc:962-972)."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.frontend import BadSlam
from badslam_tpu.geometry import se3
from badslam_tpu.io.dataset import load_tum_dataset
from badslam_tpu.loop.trajectory import deform_trajectory_device

import synthetic


def test_deform_trajectory_device_interpolates():
    """Two keyframes move in opposite directions; in-between frames must get
    the per-bracket interpolated correction (trajectory_deformation.cc:61-130),
    not a rigid shift."""
    n = 11
    traj_q = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    traj_t = jnp.zeros((n, 3), jnp.float32)

    old_kq = jnp.zeros((2, 4), jnp.float32).at[:, 0].set(1.0)
    old_kt = jnp.zeros((2, 3), jnp.float32)
    new_kq = old_kq
    # Keyframe at frame 0 moves +0.1 x, keyframe at frame 10 moves -0.1 x.
    new_kt = jnp.array([[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0]], jnp.float32)

    fi = np.arange(n)
    prev_slot = jnp.zeros(n, jnp.int32)
    next_slot = jnp.ones(n, jnp.int32)
    alpha = jnp.array(fi / 10.0, jnp.float32)
    kf_slot = jnp.full(n, -1, jnp.int32).at[0].set(0).at[10].set(1)

    q, t = deform_trajectory_device(
        traj_q, traj_t, old_kq, old_kt, new_kq, new_kt,
        prev_slot, next_slot, alpha, kf_slot,
    )
    t = np.asarray(t)
    # Keyframe frames snap exactly.
    assert np.allclose(t[0], [0.1, 0, 0], atol=1e-6)
    assert np.allclose(t[10], [-0.1, 0, 0], atol=1e-6)
    # Identity rotations -> exact linear interpolation of the correction.
    expect = 0.1 * (1 - fi / 10.0) + (-0.1) * (fi / 10.0)
    assert np.allclose(t[:, 0], expect, atol=1e-6), (t[:, 0], expect)
    assert np.allclose(t[:, 1:], 0.0, atol=1e-6)


def test_apply_ba_pose_updates_per_bracket(tmp_path):
    """Frontend path: after BA moves two keyframes differently, frames
    between them interpolate instead of taking one rigid correction."""
    path = str(tmp_path / "ds")
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(2), 5)
    gt = synthetic.smooth_trajectory(13, scale=0.004)
    synthetic.write_tum_dataset(path, cam, scene, gt)

    cfg = BadSlamConfig(num_scales=3, max_surfel_count=1 << 12,
                        keyframe_interval=6,
                        max_num_ba_iterations_per_keyframe=0)
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    slam.run(progress=False)
    ks = slam.direct_ba.keyframes
    assert ks.count >= 3
    # Keyframes at dataset frames 0, 6, 12.
    assert ks.frame_indices[:3] == [0, 6, 12]

    old_kq, old_kt = slam._remember_keyframe_poses()
    before = np.array(slam.traj_t)

    # Simulate a BA result: keyframe 1 shifts +y 0.02, keyframe 2 -y 0.02.
    d1 = se3.SE3(jnp.array([1.0, 0, 0, 0], jnp.float32),
                 jnp.array([0.0, 0.02, 0.0], jnp.float32))
    d2 = se3.SE3(jnp.array([1.0, 0, 0, 0], jnp.float32),
                 jnp.array([0.0, -0.02, 0.0], jnp.float32))
    ks.set_pose(1, se3.mul(d1, ks.pose(1)))
    ks.set_pose(2, se3.mul(d2, ks.pose(2)))
    slam._apply_ba_pose_updates(old_kq, old_kt)

    after = np.array(slam.traj_t)
    delta_y = after[:, 1] - before[:, 1]
    # Keyframe frames take their exact new poses.
    assert abs(delta_y[6] - 0.02) < 1e-4
    assert abs(delta_y[12] + 0.02) < 1e-4
    # Frame 9 (midway between KF1@6 and KF2@12) gets ~the average (~0).
    assert abs(delta_y[9]) < 5e-3
    # Frame 7 is closer to KF1: positive, between the two corrections.
    assert 0.005 < delta_y[7] < 0.02


def test_keyframe_capacity_enforced(tmp_path):
    """Long run with a small keyframe budget: freed slots are recycled, the
    device capacity stays bounded, and the trajectory stays accurate."""
    path = str(tmp_path / "ds")
    cam = synthetic.default_camera(96, 72)
    scene = synthetic.random_plane_scene(np.random.default_rng(7), 5)
    gt = synthetic.smooth_trajectory(40, scale=0.003)
    synthetic.write_tum_dataset(path, cam, scene, gt)

    max_kf = 8
    cfg = BadSlamConfig(num_scales=3, max_surfel_count=1 << 13,
                        keyframe_interval=2, max_keyframe_count=max_kf,
                        max_num_ba_iterations_per_keyframe=2)
    video = load_tum_dataset(path)
    slam = BadSlam(cfg, video)
    slam.run(progress=False)
    ks = slam.direct_ba.keyframes

    # 20 keyframes were created but the budget is 8: slots were recycled.
    assert ks.live_count <= max_kf
    assert ks.count <= max_kf + 2, ks.count       # high-water stays near cap
    assert ks.capacity <= 2 * max_kf, ks.capacity  # pow-2 bound, no growth
    assert len(ks.free_slots) == ks.count - ks.live_count

    est = [p for p in slam.frame_poses if p is not None]
    assert len(est) == len(gt)
    rmse = synthetic.ate_rmse(est, gt)
    assert rmse < 0.01, rmse
