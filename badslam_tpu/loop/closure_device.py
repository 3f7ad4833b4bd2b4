"""Read-free loop-closure application: gates + pose graph + trajectory
deformation as ONE device program.

The reference verifies and applies closures on the host with GPU pose
downloads in between (loop_detector.cc:575-705). On the axon TPU runtime a
single device->host value read permanently degrades the session ~1000x
(PERF_NOTES.md), so here every value-dependent decision is a device mask:

  * consistency gate — <=10 deg viewing-direction / <=2 cm between all
    refinement pairs (loop_detector.cc:575-604);
  * pose averaging over the valid refinements (AveragePose, util.h:46);
  * necessity gate — mean keypoint pixel motion implied by the closure
    must exceed 1 px (loop_detector.cc:624-666);
  * pose-graph Gauss-Newton over the temporally-ordered live keyframes
    with the loop edge weighted by gate_ok — weight 0 makes the solve an
    EXACT no-op (chain residuals vanish by construction), so a rejected
    closure leaves every pose bit-identical;
  * trajectory deformation of the non-keyframes
    (trajectory_deformation.cc:61-130) against the pre-closure poses;
  * a device closure counter incremented by the gate.

The host contributes only value-free metadata: the temporal order of live
slots, bracket indices for deformation, and the ORB keypoints/RANSAC init
it computed from its OWN image copies (loop/features.py never touches
device data)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.loop.pose_graph import optimize_pose_graph_device

MAX_ANGLE_DIFFERENCE = jnp.pi / 180.0 * 10.0  # loop_detector.cc:577
MAX_EUCLIDEAN_DISTANCE = 0.02                 # loop_detector.cc:578
AVERAGE_PIXEL_DISTANCE_THRESHOLD = 1.0        # loop_detector.cc:661


def _consistency_ok(ref_q, ref_t, ref_valid):
    """All valid refinement pairs within the angle/translation gates
    (check_consistency analog); at least 2 valid refinements required
    (loop_detector.cc:556-560)."""
    z = se3.quat_to_matrix(ref_q)[..., :, 2]          # [M, 3] view dirs
    cosang = jnp.clip(jnp.einsum("mi,ni->mn", z, z), -1.0, 1.0)
    ang_ok = jnp.arccos(cosang) <= MAX_ANGLE_DIFFERENCE
    d = jnp.linalg.norm(ref_t[:, None, :] - ref_t[None, :, :], axis=-1)
    dist_ok = d <= MAX_EUCLIDEAN_DISTANCE
    pair_valid = ref_valid[:, None] & ref_valid[None, :]
    ok = jnp.all(jnp.where(pair_valid, ang_ok & dist_ok, True))
    return ok & (jnp.sum(ref_valid) >= 2)


def _average_pose(ref_q, ref_t, ref_valid):
    """Masked AveragePose (util.h:46): mean translation + normalized mean
    quaternion with hemispheres aligned to the first valid entry."""
    w = ref_valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    t = jnp.sum(ref_t * w[:, None], axis=0) / n
    first = jnp.argmax(ref_valid)
    q0 = ref_q[first]
    sign = jnp.where(jnp.einsum("mi,i->m", ref_q, q0) >= 0, 1.0, -1.0)
    q = jnp.sum(ref_q * (sign * w)[:, None], axis=0)
    return se3.SE3(se3.quat_normalize(q), t)


def _closure_needed(cam: PinholeCamera, pts, pts_valid,
                    cur_T_global_estimate, global_T_cur_actual):
    """Mean keypoint pixel-motion test (loop_detector.cc:624-666) on the
    current keyframe's host-extracted keypoints."""
    delta = se3.mul(cur_T_global_estimate, global_T_cur_actual)
    moved = se3.act(delta, pts)

    def project(p):
        z = jnp.maximum(p[:, 2], 1e-9)
        x = cam.fx * p[:, 0] / z + cam.cx
        y = cam.fy * p[:, 1] / z + cam.cy
        ok = ((p[:, 2] > 0) & (x >= 0) & (y >= 0)
              & (x < cam.width) & (y < cam.height))
        return jnp.stack([x, y], -1), ok

    pe, oke = project(moved)
    pc, okc = project(pts)
    ok = oke & okc & pts_valid
    cnt = jnp.sum(ok)
    avg = jnp.sum(jnp.where(
        ok, jnp.linalg.norm(pe - pc, axis=-1), 0.0)) / jnp.maximum(cnt, 1)
    # Too few projectable points -> closure allowed (reference returns true).
    return (cnt < 5) | (avg > AVERAGE_PIXEL_DISTANCE_THRESHOLD)


@functools.partial(jax.jit, static_argnames=("graph_iterations",),
                   donate_argnums=(11, 12))
def apply_closure(
    kq, kt,            # [Kcap, 4/3] keyframe store poses (NOT donated:
                       #   callers may hold pre-closure refs)
    order,             # [B] i32 live slots in temporal order, padded with
                       #   repeats of slot order[0]
    n_live,            # [] i32 number of valid entries in `order`
    cur_pos,           # [] i32 current keyframe's position in `order`
    matched_pos,       # [] i32 matched keyframe's position in `order`
    ref_q, ref_t,      # [M, 4/3] refined cur_T_matched candidates
    ref_valid,         # [M] bool
    pts,               # [N, 3] current keyframe keypoints (camera frame)
    pts_valid,         # [N] bool
    traj_q, traj_t,    # [F, 4/3] trajectory buffers (donated)
    prev_slot, next_slot, alpha, kf_slot,  # [F] bracket arrays
    count,             # [] i32 closure counter
    cam: PinholeCamera,
    graph_iterations: int = 20,
):
    """One program: gates -> pose graph -> scatter -> deformation -> count.
    Returns (kq, kt, traj_q, traj_t, count, ok)."""
    from badslam_tpu.loop.trajectory import deform_trajectory_device

    cur_T_matched = _average_pose(ref_q, ref_t, ref_valid)
    ok = _consistency_ok(ref_q, ref_t, ref_valid)

    oq, ot = kq[order], kt[order]                   # ordered live poses
    x_cur = se3.SE3(oq[cur_pos], ot[cur_pos])
    x_matched = se3.SE3(oq[matched_pos], ot[matched_pos])
    cur_T_global_est = se3.mul(cur_T_matched, se3.inverse(x_matched))
    ok = ok & _closure_needed(cam, pts, pts_valid, cur_T_global_est, x_cur)

    # Loop edge Z = X_matched^-1 X_cur measured = matched_T_cur.
    z = se3.inverse(cur_T_matched)
    new_oq, new_ot = optimize_pose_graph_device(
        oq, ot, n_live, matched_pos, cur_pos, z.q, z.t,
        loop_weight=ok.astype(jnp.float32), iterations=graph_iterations,
    )
    # Padded order entries repeat order[0] (the gauge-fixed vertex), so the
    # scatter writes identical values at duplicate indices. The write is
    # gated: a rejected closure leaves every pose BIT-identical (the
    # zero-weight graph solve is a numerical no-op only to ~1e-7).
    kq2 = jnp.where(ok, kq.at[order].set(new_oq), kq)
    kt2 = jnp.where(ok, kt.at[order].set(new_ot), kt)

    traj_q2, traj_t2 = deform_trajectory_device.__wrapped__(
        traj_q, traj_t, kq, kt, kq2, kt2,
        prev_slot, next_slot, alpha, kf_slot,
    )
    return kq2, kt2, traj_q2, traj_t2, count + ok.astype(jnp.int32), ok
