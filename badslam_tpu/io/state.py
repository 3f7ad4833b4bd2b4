"""Full SLAM state snapshot: save / load (checkpoint & resume).

Rebuild of the reference's binary state IO
(/root/reference/applications/badslam/src/badslam/io.h:38-77,
io.cc:38-705 — header magic "BADSLAM" v1): the snapshot covers the motion
model, config, ALL frame poses, camera intrinsics, the depth-deformation
state (a + cfactor grid), per-keyframe metadata and planes, and the surfel
map. Keyframe image data is included here (the reference re-derives it
from the dataset via stored paths; we store the planes so a snapshot is
self-contained, and raw planes let self-calibration resume exactly).

Format: a single .npz (compressed) plus the config as embedded JSON.
Saving reads the full device state — checkpoint boundaries only
(PERF_NOTES.md).

Calibration import/export as text files mirrors io.h:66-72.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

MAGIC = "BADSLAM_TPU"
VERSION = 1


def save_state(slam, path: str) -> None:
    """Snapshot a frontend.BadSlam to `path` (.npz)."""
    ks = slam.direct_ba.keyframes
    m = slam.direct_ba.surfels
    cam = slam.cam

    # Trajectory: one batched device read of the stacked pose buffers.
    poses_q = np.asarray(slam.traj_q, np.float32)
    poses_t = np.asarray(slam.traj_t, np.float32)
    has_pose = np.asarray(slam.has_pose, bool)

    hist_q = np.stack([np.asarray(p.q, np.float32)
                       for p in slam.base_kf_tr_frame]) \
        if slam.base_kf_tr_frame else np.zeros((0, 4), np.float32)
    hist_t = np.stack([np.asarray(p.t, np.float32)
                       for p in slam.base_kf_tr_frame]) \
        if slam.base_kf_tr_frame else np.zeros((0, 3), np.float32)

    data = dict(
        magic=MAGIC, version=VERSION,
        config_json=json.dumps(dataclasses.asdict(slam.config)),
        cam=np.array([float(cam.fx), float(cam.fy), float(cam.cx),
                      float(cam.cy), cam.width, cam.height], np.float64),
        # frontend
        frame_poses_q=poses_q, frame_poses_t=poses_t, frame_has_pose=has_pose,
        base_kf_id=np.int64(-1 if slam.base_kf_id is None
                            else slam.base_kf_id),
        base_kf_hist_q=hist_q, base_kf_hist_t=hist_t,
        last_frame_index=np.int64(slam.last_frame_index),
        ba_counter=np.int64(slam.bundle_adjustment_counter),
        # Parallel-BA drain queue + closure counter are host state that
        # belongs in the snapshot (the reference persists its queued
        # keyframes, io.cc:38-705); dropping them silently discarded
        # queued BA work on resume.
        queued_ba_iterations=np.int64(slam.queued_ba_iterations),
        loop_closure_count=np.int64(slam.loop_closure_count),
        # depth params
        depth_a=np.asarray(slam.direct_ba.depth_params.a, np.float32),
        depth_cfactor=np.asarray(slam.direct_ba.depth_params.cfactor,
                                 np.float32),
        ba_iteration_count=np.int64(slam.direct_ba.ba_iteration_count),
        # keyframes
        kf_count=np.int64(ks.count),
        kf_frame_indices=np.array(ks.frame_indices, np.int64),
        kf_free_slots=np.array(ks.free_slots, np.int64),
    )
    if ks.count > 0:
        for name in ("depth", "raw_depth", "nx", "ny", "radius2", "intensity",
                     "rgb", "q", "t", "valid", "activation", "covis",
                     "min_depth", "max_depth", "last_active_iter",
                     "last_covis_iter"):
            data[f"kf_{name}"] = np.asarray(getattr(ks, name))
    # surfels
    for name in ("pos", "normal", "radius2", "color", "desc", "valid",
                 "active", "count"):
        data[f"sf_{name}"] = np.asarray(getattr(m, name))

    with open(path, "wb") as f:
        np.savez_compressed(f, **data)


def load_state(path: str, video) -> "BadSlam":
    """Restore a frontend.BadSlam from a snapshot (resume path)."""
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam
    from badslam_tpu.geometry import se3
    from badslam_tpu.geometry.camera import PinholeCamera
    from badslam_tpu.ba.intrinsics_opt import DepthParams
    from badslam_tpu.mapping.surfels import SurfelMap

    z = np.load(path, allow_pickle=False)
    assert str(z["magic"]) == MAGIC, "not a badslam_tpu state file"
    config = BadSlamConfig(**{
        k: v for k, v in json.loads(str(z["config_json"])).items()
        if k in {f.name for f in dataclasses.fields(BadSlamConfig)}
    })
    c = z["cam"]
    cam = PinholeCamera(fx=float(c[0]), fy=float(c[1]), cx=float(c[2]),
                        cy=float(c[3]), width=int(c[4]), height=int(c[5]))
    video.camera = cam

    slam = BadSlam(config, video)
    slam.cam = cam
    slam.direct_ba.cam = cam

    # frontend state: trajectory buffers, padded/trimmed to the video length
    # (BadSlam.__init__ sized them from `video`).
    pq, pt = z["frame_poses_q"], z["frame_poses_t"]
    has = z["frame_has_pose"]
    n = slam.traj_q.shape[0]
    m = min(n, pq.shape[0])
    slam.traj_q = slam.traj_q.at[:m].set(jnp.array(pq[:m]))
    slam.traj_t = slam.traj_t.at[:m].set(jnp.array(pt[:m]))
    slam.has_pose[:m] = has[:m]
    slam.last_frame_index = int(z["last_frame_index"])
    slam.bundle_adjustment_counter = int(z["ba_counter"])
    if "queued_ba_iterations" in z.files:  # absent in v1 snapshots
        slam.queued_ba_iterations = int(z["queued_ba_iterations"])
        slam.loop_closure_count = int(z["loop_closure_count"])
    slam.base_kf_tr_frame = [
        se3.SE3(jnp.array(z["base_kf_hist_q"][i]),
                jnp.array(z["base_kf_hist_t"][i]))
        for i in range(z["base_kf_hist_q"].shape[0])
    ]

    # BA state
    ba = slam.direct_ba
    ba.ba_iteration_count = int(z["ba_iteration_count"])
    ba.depth_params = DepthParams(
        a=jnp.array(z["depth_a"]), cfactor=jnp.array(z["depth_cfactor"])
    )

    kf_count = int(z["kf_count"])
    if kf_count > 0:
        ks = ba.keyframes
        ks.count = kf_count
        ks.frame_indices = [int(v) for v in z["kf_frame_indices"]]
        ks.free_slots = ([int(v) for v in z["kf_free_slots"]]
                         if "kf_free_slots" in z.files else [])
        ks.capacity = int(z["kf_depth"].shape[0])
        for name in ("depth", "raw_depth", "nx", "ny", "radius2", "intensity",
                     "rgb", "q", "t", "valid", "activation", "covis",
                     "min_depth", "max_depth", "last_active_iter",
                     "last_covis_iter"):
            if f"kf_{name}" in z.files:  # rgb absent in v1 snapshots
                setattr(ks, name, jnp.array(z[f"kf_{name}"]))
        if ks.rgb is None or ks.rgb.shape[0] != ks.capacity:
            g = jnp.clip(ks.intensity * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
            ks.rgb = jnp.stack([g, g, g], axis=-1)

    ba.surfels = SurfelMap(
        pos=jnp.array(z["sf_pos"]), normal=jnp.array(z["sf_normal"]),
        radius2=jnp.array(z["sf_radius2"]), color=jnp.array(z["sf_color"]),
        desc=jnp.array(z["sf_desc"]), valid=jnp.array(z["sf_valid"]),
        active=jnp.array(z["sf_active"]), count=jnp.array(z["sf_count"]),
    )

    base_kf_id = int(z["base_kf_id"])
    if base_kf_id >= 0:
        slam.base_kf_id = base_kf_id
        slam.base_kf_global_T_frame = ba.keyframes.pose(base_kf_id)
        ks = ba.keyframes
        slam.base_kf_pyramid = None  # rebuilt lazily on next odometry call
        from badslam_tpu.ops.pyramid import build_pyramid

        slam.base_kf_pyramid = build_pyramid(
            ks.depth[base_kf_id], ks.nx[base_kf_id], ks.ny[base_kf_id],
            ks.intensity[base_kf_id], config.num_scales,
            gradmag=config.use_gradmag,
        )

        # Re-register keyframe features with the loop detector (the
        # reference re-derives keyframe images from the dataset; features
        # are cheap to recompute from the stored host frames).
        if slam.loop_detector is not None:
            for slot in ba.keyframes.live_slots_in_time_order():
                fi = ba.keyframes.frame_indices[slot]
                rgb = video.color_u8(fi)
                gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                        + 0.114 * rgb[..., 2]).astype(np.uint8)
                depth = video.depth_u16(fi).astype(np.float32) \
                    * config.raw_to_float_depth
                slam.loop_detector.add_keyframe(gray, depth, kf_id=slot)
                video.clear_frame(fi)
    return slam


def save_calibration(cam, depth_params, path_prefix: str) -> None:
    """Three text files like the reference (io.h:66-72): depth intrinsics,
    color intrinsics, deformation parameters."""
    with open(path_prefix + "_depth_intrinsics.txt", "w") as f:
        f.write(f"{cam.width} {cam.height} {float(cam.fx)} {float(cam.fy)} "
                f"{float(cam.cx)} {float(cam.cy)}\n")
    with open(path_prefix + "_color_intrinsics.txt", "w") as f:
        f.write(f"{cam.width} {cam.height} {float(cam.fx)} {float(cam.fy)} "
                f"{float(cam.cx)} {float(cam.cy)}\n")
    cf = np.asarray(depth_params.cfactor)
    with open(path_prefix + "_deformation.txt", "w") as f:
        f.write(f"{float(np.asarray(depth_params.a))} "
                f"{cf.shape[1]} {cf.shape[0]}\n")
        np.savetxt(f, cf)


def load_calibration(path_prefix: str):
    """Returns ((fx, fy, cx, cy, w, h), a, cfactor)."""
    with open(path_prefix + "_depth_intrinsics.txt") as f:
        w, h, fx, fy, cx, cy = (float(v) for v in f.readline().split())
    with open(path_prefix + "_deformation.txt") as f:
        a, wc, hc = (float(v) for v in f.readline().split())
        cfactor = np.loadtxt(f).reshape(int(hc), int(wc))
    return (fx, fy, cx, cy, int(w), int(h)), a, cfactor
