"""Keyframe storage as stacked device arrays.

TPU-native replacement for the reference's per-keyframe GPU buffer objects
(/root/reference/applications/badslam/src/badslam/keyframe.h:50-237): instead
of K separate pitched buffers addressed by host loops, all keyframe planes
live in stacked [K, H, W] arrays with a static capacity, so BA stages can
scan/vmap over the keyframe axis inside a single jitted program. Capacity
grows by power-of-two re-allocation (amortized, recompile-bounded).

Activation states mirror Keyframe::Activation (keyframe.h:54-67):
INACTIVE=0, COVISIBLE_ACTIVE=1, ACTIVE=2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops.preprocess import ProcessedFrame

INACTIVE = 0
COVISIBLE_ACTIVE = 1
ACTIVE = 2


class KeyframeStack(NamedTuple):
    """The device-resident slice of keyframe state consumed by BA kernels."""

    depth: jax.Array      # [K, H, W] f32, 0 invalid
    nx: jax.Array         # [K, H, W]
    ny: jax.Array         # [K, H, W]
    radius2: jax.Array    # [K, H, W]
    intensity: jax.Array  # [K, H, W]
    q: jax.Array          # [K, 4] global_T_frame rotation (wxyz)
    t: jax.Array          # [K, 3] global_T_frame translation
    mask: jax.Array       # [K] bool — participate in the current operation


@dataclass
class KeyframeStore:
    """Host-side manager: device plane stacks + host metadata.

    Host metadata (activation, covisibility, frame indices) drives control
    flow; the device stack feeds jitted BA programs.
    """

    cam: PinholeCamera
    capacity: int = 8

    # device stacks (allocated lazily on first keyframe)
    depth: Optional[jax.Array] = None
    raw_depth: Optional[jax.Array] = None  # pre-deformation metric depth
    nx: Optional[jax.Array] = None
    ny: Optional[jax.Array] = None
    radius2: Optional[jax.Array] = None
    intensity: Optional[jax.Array] = None
    q: Optional[jax.Array] = None
    t: Optional[jax.Array] = None

    # host metadata, one entry per keyframe id
    count: int = 0
    frame_indices: List[int] = field(default_factory=list)  # dataset frame idx
    valid: List[bool] = field(default_factory=list)  # False once merged away
    activation: List[int] = field(default_factory=list)
    covisibility: List[List[int]] = field(default_factory=list)
    min_depth: List[float] = field(default_factory=list)
    max_depth: List[float] = field(default_factory=list)
    last_active_in_ba_iteration: List[int] = field(default_factory=list)
    last_covis_in_ba_iteration: List[int] = field(default_factory=list)

    def _ensure_capacity(self, needed: int) -> None:
        if self.depth is not None and needed <= self.depth.shape[0]:
            return
        new_cap = max(self.capacity, 1)
        while new_cap < needed:
            new_cap *= 2
        h, w = self.cam.height, self.cam.width

        def grow(arr, shape, dtype=jnp.float32):
            fresh = jnp.zeros(shape, dtype)
            if arr is None:
                return fresh
            return jnp.concatenate([arr, fresh[arr.shape[0]:]], axis=0)

        self.depth = grow(self.depth, (new_cap, h, w))
        self.raw_depth = grow(self.raw_depth, (new_cap, h, w))
        self.nx = grow(self.nx, (new_cap, h, w))
        self.ny = grow(self.ny, (new_cap, h, w))
        self.radius2 = grow(self.radius2, (new_cap, h, w))
        self.intensity = grow(self.intensity, (new_cap, h, w))
        q0 = jnp.zeros((new_cap, 4), jnp.float32).at[:, 0].set(1.0)
        if self.q is None:
            self.q = q0
            self.t = jnp.zeros((new_cap, 3), jnp.float32)
        else:
            self.q = jnp.concatenate([self.q, q0[self.q.shape[0]:]], axis=0)
            self.t = jnp.concatenate(
                [self.t, jnp.zeros((new_cap - self.t.shape[0], 3), jnp.float32)],
                axis=0,
            )
        self.capacity = new_cap

    def add_keyframe(
        self,
        frame: ProcessedFrame,
        global_T_frame: se3.SE3,
        frame_index: int = -1,
    ) -> int:
        """Append a keyframe; returns its id."""
        kf_id = self.count
        self._ensure_capacity(kf_id + 1)
        self.depth = self.depth.at[kf_id].set(frame.depth)
        raw = frame.raw_depth if frame.raw_depth is not None else frame.depth
        self.raw_depth = self.raw_depth.at[kf_id].set(raw)
        self.nx = self.nx.at[kf_id].set(frame.nx)
        self.ny = self.ny.at[kf_id].set(frame.ny)
        self.radius2 = self.radius2.at[kf_id].set(frame.radius2)
        self.intensity = self.intensity.at[kf_id].set(frame.intensity)
        self.q = self.q.at[kf_id].set(global_T_frame.q)
        self.t = self.t.at[kf_id].set(global_T_frame.t)

        valid = frame.depth > 0
        mn = float(jnp.min(jnp.where(valid, frame.depth, jnp.inf)))
        mx = float(jnp.max(jnp.where(valid, frame.depth, 0.0)))

        self.count += 1
        self.frame_indices.append(frame_index)
        self.valid.append(True)
        self.activation.append(ACTIVE)
        self.covisibility.append([])
        self.min_depth.append(mn)
        self.max_depth.append(mx)
        self.last_active_in_ba_iteration.append(-1)
        self.last_covis_in_ba_iteration.append(-1)
        return kf_id

    def remove_keyframe(self, kf_id: int) -> None:
        """Mark a keyframe as merged/deleted (MergeKeyframes analog)."""
        self.valid[kf_id] = False
        self.activation[kf_id] = INACTIVE

    def set_pose(self, kf_id: int, pose: se3.SE3) -> None:
        self.q = self.q.at[kf_id].set(pose.q)
        self.t = self.t.at[kf_id].set(pose.t)

    def set_poses(self, q: jax.Array, t: jax.Array) -> None:
        """Bulk pose update for ids [0, count) (post BA)."""
        self.q = self.q.at[: q.shape[0]].set(q)
        self.t = self.t.at[: t.shape[0]].set(t)

    def pose(self, kf_id: int) -> se3.SE3:
        return se3.SE3(self.q[kf_id], self.t[kf_id])

    def poses_numpy(self):
        return np.asarray(self.q[: self.count]), np.asarray(self.t[: self.count])

    def stack(self, ids: Optional[List[int]] = None) -> KeyframeStack:
        """Device view for jitted consumers.

        With `ids`, gathers that subset (padded to a power of two so the jit
        cache sees few distinct shapes); otherwise returns the full capacity
        stack with a validity mask.
        """
        if ids is None:
            mask = np.zeros(self.capacity, bool)
            for i in range(self.count):
                mask[i] = self.valid[i]
            return KeyframeStack(
                self.depth, self.nx, self.ny, self.radius2, self.intensity,
                self.q, self.t, jnp.array(mask),
            )
        n = max(1, len(ids))
        padded = 1
        while padded < n:
            padded *= 2
        idx = np.zeros(padded, np.int32)
        idx[:n] = np.array(ids, np.int32) if ids else 0
        mask = np.zeros(padded, bool)
        mask[: len(ids)] = True
        gather = jnp.array(idx)
        return KeyframeStack(
            jnp.take(self.depth, gather, axis=0),
            jnp.take(self.nx, gather, axis=0),
            jnp.take(self.ny, gather, axis=0),
            jnp.take(self.radius2, gather, axis=0),
            jnp.take(self.intensity, gather, axis=0),
            jnp.take(self.q, gather, axis=0),
            jnp.take(self.t, gather, axis=0),
            jnp.array(mask),
        )

    def stack_raw(self, ids: Optional[List[int]] = None) -> jax.Array:
        """Raw (pre-deformation) depth planes aligned with stack(ids)."""
        if ids is None:
            return self.raw_depth
        n = max(1, len(ids))
        padded = 1
        while padded < n:
            padded *= 2
        idx = np.zeros(padded, np.int32)
        idx[:n] = np.array(ids, np.int32) if ids else 0
        return jnp.take(self.raw_depth, jnp.array(idx), axis=0)

    def recalibrate(self, cam, a, cfactor, cell_size: int) -> None:
        """Re-derive calibrated depth / normals / radii for ALL keyframes
        after a self-calibration update (one batched device pass).

        Goes beyond the reference, which keeps creation-time normals/radii
        stale and only re-calibrates depth on the fly in kernels
        (util.cuh:62-79); refreshing everything here keeps all downstream
        consumers consistent without per-use recalibration cost.
        """
        from badslam_tpu.ba.intrinsics_opt import recalibrate_planes

        if self.raw_depth is None:
            return
        depth, nx, ny, radius2 = recalibrate_planes(
            cam, self.raw_depth, a, cfactor, cell_size=cell_size
        )
        self.depth, self.nx, self.ny, self.radius2 = depth, nx, ny, radius2
        for i in range(self.count):
            d = np.asarray(depth[i])
            v = d > 0
            if v.any():
                self.min_depth[i] = float(d[v].min())
                self.max_depth[i] = float(d[v].max())

    def active_ids(self, include_covisible: bool = True) -> List[int]:
        out = []
        for i in range(self.count):
            if not self.valid[i]:
                continue
            if self.activation[i] == ACTIVE or (
                include_covisible and self.activation[i] == COVISIBLE_ACTIVE
            ):
                out.append(i)
        return out

    def valid_ids(self) -> List[int]:
        return [i for i in range(self.count) if self.valid[i]]

    def determine_covisible_active_keyframes(self) -> None:
        """Propagate kActive to covisible keyframes as kCovisibleActive
        (DirectBA::DetermineCovisibleActiveKeyframes, direct_ba.cc:549-564)."""
        for i in range(self.count):
            if self.valid[i] and self.activation[i] == COVISIBLE_ACTIVE:
                self.activation[i] = INACTIVE
        for i in range(self.count):
            if not self.valid[i] or self.activation[i] != ACTIVE:
                continue
            for j in self.covisibility[i]:
                if self.valid[j] and self.activation[j] == INACTIVE:
                    self.activation[j] = COVISIBLE_ACTIVE
