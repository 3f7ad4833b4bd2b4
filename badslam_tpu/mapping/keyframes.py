"""Keyframe storage: stacked device planes + DEVICE-RESIDENT metadata.

TPU-native replacement for the reference's per-keyframe GPU buffer objects
(/root/reference/applications/badslam/src/badslam/keyframe.h:50-237).
Instead of K separate pitched buffers addressed by host loops, all keyframe
planes live in stacked [K, H, W] arrays with a power-of-two capacity, so BA
stages scan/vmap over the keyframe axis inside single jitted programs.

Crucially, ALL value-dependent metadata — validity, activation state,
covisibility, min/max depth, BA bookkeeping counters — lives on the DEVICE
and is updated by jitted programs. The host only tracks the keyframe count
and capacity. This makes the steady-state loop completely free of
device→host reads (PERF_NOTES.md: on the axon runtime a single read
permanently degrades the session ~1000x; on any TPU it is a sync stall).

Activation states mirror Keyframe::Activation (keyframe.h:54-67):
INACTIVE=0, COVISIBLE_ACTIVE=1, ACTIVE=2.
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------------------------
# Device frustum intersection (CameraFrustum::Intersects rebuild,
# libvis/src/libvis/camera_frustum.h:72-225: bbox gate + 6-plane SAT +
# edge-cross-product SAT, vectorized over all keyframes at once)
# ---------------------------------------------------------------------------


def _frustum_points(cam: PinholeCamera, q, t, min_d, max_d):
    """[K, 8, 3] world-space frustum corners (image corners x min/max z)."""

    def dirs(px, py):
        return ((px - cam.cx) / cam.fx, (py - cam.cy) / cam.fy)

    xs = []
    for px, py in ((0.0, 0.0), (cam.width * 1.0, 0.0), (0.0, cam.height * 1.0),
                   (cam.width * 1.0, cam.height * 1.0)):
        dx, dy = dirs(px, py)
        for dd in (min_d, max_d):
            xs.append(jnp.stack([dd * dx, dd * dy, dd], axis=-1))
    local = jnp.stack(xs, axis=-2)  # [K, 8, 3]
    R = jax.vmap(se3.quat_to_matrix)(q)  # [K, 3, 3]
    return jnp.einsum("kij,kpj->kpi", R, local) + t[:, None, :]


def _frustum_axes(p):
    """[..., 6, 3] edge direction vectors (camera_frustum.h:184-190)."""
    return jnp.stack([
        p[..., 7, :] - p[..., 6, :],
        p[..., 3, :] - p[..., 2, :],
        p[..., 5, :] - p[..., 4, :],
        p[..., 1, :] - p[..., 0, :],
        p[..., 2, :] - p[..., 6, :],
        p[..., 0, :] - p[..., 2, :],
    ], axis=-2)


def _frustum_planes(p, a):
    """Outward plane normals+offsets (camera_frustum.h:192-215)."""
    fwd = jnp.cross(a[..., 5, :], a[..., 4, :])
    right = jnp.cross(a[..., 0, :], a[..., 4, :])
    top = jnp.cross(a[..., 1, :], a[..., 5, :])
    left = jnp.cross(a[..., 4, :], a[..., 2, :])
    bottom = jnp.cross(a[..., 5, :], a[..., 0, :])
    normals = jnp.stack([fwd, -fwd, right, top, left, bottom], axis=-2)
    anchors = jnp.stack([
        p[..., 1, :], p[..., 0, :], p[..., 6, :],
        p[..., 2, :], p[..., 4, :], p[..., 6, :],
    ], axis=-2)
    offsets = -jnp.sum(normals * anchors, axis=-1)
    return normals, offsets


def _pair_intersects(pa, pb):
    """SAT intersection of two frustums given [8, 3] corner sets."""
    bbox = jnp.all(
        (jnp.max(pa, axis=-2) >= jnp.min(pb, axis=-2))
        & (jnp.max(pb, axis=-2) >= jnp.min(pa, axis=-2))
    )

    def planes_separate(points_src, points_other):
        axes = _frustum_axes(points_src)
        normals, offsets = _frustum_planes(points_src, axes)
        d = jnp.einsum("pi,vi->pv", normals, points_other) + offsets[:, None]
        return jnp.any(jnp.all(d >= 0, axis=-1))

    sep = planes_separate(pa, pb) | planes_separate(pb, pa)

    aa = _frustum_axes(pa)
    ab = _frustum_axes(pb)
    dirs = jnp.cross(aa[:, None, :], ab[None, :, :]).reshape(-1, 3)
    usable = jnp.sum(dirs * dirs, axis=-1) >= 1e-5
    proj_a = dirs @ pa.T
    proj_b = dirs @ pb.T
    a_min, a_max = jnp.min(proj_a, -1), jnp.max(proj_a, -1)
    b_min, b_max = jnp.min(proj_b, -1), jnp.max(proj_b, -1)
    sep = sep | jnp.any(usable & ((a_max <= b_min) | (a_min >= b_max)))
    return bbox & ~sep


@jax.jit
def _covisibility_row(cam: PinholeCamera, q, t, min_d, max_d, valid, new_id):
    """[K] bool: valid keyframes whose frustum intersects keyframe new_id's
    (DetermineNewKeyframeCoVisibility, direct_ba.cc:231-249)."""
    pts = _frustum_points(cam, q, t, min_d, max_d)
    new_pts = pts[new_id]
    row = jax.vmap(lambda pk: _pair_intersects(new_pts, pk))(pts)
    k = q.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
    return row & valid & (ids != new_id)


@jax.jit
def _register_covisibility(covis, activation, row, new_id):
    """Symmetric covisibility update + kCovisibleActive promotion of
    INACTIVE covisible keyframes (direct_ba.cc:240-247)."""
    covis = covis.at[new_id].set(row)
    covis = covis.at[:, new_id].set(row)
    activation = jnp.where(
        row & (activation == INACTIVE), COVISIBLE_ACTIVE, activation
    )
    return covis, activation


@functools.partial(jax.jit, static_argnames=("include_covisible",))
def _active_mask(valid, activation, include_covisible: bool):
    m = valid & (activation == ACTIVE)
    if include_covisible:
        m = m | (valid & (activation == COVISIBLE_ACTIVE))
    return m


# NOTE: q_s/t_s are NOT donated — _remember_keyframe_poses holds the
# pre-BA buffers for trajectory deformation.
@jax.jit
def _masked_pose_update(q_s, t_s, q, t, mask):
    k = q.shape[0]
    q_s = q_s.at[:k].set(jnp.where(mask[:, None], q, q_s[:k]))
    t_s = t_s.at[:k].set(jnp.where(mask[:, None], t, t_s[:k]))
    return q_s, t_s


@jax.jit
def _propagate_covisible_active(covis, activation, valid):
    """DetermineCovisibleActiveKeyframes (direct_ba.cc:549-564)."""
    activation = jnp.where(
        activation == COVISIBLE_ACTIVE, INACTIVE, activation)
    active = valid & (activation == ACTIVE)
    touched = (covis & active[None, :]).any(axis=1)
    activation = jnp.where(
        valid & touched & (activation == INACTIVE), COVISIBLE_ACTIVE,
        activation,
    )
    return activation


@functools.partial(jax.jit, donate_argnums=tuple(range(16)))
def _store_and_register(
    depth_s, raw_s, nx_s, ny_s, r2_s, int_s, rgb_s, q_s, t_s,
    valid_s, act_s, covis_s, mind_s, maxd_s, la_s, lc_s,
    cam, depth, raw, nx, ny, r2, inten, rgb_u8, q, t, kf_id,
):
    """Insert one keyframe into the stacked store + covisibility update as
    ONE jitted program with donated buffers. The eager per-plane `.at.set`
    version copied every [K, H, W] buffer per plane per keyframe and
    issued ~20 relay dispatches; donation makes the writes in-place."""
    kf = kf_id
    depth_s = depth_s.at[kf].set(depth)
    raw_s = raw_s.at[kf].set(raw)
    nx_s = nx_s.at[kf].set(nx)
    ny_s = ny_s.at[kf].set(ny)
    r2_s = r2_s.at[kf].set(r2)
    int_s = int_s.at[kf].set(inten)
    rgb_s = rgb_s.at[kf].set(rgb_u8)
    q_s = q_s.at[kf].set(q)
    t_s = t_s.at[kf].set(t)
    v = depth > 0
    mind_s = mind_s.at[kf].set(jnp.min(jnp.where(v, depth, jnp.inf)))
    maxd_s = maxd_s.at[kf].set(jnp.max(jnp.where(v, depth, 0.0)))
    valid_s = valid_s.at[kf].set(True)
    act_s = act_s.at[kf].set(ACTIVE)
    la_s = la_s.at[kf].set(-1)
    lc_s = lc_s.at[kf].set(-1)
    row = _covisibility_row.__wrapped__(
        cam, q_s, t_s, mind_s, maxd_s, valid_s, kf)
    covis_s, act_s = _register_covisibility.__wrapped__(
        covis_s, act_s, row, kf)
    return (depth_s, raw_s, nx_s, ny_s, r2_s, int_s, rgb_s, q_s, t_s,
            valid_s, act_s, covis_s, mind_s, maxd_s, la_s, lc_s)


@dataclass
class KeyframeStore:
    """Stacked device keyframe state; the host knows only count/capacity."""

    cam: PinholeCamera
    capacity: int = 8

    depth: Optional[jax.Array] = None
    raw_depth: Optional[jax.Array] = None  # pre-deformation metric depth
    nx: Optional[jax.Array] = None
    ny: Optional[jax.Array] = None
    radius2: Optional[jax.Array] = None
    intensity: Optional[jax.Array] = None
    rgb: Optional[jax.Array] = None        # [K, H, W, 3] u8 color planes
    q: Optional[jax.Array] = None
    t: Optional[jax.Array] = None
    valid: Optional[jax.Array] = None          # [cap] bool
    activation: Optional[jax.Array] = None     # [cap] i32
    covis: Optional[jax.Array] = None          # [cap, cap] bool
    min_depth: Optional[jax.Array] = None      # [cap] f32
    max_depth: Optional[jax.Array] = None      # [cap] f32
    last_active_iter: Optional[jax.Array] = None  # [cap] i32
    last_covis_iter: Optional[jax.Array] = None   # [cap] i32

    # host metadata (value-free). `count` is the high-water slot count;
    # freed slots (from keyframe merging) are recycled before new slots are
    # opened, so device capacity is bounded by the live keyframe count
    # (MergeKeyframes actually frees GPU memory, direct_ba.cc:251-338).
    count: int = 0
    frame_indices: List[int] = field(default_factory=list)
    free_slots: List[int] = field(default_factory=list)

    @property
    def free_slot_set(self) -> set:
        return set(self.free_slots)

    @property
    def live_count(self) -> int:
        """Number of live (non-freed) keyframes."""
        return self.count - len(self.free_slots)

    def live_slots_in_time_order(self) -> List[int]:
        """Live slot ids sorted by dataset frame index (temporal order).
        With slot recycling, slot order is NOT temporal order."""
        free = self.free_slot_set
        return [s for _, s in sorted(
            (f, s) for s, f in enumerate(self.frame_indices[: self.count])
            if f >= 0 and s not in free
        )]

    # ------------------------------------------------------------------

    def _ensure_capacity(self, needed: int) -> None:
        if self.depth is not None and needed <= self.depth.shape[0]:
            return
        new_cap = max(self.capacity, 1)
        while new_cap < needed:
            new_cap *= 2
        h, w = self.cam.height, self.cam.width

        def grow(arr, shape, dtype=jnp.float32, fill=0):
            fresh = jnp.full(shape, fill, dtype)
            if arr is None:
                return fresh
            return jnp.concatenate([arr, fresh[arr.shape[0]:]], axis=0)

        self.depth = grow(self.depth, (new_cap, h, w))
        self.raw_depth = grow(self.raw_depth, (new_cap, h, w))
        self.nx = grow(self.nx, (new_cap, h, w))
        self.ny = grow(self.ny, (new_cap, h, w))
        self.radius2 = grow(self.radius2, (new_cap, h, w))
        self.intensity = grow(self.intensity, (new_cap, h, w))
        self.rgb = grow(self.rgb, (new_cap, h, w, 3), jnp.uint8)
        q0 = jnp.zeros((new_cap, 4), jnp.float32).at[:, 0].set(1.0)
        if self.q is None:
            self.q = q0
            self.t = jnp.zeros((new_cap, 3), jnp.float32)
        else:
            self.q = jnp.concatenate([self.q, q0[self.q.shape[0]:]], axis=0)
            self.t = jnp.concatenate(
                [self.t,
                 jnp.zeros((new_cap - self.t.shape[0], 3), jnp.float32)],
                axis=0,
            )
        self.valid = grow(self.valid, (new_cap,), jnp.bool_, False)
        self.activation = grow(self.activation, (new_cap,), jnp.int32,
                               INACTIVE)
        fresh_covis = jnp.zeros((new_cap, new_cap), jnp.bool_)
        if self.covis is not None:
            old = self.covis.shape[0]
            fresh_covis = fresh_covis.at[:old, :old].set(self.covis)
        self.covis = fresh_covis
        self.min_depth = grow(self.min_depth, (new_cap,), jnp.float32, 0.0)
        self.max_depth = grow(self.max_depth, (new_cap,), jnp.float32, 0.0)
        self.last_active_iter = grow(
            self.last_active_iter, (new_cap,), jnp.int32, -1)
        self.last_covis_iter = grow(
            self.last_covis_iter, (new_cap,), jnp.int32, -1)
        self.capacity = new_cap

    def add_keyframe(
        self,
        frame: ProcessedFrame,
        global_T_frame: se3.SE3,
        frame_index: int = -1,
    ) -> int:
        """Insert a keyframe (recycling a freed slot when available) +
        device covisibility update; returns its slot id."""
        if self.free_slots:
            kf_id = self.free_slots.pop(0)
        else:
            kf_id = self.count
            self._ensure_capacity(kf_id + 1)
            self.count += 1
            self.frame_indices.append(-1)
        self.frame_indices[kf_id] = frame_index
        raw = frame.raw_depth if frame.raw_depth is not None else frame.depth
        if frame.rgb is not None:
            rgb_u8 = frame.rgb
        else:
            # Gray fallback: replicate the intensity plane (keeps the color
            # pipeline uniform for intensity-only fixtures).
            g = jnp.clip(frame.intensity * 255.0 + 0.5, 0, 255)
            rgb_u8 = jnp.stack([g, g, g], axis=-1).astype(jnp.uint8)
        (self.depth, self.raw_depth, self.nx, self.ny, self.radius2,
         self.intensity, self.rgb, self.q, self.t, self.valid,
         self.activation, self.covis, self.min_depth, self.max_depth,
         self.last_active_iter, self.last_covis_iter) = _store_and_register(
            self.depth, self.raw_depth, self.nx, self.ny, self.radius2,
            self.intensity, self.rgb, self.q, self.t, self.valid,
            self.activation, self.covis, self.min_depth, self.max_depth,
            self.last_active_iter, self.last_covis_iter,
            self.cam, frame.depth, raw, frame.nx, frame.ny, frame.radius2,
            frame.intensity, rgb_u8,
            jnp.asarray(global_T_frame.q), jnp.asarray(global_T_frame.t),
            jnp.int32(kf_id),
        )
        return kf_id

    def remove_keyframe(self, kf_id: int) -> None:
        """Delete a keyframe and return its slot to the free list
        (MergeKeyframes analog — the slot is recycled by the next
        add_keyframe, so capacity stays bounded)."""
        self.valid = self.valid.at[kf_id].set(False)
        self.activation = self.activation.at[kf_id].set(INACTIVE)
        self.covis = self.covis.at[kf_id].set(False)
        self.covis = self.covis.at[:, kf_id].set(False)
        if kf_id < len(self.frame_indices):
            self.frame_indices[kf_id] = -1
        if kf_id not in self.free_slots:
            self.free_slots.append(kf_id)

    # ------------------------------------------------------------------

    def set_pose(self, kf_id: int, pose: se3.SE3) -> None:
        self.q = self.q.at[kf_id].set(jnp.asarray(pose.q))
        self.t = self.t.at[kf_id].set(jnp.asarray(pose.t))

    def set_poses(self, q: jax.Array, t: jax.Array, mask: jax.Array) -> None:
        """Masked bulk pose update over the leading rows (post BA)."""
        self.q, self.t = _masked_pose_update(self.q, self.t, q, t, mask)

    def pose(self, kf_id: int) -> se3.SE3:
        return se3.SE3(self.q[kf_id], self.t[kf_id])

    # ------------------------------------------------------------------

    def mask_for_ids(self, ids) -> jax.Array:
        """[cap] bool mask from host-known keyframe ids (value-free)."""
        m = np.zeros(self.capacity, bool)
        m[np.asarray(list(ids), np.int64)] = True
        return jnp.array(m)

    def stack(self, mask: Optional[jax.Array] = None) -> KeyframeStack:
        """Full-capacity device view; `mask` defaults to the valid mask.
        A host list of keyframe ids is also accepted (tests/tools)."""
        if isinstance(mask, (list, tuple, range)):
            mask = self.mask_for_ids(mask)
        return KeyframeStack(
            self.depth, self.nx, self.ny, self.radius2, self.intensity,
            self.q, self.t,
            self.valid if mask is None else mask,
        )

    def stack_raw(self) -> jax.Array:
        return self.raw_depth

    def active_mask(self, include_covisible: bool = True) -> jax.Array:
        return _active_mask(self.valid, self.activation, include_covisible)

    def propagate_covisible_active(self) -> None:
        self.activation = _propagate_covisible_active(
            self.covis, self.activation, self.valid
        )

    def set_activation_window(self, lo: int, hi: int) -> None:
        """Host-index-driven activation (final windowed BA, main.cc:765-789).
        Value-free: lo/hi are host indices."""
        ids = np.arange(self.capacity)
        window = jnp.array((ids >= lo) & (ids <= hi))
        self.activation = jnp.where(
            self.valid & window, ACTIVE, INACTIVE
        )

    def merge_redundant_keyframes(self, approx_merge_count: int):
        """Invalidate the most redundant keyframes (memory-pressure path,
        MergeKeyframes analog). Scoring and selection run on device; the
        freed slot indices are read back ONCE so the host can recycle them
        — this mirrors the reference's cudaMemGetInfo-gated rare path
        (bad_slam.cc:962-972) and is the only non-loop-closure read.

        Temporal neighbors are host-computed from dataset frame indices
        (value-free) because slot order is not temporal order once slots
        are recycled. Returns the freed slot indices (host list)."""
        order = self.live_slots_in_time_order()
        k = min(approx_merge_count, max(0, len(order) - 2))
        if k == 0:
            return []
        prev = np.full(self.capacity, -1, np.int32)
        nxt = np.full(self.capacity, -1, np.int32)
        for i, s in enumerate(order):
            if i > 0:
                prev[s] = order[i - 1]
            if i + 1 < len(order):
                nxt[s] = order[i + 1]
        scores = _redundancy_scores(
            self.q, self.t, self.valid, jnp.array(prev), jnp.array(nxt)
        )
        _, sel = jax.lax.top_k(-scores, k)
        finite = jnp.isfinite(scores[sel])
        sel_np = np.asarray(sel)          # d2h: rare memory-pressure path
        fin_np = np.asarray(finite)
        freed = [int(i) for i, f in zip(sel_np, fin_np) if f]
        for i in freed:
            self.remove_keyframe(i)
        return freed

    def recalibrate(self, cam, a, cfactor, cell_size: int) -> None:
        """Re-derive calibrated depth / normals / radii for ALL keyframes
        after a self-calibration update (one batched device pass).

        Goes beyond the reference, which keeps creation-time normals/radii
        stale and re-calibrates depth on the fly in kernels
        (util.cuh:62-79); refreshing everything keeps all downstream
        consumers consistent without per-use recalibration cost.
        """
        from badslam_tpu.ba.intrinsics_opt import recalibrate_planes

        if self.raw_depth is None:
            return
        depth, nx, ny, radius2 = recalibrate_planes(
            cam, self.raw_depth, a, cfactor, cell_size=cell_size
        )
        keep = self.valid[:, None, None]
        self.depth = jnp.where(keep, depth, self.depth)
        self.nx = jnp.where(keep, nx, self.nx)
        self.ny = jnp.where(keep, ny, self.ny)
        self.radius2 = jnp.where(keep, radius2, self.radius2)
        v = depth > 0
        self.min_depth = jnp.where(
            self.valid, jnp.min(jnp.where(v, depth, jnp.inf), axis=(1, 2)),
            self.min_depth,
        )
        self.max_depth = jnp.where(
            self.valid, jnp.max(jnp.where(v, depth, 0.0), axis=(1, 2)),
            self.max_depth,
        )


@jax.jit
def _redundancy_scores(q, t, valid, prev, nxt):
    """Per-keyframe merge score: distance+angle to the temporally previous
    and next keyframes, 90deg counting as 0.5 m (MergeKeyframes,
    direct_ba.cc:251-338). `prev`/`nxt` are host-computed temporal neighbor
    slots (-1 at the trajectory ends, which are never merged — this also
    protects keyframe 0). Ineligible keyframes score +inf."""
    cap = q.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]

    R = jax.vmap(se3.quat_to_matrix)(q)
    z_axis = R[:, :, 2]  # viewing directions

    def half_dist(a, b_idx):
        b = jnp.clip(b_idx, 0, cap - 1)
        ang = jnp.arccos(jnp.clip(
            jnp.sum(z_axis[a] * z_axis[b], axis=-1), -1.0, 1.0))
        dist = jnp.linalg.norm(t[a] - t[b], axis=-1)
        ok = (ang <= 0.25 * jnp.pi * 2.0 * 0.5) & (dist <= 0.3)
        return jnp.where(ok, dist + (0.5 / (jnp.pi / 2.0)) * ang, jnp.inf)

    score = half_dist(idx, prev) + half_dist(idx, nxt)
    eligible = valid & (prev >= 0) & (nxt >= 0)
    return jnp.where(eligible, score, jnp.inf)
