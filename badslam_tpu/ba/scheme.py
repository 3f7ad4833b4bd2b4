"""DirectBA: map state owner + the alternating bundle-adjustment scheme.

TPU rebuild of the reference back-end
(/root/reference/applications/badslam/src/badslam/direct_ba.h:65-550,
direct_ba.cc, direct_ba_alternating.cc:285-738). The host drives the
iteration structure (which keyframes are active, when to create / merge /
delete surfels); every compute stage is one jitted device program from
badslam_tpu.ba.* / badslam_tpu.mapping.*.

Per BA iteration (BundleAdjustmentAlternating order):
  surfel creation (newly-activated KFs) -> surfel activation ->
  geometry optimization -> surfel merge + compaction -> per-KF pose
  optimization (+ keyframe re-activation) -> convergence check.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.mapping import keyframes as kfs
from badslam_tpu.mapping import surfels as sf
from badslam_tpu.mapping.frustum import Frustum
from badslam_tpu.mapping.keyframes import KeyframeStore
from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
from badslam_tpu.ba.intrinsics_opt import (
    DepthParams,
    empty_depth_params,
    optimize_intrinsics,
)
from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
from badslam_tpu.ops.preprocess import ProcessedFrame
from badslam_tpu.utils.timing import Timing


class DirectBA:
    def __init__(
        self,
        cam: PinholeCamera,
        config: Optional[BadSlamConfig] = None,
        surfel_capacity: Optional[int] = None,
    ):
        self.config = config or BadSlamConfig()
        self.cam = cam
        cap = surfel_capacity or self.config.max_surfel_count
        self.surfels = sf.empty_map(cap)
        self.keyframes = KeyframeStore(
            cam=cam, capacity=self.config.keyframe_bucket_base
        )
        self.ba_iteration_count = 0
        self.last_ba_iteration_count = -1
        # Depth-deformation self-calibration state (DepthParameters analog).
        self.depth_params: DepthParams = empty_depth_params(
            cam.height, cam.width, self.config.sparse_surfel_cell_size
        )
        self.intrinsics_updated = False

    # ------------------------------------------------------------------
    # Keyframe management
    # ------------------------------------------------------------------

    @property
    def surfel_count(self) -> int:
        return int(self.surfels.count)

    def add_keyframe(
        self, frame: ProcessedFrame, global_T_frame: se3.SE3,
        frame_index: int = -1,
    ) -> int:
        kf_id = self.keyframes.add_keyframe(frame, global_T_frame, frame_index)
        self._determine_new_keyframe_covisibility(kf_id)
        return kf_id

    def _frustum(self, kf_id: int) -> Frustum:
        ks = self.keyframes
        R = np.asarray(se3.quat_to_matrix(ks.q[kf_id]))
        t = np.asarray(ks.t[kf_id])
        return Frustum(self.cam, ks.min_depth[kf_id], ks.max_depth[kf_id], R, t)

    def _determine_new_keyframe_covisibility(self, new_id: int) -> None:
        """DirectBA::DetermineNewKeyframeCoVisibility (direct_ba.cc:231-249)."""
        ks = self.keyframes
        new_frustum = self._frustum(new_id)
        for i in range(ks.count):
            if i == new_id or not ks.valid[i]:
                continue
            if new_frustum.intersects(self._frustum(i)):
                ks.covisibility[new_id].append(i)
                ks.covisibility[i].append(new_id)
                if ks.activation[i] == kfs.INACTIVE:
                    ks.activation[i] = kfs.COVISIBLE_ACTIVE

    # ------------------------------------------------------------------
    # Surfel lifecycle
    # ------------------------------------------------------------------

    def min_observation_count(self) -> int:
        return self.config.min_observation_count_at(
            len(self.keyframes.valid_ids())
        )

    def create_surfels_for_keyframe(
        self, kf_id: int, filter_new_surfels: bool = True
    ) -> int:
        ks = self.keyframes
        covis_ids = [i for i in ks.covisibility[kf_id] if ks.valid[i]]
        covis = ks.stack(covis_ids)
        c = self.config
        self.surfels, created = sf.create_surfels_for_keyframe(
            self.surfels, self.cam,
            ks.q[kf_id], ks.t[kf_id],
            ks.depth[kf_id], ks.nx[kf_id], ks.ny[kf_id],
            ks.radius2[kf_id], ks.intensity[kf_id],
            covis,
            jnp.int32(self.min_observation_count()),
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            filter_new_surfels=filter_new_surfels,
        )
        return int(created)

    def _merge_for_keyframe(self, kf_id: int) -> None:
        ks = self.keyframes
        c = self.config
        self.surfels = sf.merge_surfels_for_frame(
            self.surfels, self.cam,
            ks.q[kf_id], ks.t[kf_id],
            ks.depth[kf_id], ks.nx[kf_id], ks.ny[kf_id],
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            merge_dist_factor=c.surfel_merge_dist_factor,
        )

    def perform_ba_scheme_end_tasks(self, do_surfel_updates: bool = True) -> None:
        """Final merge over recently-active KFs + delete + compact
        (PerformBASchemeEndTasks, direct_ba.cc:566-653)."""
        ks = self.keyframes
        if do_surfel_updates:
            for i in ks.valid_ids():
                if ks.last_active_in_ba_iteration[i] == self.ba_iteration_count:
                    self._merge_for_keyframe(i)
        all_kf = ks.stack(ks.valid_ids())
        self.surfels = sf.delete_surfels_and_update_radii(
            self.surfels, self.cam, all_kf,
            jnp.int32(self.min_observation_count()),
            baseline_fx=self.config.baseline_fx,
        )
        self.surfels = sf.compact_surfels(self.surfels)

    # ------------------------------------------------------------------
    # The alternating BA scheme
    # ------------------------------------------------------------------

    def optimize_intrinsics_step(
        self,
        optimize_depth_intrinsics: bool = True,
        optimize_color_intrinsics: bool = False,
    ) -> None:
        """One intrinsics/deformation GN step over all valid keyframes,
        followed by keyframe-plane recalibration (the reference instead
        re-calibrates lazily inside every kernel, util.cuh:62-79)."""
        ks = self.keyframes
        ids = ks.valid_ids()
        if not ids or int(self.surfels.count) == 0:
            return
        kstack = ks.stack(ids)
        raw = ks.stack_raw(ids)
        c = self.config
        self.cam, self.depth_params = optimize_intrinsics(
            self.surfels, self.cam, kstack, raw, self.depth_params,
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            optimize_depth=optimize_depth_intrinsics,
            optimize_color=optimize_color_intrinsics,
        )
        if optimize_depth_intrinsics:
            ks.recalibrate(
                self.cam, self.depth_params.a, self.depth_params.cfactor,
                c.sparse_surfel_cell_size,
            )
        self.intrinsics_updated = True

    def bundle_adjustment(
        self,
        optimize_poses: bool = True,
        optimize_geometry: bool = True,
        do_surfel_updates: bool = True,
        min_iterations: int = 0,
        max_iterations: int = 10,
        active_keyframe_window: Optional[tuple] = None,
        increase_ba_iteration_count: bool = True,
        time_limit: float = 0.0,
        optimize_depth_intrinsics: bool = False,
        optimize_color_intrinsics: bool = False,
    ) -> int:
        """Run the alternating scheme; returns iterations done."""
        c = self.config
        ks = self.keyframes

        if (not increase_ba_iteration_count
                and self.ba_iteration_count != self.last_ba_iteration_count):
            self.last_ba_iteration_count = self.ba_iteration_count
            self.perform_ba_scheme_end_tasks(do_surfel_updates)

        fixed_window = active_keyframe_window is not None
        if fixed_window:
            lo, hi = active_keyframe_window

        # Reset surfel active flags for this BA block.
        self.surfels = self.surfels._replace(
            active=jnp.zeros_like(self.surfels.active)
        )

        start_time = time.perf_counter()
        iterations_done = 0
        for iteration in range(max_iterations):
            iterations_done += 1
            if fixed_window:
                for i in range(ks.count):
                    if not ks.valid[i]:
                        continue
                    ks.activation[i] = (
                        kfs.ACTIVE if lo <= i <= hi else kfs.INACTIVE
                    )
                ks.determine_covisible_active_keyframes()

            # --- surfel creation for newly active keyframes ---
            keyframes_with_new_surfels: List[int] = []
            if optimize_geometry and do_surfel_updates:
                for i in range(ks.count):
                    if not ks.valid[i]:
                        continue
                    if (ks.activation[i] == kfs.ACTIVE
                            and ks.last_active_in_ba_iteration[i]
                            != self.ba_iteration_count):
                        ks.last_active_in_ba_iteration[i] = self.ba_iteration_count
                        keyframes_with_new_surfels.append(i)
                    elif (ks.activation[i] == kfs.COVISIBLE_ACTIVE
                          and ks.last_covis_in_ba_iteration[i]
                          != self.ba_iteration_count):
                        ks.last_covis_in_ba_iteration[i] = self.ba_iteration_count
                with Timing.time("BA surfel creation"):
                    for i in keyframes_with_new_surfels:
                        self.create_surfels_for_keyframe(i, filter_new_surfels=True)

            # --- surfel activation (old surfels vs Active keyframes) ---
            active_kf_ids = [
                i for i in ks.valid_ids() if ks.activation[i] == kfs.ACTIVE
            ]
            with Timing.time("BA surfel activation"):
                if active_kf_ids:
                    # New surfels were appended with active=True; this pass
                    # recomputes the rest.
                    self.surfels = sf.update_surfel_activation(
                        self.surfels, self.cam, ks.stack(active_kf_ids),
                        baseline_fx=c.baseline_fx,
                    )

            participating = ks.active_ids(include_covisible=True)
            kstack = ks.stack(participating) if participating else None

            # --- geometry optimization ---
            if optimize_geometry and kstack is not None:
                with Timing.time("BA geometry optimization", sync=self.surfels.pos):
                    self.surfels = optimize_geometry_iteration(
                        self.surfels, self.cam, kstack,
                        baseline_fx=c.baseline_fx,
                        use_depth=c.use_geometric_residuals,
                        use_descriptor=c.use_photometric_residuals,
                    )

            # --- merge + compact for keyframes with new surfels ---
            if do_surfel_updates and keyframes_with_new_surfels:
                with Timing.time("BA surfel merge"):
                    for i in keyframes_with_new_surfels:
                        self._merge_for_keyframe(i)
                with Timing.time("BA surfel compaction"):
                    self.surfels = sf.compact_surfels(self.surfels)

            # --- pose optimization (batched over participating KFs) ---
            num_converged = ks.count - len(participating)
            if optimize_poses and kstack is not None:
                with Timing.time("BA pose optimization"):
                    result = optimize_keyframe_poses(
                        self.surfels, self.cam, kstack,
                        baseline_fx=c.baseline_fx,
                        use_depth=c.use_geometric_residuals,
                        use_descriptor=c.use_photometric_residuals,
                        max_iterations=30,
                    )
                    moved = np.asarray(result.moved)
                    for slot, kf_id in enumerate(participating):
                        ks.set_pose(
                            kf_id,
                            se3.SE3(result.q[slot], result.t[slot]),
                        )
                        if moved[slot]:
                            ks.activation[kf_id] = kfs.ACTIVE
                        else:
                            ks.activation[kf_id] = kfs.INACTIVE
                            num_converged += 1

            # --- intrinsics optimization ---
            if optimize_depth_intrinsics or optimize_color_intrinsics:
                with Timing.time("BA intrinsics optimization"):
                    self.optimize_intrinsics_step(
                        optimize_depth_intrinsics and c.use_geometric_residuals,
                        optimize_color_intrinsics and c.use_photometric_residuals,
                    )

            # --- convergence ---
            if iteration >= min_iterations - 1 and (
                num_converged >= len(ks.valid_ids()) or not optimize_poses
            ):
                break
            if time_limit and (time.perf_counter() - start_time) > time_limit:
                break

            ks.determine_covisible_active_keyframes()

        if increase_ba_iteration_count:
            self.perform_ba_scheme_end_tasks(do_surfel_updates)
            self.ba_iteration_count += 1

        return iterations_done

    # ------------------------------------------------------------------
    # Export
    # ------------------------------------------------------------------

    def export_point_cloud(self):
        """(positions, normals, colors) numpy arrays of valid surfels
        (ExportToPointCloud analog, direct_ba.cc:461-547)."""
        m = self.surfels
        valid = np.asarray(m.valid)
        return (
            np.asarray(m.pos)[valid],
            np.asarray(m.normal)[valid],
            np.asarray(m.color)[valid],
        )
