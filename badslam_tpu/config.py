"""Configuration for the SLAM pipeline.

Mirrors the parameter set of the reference's ``BadSlamConfig``
(/root/reference/applications/badslam/src/badslam/bad_slam_config.h:41-377),
plus TPU-specific capacity knobs (static array capacities replace the
reference's dynamic GPU allocations).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class BadSlamConfig:
    # --- Dataset playback ---
    raw_to_float_depth: float = 1.0 / 5000.0  # u16 -> meters factor
    start_frame: int = 0
    end_frame: int = 2147483647
    target_frame_rate: float = 0.0  # simulate real-time if > 0
    fps_restriction: int = 30
    pyramid_level_for_depth: int = 0
    pyramid_level_for_color: int = 0

    # --- Depth preprocessing ---
    max_depth: float = 3.0
    baseline_fx: float = 40.0
    median_filter_and_densify_iterations: int = 0
    bilateral_filter_sigma_xy: float = 1.5
    bilateral_filter_radius_factor: float = 2.0
    bilateral_filter_sigma_inv_depth: float = 0.005

    # --- Surfel reconstruction ---
    # The reference preallocates 25M surfel slots but its kernels iterate
    # only up to the high-water mark (surfels_size_, kernels.cuh). Our map
    # ops run over the full static capacity (read-free design), so the
    # default is sized for VGA-scale scenes; raise it for large maps.
    max_surfel_count: int = 1 << 22
    sparse_surfel_cell_size: int = 4
    surfel_merge_dist_factor: float = 0.8
    min_observation_count_while_bootstrapping_1: int = 1
    min_observation_count_while_bootstrapping_2: int = 2
    min_observation_count: int = 3

    # --- Odometry / BA ---
    num_scales: int = 5
    use_motion_model: bool = True
    keyframe_interval: int = 10
    max_num_ba_iterations_per_keyframe: int = 10
    disable_deactivation: bool = True
    use_geometric_residuals: bool = True
    use_photometric_residuals: bool = True
    # Track against gradient-magnitude images instead of descriptor
    # residuals (the reference's compile-time `use_gradmag` switch,
    # bad_slam.cc:835, kernel_opt_pose.h:55 _GradMag kernel variants).
    # Pairwise tracking only; BA keeps descriptor residuals.
    use_gradmag: bool = False
    optimize_intrinsics: bool = False
    intrinsics_optimization_interval: int = 10
    do_surfel_updates: bool = True
    parallel_ba: bool = True
    use_pcg: bool = False
    estimate_poses: bool = True

    # --- Memory ---
    min_free_gpu_memory_mb: int = 250

    # --- Loop detection ---
    enable_loop_detection: bool = True
    parallel_loop_detection: bool = True
    loop_detection_image_frequency: float = 0.0
    loop_detection_vocabulary_path: str = ""
    loop_detection_images_width: int = 640
    loop_detection_images_height: int = 480

    # Restore the reference's per-iteration BA convergence early exit at the
    # cost of a device->host sync per iteration (keep False on runtimes where
    # readbacks stall, PERF_NOTES.md).
    sync_convergence_checks: bool = False
    # Per-stage device synchronization inside BA for profiling: every stage
    # blocks on its outputs so the stage timers measure real device time
    # instead of async dispatch. Profiling only — serializes the pipeline.
    sync_stage_profiling: bool = False
    # Read the surfel count once per BA call to size the working slice of
    # the map ("surfels_size_" high-water analog, kernels.cuh): BA stage
    # cost then scales with the actual map instead of the static capacity.
    # Disable on runtimes where any readback degrades the session.
    sync_surfel_bucket: bool = True

    # --- TPU-native capacities (static shapes; no reference equivalent) ---
    max_keyframe_count: int = 512  # stacked keyframe array capacity
    surfel_bucket_base: int = 1 << 16  # map ops run on pow2-bucketed slices
    keyframe_bucket_base: int = 8
    tracking_max_iterations: int = 30  # kMaxIterationsPerScale
    device_dtype: str = "float32"

    def pyramid_sizes(self, height: int, width: int):
        """Static (H, W) per scale, finest first."""
        sizes = []
        h, w = height, width
        for _ in range(self.num_scales):
            sizes.append((h, w))
            h, w = h // 2, w // 2
        return sizes

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "BadSlamConfig":
        with open(path) as f:
            data = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    def min_observation_count_at(self, keyframe_count: int) -> int:
        """Bootstrapping-aware observation filter
        (/root/reference/applications/badslam/src/badslam/direct_ba.h:220-226)."""
        if keyframe_count <= 1:
            return self.min_observation_count_while_bootstrapping_1
        if keyframe_count <= 2:
            return self.min_observation_count_while_bootstrapping_2
        return self.min_observation_count
