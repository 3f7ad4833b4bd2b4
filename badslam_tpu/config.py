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
    start_frame: int = 0  # first dataset frame to process
    end_frame: int = 2147483647  # one past the last frame to process
    target_frame_rate: float = 0.0  # simulate real-time if > 0
    fps_restriction: int = 30  # cap playback at this rate (0 = unlimited)
    pyramid_level_for_depth: int = 0  # process depth at this pyramid level (half-res per level)
    pyramid_level_for_color: int = 0  # process color at this pyramid level (must equal depth level)

    # --- Depth preprocessing ---
    max_depth: float = 3.0  # depth cutoff [m]; measurements beyond are dropped
    baseline_fx: float = 40.0  # stereo baseline times fx: scales the depth uncertainty model
    median_filter_and_densify_iterations: int = 0  # CPU median filter + densify passes on raw depth
    bilateral_filter_sigma_xy: float = 1.5  # bilateral depth filter spatial sigma [px]
    bilateral_filter_radius_factor: float = 2.0  # filter radius = factor * sigma_xy
    bilateral_filter_sigma_inv_depth: float = 0.005  # bilateral value sigma in inverse depth [1/m]

    # --- Surfel reconstruction ---
    # The reference preallocates 25M surfel slots but its kernels iterate
    # only up to the high-water mark (surfels_size_, kernels.cuh). Our map
    # ops run over the full static capacity (read-free design), so the
    # default is sized for VGA-scale scenes; raise it for large maps.
    max_surfel_count: int = 1 << 22
    sparse_surfel_cell_size: int = 4  # sparsification grid cell [px]: at most ~1 surfel per cell
    surfel_merge_dist_factor: float = 0.8  # merge surfels closer than factor * min radius
    min_observation_count_while_bootstrapping_1: int = 1  # observation filter with <= 1 keyframe
    min_observation_count_while_bootstrapping_2: int = 2  # observation filter with 2 keyframes
    min_observation_count: int = 3  # surfels need this many observing keyframes

    # --- Odometry / BA ---
    num_scales: int = 5  # multi-resolution pyramid levels for tracking
    use_motion_model: bool = True  # constant-motion pose prediction (2 extrapolation variants)
    keyframe_interval: int = 10  # create a keyframe every N processed frames
    max_num_ba_iterations_per_keyframe: int = 10  # alternating-BA iterations scheduled per keyframe
    disable_deactivation: bool = True  # keep converged keyframes active (reference default)
    use_geometric_residuals: bool = True  # point-to-plane depth residuals
    use_photometric_residuals: bool = True  # 2-component descriptor (intensity gradient) residuals
    # Track against gradient-magnitude images instead of descriptor
    # residuals (the reference's compile-time `use_gradmag` switch,
    # bad_slam.cc:835, kernel_opt_pose.h:55 _GradMag kernel variants).
    # Pairwise tracking only; BA keeps descriptor residuals.
    use_gradmag: bool = False
    optimize_intrinsics: bool = False  # self-calibrate depth + color intrinsics during BA
    intrinsics_optimization_interval: int = 10  # BA runs between intrinsics optimizations (after warmup)
    do_surfel_updates: bool = True  # create/merge/delete surfels during BA (off = fixed map)
    parallel_ba: bool = True  # queue BA iterations and drain them between frames (BA-thread analog)
    # Fuse ALL steady frames between consecutive keyframes into ONE device
    # program (lax.scan over the frame axis): with keyframe_interval=10
    # this cuts per-frame program submissions ~10x (the TPU relay charges
    # per submission, PERF_NOTES.md). Semantics match the per-frame path;
    # parallel-BA drain granularity becomes per-chunk instead of per-frame.
    # Inactive under fps pacing (fps_restriction/target_frame_rate > 0),
    # with a live viewer (per-frame stepping), or for live streams.
    steady_frame_chunking: bool = True
    use_pcg: bool = False  # final BA uses the global PCG Gauss-Newton solver
    estimate_poses: bool = True  # run odometry (off = playback with given poses)

    # --- Memory ---
    min_free_gpu_memory_mb: int = 250  # merge redundant keyframes when free HBM drops below this

    # --- Loop detection ---
    enable_loop_detection: bool = True  # BoW loop detection + pose-graph closure
    parallel_loop_detection: bool = True  # run detection on a worker thread (results apply 1 keyframe late)
    loop_detection_image_frequency: float = 0.0  # detection-image rate [Hz]; 0 derives fps/keyframe_interval
    # Pre-trained binary vocabulary (.npz from tools/train_vocabulary.py);
    # empty trains a vocabulary on the fly from the sequence's first keyframes
    loop_detection_vocabulary_path: str = ""
    loop_detection_images_width: int = 640  # detection images resized to this width
    loop_detection_images_height: int = 480  # detection images resized to this height
    # Min keyframes between loop-closure ATTEMPTS (the 3-way tracker
    # verification + device closure program, ~70-110 ms host each). At a
    # sustained revisit every keyframe passes the detector's gates and the
    # reference attempts a closure each time (TemplatedLoopDetector's
    # temporal window stays consistent); on a 1-core host that serialized
    # against frame dispatch and collapsed long-run FPS 5x (BENCH_r03/r04
    # final segment). 0 = attempt every detection, reference behavior.
    loop_closure_cooldown_keyframes: int = 2

    # --- Vendor live-input parameters (bad_slam_config.h:287-366) ---
    # Consumed by the SDK-gated input classes (io/live_inputs.py); inert
    # without the vendor SDK, exactly like the reference's stub builds.
    k4a_mode: str = "nfov"  # Azure Kinect depth mode: nfov, nfov_2x2binned, wfov, wfov_2x2binned
    k4a_fps: int = 30  # Azure Kinect FPS: 5, 15 or 30
    k4a_resolution: int = 720  # Azure Kinect color resolution: 720, 1080, 1440, 2160, 3072, 1536
    k4a_factor: int = 1  # downscaling factor for Azure Kinect images
    k4a_use_ir: bool = False  # use IR reflectivity images for color instead of RGB
    k4a_exposure: int = 0  # RGB exposure [us]; 0 = auto-exposure
    k4a_record_path: str = ""  # record a .mkv simultaneously to SLAM
    structure_depth_range: str = "Default"  # depth range preset of the Structure Core
    structure_depth_only: bool = False  # only use the depth (infrared) camera
    structure_depth_resolution: str = "640x480"  # depth capture resolution
    structure_expensive_correction: bool = False  # expensive depth correction
    structure_one_shot_dynamic_calibration: bool = False  # one-shot dynamic calibration
    structure_depth_diff_threshold: float = 0.05  # depth difference threshold [m]
    structure_infrared_auto_exposure: bool = True  # infrared auto-exposure
    structure_visible_exposure_time: float = 0.016  # visible camera exposure [s]

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
    # Multi-chip BA: shard the surfel axis of the fused BA programs over
    # this many devices (jax Mesh + XLA collectives over ICI); keyframe
    # planes replicate. 0/1 = single device (the reference is single-GPU;
    # this is the TPU scaling extension, SURVEY.md 2.9/5.8).
    n_devices: int = 0
    # Plane-streaming threshold for the integrated multi-chip mode: when
    # replicating every keyframe plane to every chip would exceed this many
    # MB, the BA call switches to the plane-STREAMED stage programs
    # (parallel/streamed.py) — planes sharded over the keyframe axis and
    # broadcast chunk-by-chunk over ICI, per-chip plane memory K -> K/D.
    # <= 0 forces streaming whenever a mesh is active (tests/dryrun).
    plane_replication_budget_mb: float = 2048.0
    max_keyframe_count: int = 512  # stacked keyframe array capacity
    surfel_bucket_base: int = 1 << 16  # map ops run on pow2-bucketed slices
    keyframe_bucket_base: int = 8  # keyframe store + BA live-keyframe bucket grow in pow2 steps from this
    tracking_max_iterations: int = 30  # kMaxIterationsPerScale
    # NOTE: no device_dtype knob. Keyframe planes and surfel state are f32
    # by design (the reference packs u16 depth/half radius to save GPU
    # memory, keyframe.h:50-237; on TPU, f32 planes avoid per-use unpack
    # and bf16's 8 mantissa bits are too coarse for metric depth).

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
