"""BadSlam front-end: the per-frame SLAM pipeline driver.

TPU rebuild of the reference front-end
(/root/reference/applications/badslam/src/badslam/bad_slam.h:62-363,
bad_slam.cc): preprocess -> odometry vs the base keyframe -> keyframe
policy (every keyframe_interval-th frame) -> bundle adjustment, plus the
constant-motion model, trajectory bookkeeping, and trajectory deformation
after BA.

Device-side work per frame is two jitted programs: `preprocess_frame`
(+ pyramid) and `track_frame_pairwise`; everything else is host control
flow. The BA back-end runs between frames (sequential mode) with a
frame-time budget, mirroring the reference's non-parallel mode; the
parallel/async mode is a planned extension (JAX dispatch is already async,
so tracking and BA device work naturally interleave).
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.geometry import se3_np as s3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.io.dataset import RGBDVideo
from badslam_tpu.ops.preprocess import ProcessedFrame, preprocess_frame
from badslam_tpu.ops.pyramid import build_pyramid
from badslam_tpu.tracking.pairwise import track_frame_pairwise
from badslam_tpu.utils.timing import Timing


# ---------------------------------------------------------------------------
# Jitted steady-state helpers. The per-frame bookkeeping (motion model,
# pose composition, trajectory scatter, history shift) used to run as ~60
# tiny EAGER device ops per frame; through the TPU relay each eager op is
# a separate program dispatch, which capped the frontend at ~4 FPS
# regardless of tracker speed. Fused into two jitted programs (with
# donated trajectory/history buffers) the per-frame host work is 3 jit
# dispatches total.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n",))
def _predict_pose(hist_q, hist_t, n: int):
    """Constant-motion model from the last <=3 base_T_frame estimates
    (PredictFramePose, bad_slam.cc:767-829). `hist` rows are oldest-first;
    `n` is the host-known number of valid rows (static: 3 variants)."""
    last = se3.SE3(hist_q[2], hist_t[2])
    if n < 2:
        return last.q, last.t, last.q, last.t
    prev = se3.SE3(hist_q[1], hist_t[1])
    motion = se3.mul(se3.inverse(prev), last)
    est1 = se3.mul(last, motion)
    if n >= 3:
        pprev = se3.SE3(hist_q[0], hist_t[0])
        prev_motion = se3.mul(se3.inverse(pprev), prev)
        est2 = se3.mul(prev, se3.mul(prev_motion, prev_motion))
    else:
        est2 = est1
    return est1.q, est1.t, est2.q, est2.t


@functools.partial(jax.jit, donate_argnums=(4, 5, 6, 7))
def _frame_update(base_q, base_t, rel_q, rel_t, traj_q, traj_t,
                  hist_q, hist_t, idx):
    """Post-track bookkeeping in ONE program: global = base ∘ rel,
    trajectory scatter at `idx`, motion-history shift. Donates the
    trajectory/history buffers (in-place on device)."""
    g = se3.mul(se3.SE3(base_q, base_t), se3.SE3(rel_q, rel_t))
    traj_q = traj_q.at[idx].set(g.q)
    traj_t = traj_t.at[idx].set(g.t)
    hist_q = jnp.roll(hist_q, -1, axis=0).at[2].set(rel_q)
    hist_t = jnp.roll(hist_t, -1, axis=0).at[2].set(rel_t)
    return traj_q, traj_t, hist_q, hist_t, g.q, g.t


def _identity_hist():
    q = jnp.zeros((3, 4), jnp.float32).at[:, 0].set(1.0)
    t = jnp.zeros((3, 3), jnp.float32)
    return q, t


@functools.lru_cache(maxsize=16)
def _steady_frame_fn(key):
    """Fused steady-state frame program, cached per config signature.

    ONE jitted program per frame: preprocess -> pyramid -> motion model ->
    multi-scale tracking -> pose composition + trajectory scatter + history
    shift (donated buffers). The TPU relay charges ~2.5-3 ms per program
    submission under load (tools/probe_frame_phases.py), so the previous
    5-program frame structure dominated the full-SLAM loop; fusing leaves
    2 uploads + 1 program per steady frame.
    """
    (max_depth, sigma_xy, radius_factor, sigma_inv_depth, cell_size,
     raw_to_float, num_scales, use_gradmag, baseline_fx, use_depth,
     use_descriptor, use_motion_model, max_iterations,
     median_iterations) = key

    @functools.partial(jax.jit, static_argnames=("test_two",),
                       donate_argnums=(10, 11, 12, 13))
    def steady(cam, cams, base_pyr, depth_raw, rgb, undistort_map, a,
               cfactor, base_q, base_t, traj_q, traj_t, hist_q, hist_t,
               idx, *, test_two: bool):
        frame = preprocess_frame.__wrapped__(
            cam, depth_raw, rgb,
            max_depth=max_depth, sigma_xy=sigma_xy,
            radius_factor=radius_factor, sigma_inv_depth=sigma_inv_depth,
            a=a, cfactor=cfactor, cell_size=cell_size,
            undistort_map=undistort_map,
            raw_to_float_depth=raw_to_float,
            median_iterations=median_iterations,
        )
        pyramid = build_pyramid.__wrapped__(
            frame.depth, frame.nx, frame.ny, frame.intensity,
            num_scales, use_gradmag,
        )
        # Constant-motion model (PredictFramePose, bad_slam.cc:767-829).
        # The history is identity-padded at reset, so the full 3-pose
        # formula reduces exactly to the short-history cases — one program
        # per duel mode instead of one per history length (each extra
        # variant is a cold compile through the relay).
        last = se3.SE3(hist_q[2], hist_t[2])
        if not use_motion_model:
            e1 = e2 = last
        else:
            prev = se3.SE3(hist_q[1], hist_t[1])
            motion = se3.mul(se3.inverse(prev), last)
            e1 = se3.mul(last, motion)
            if test_two:
                pprev = se3.SE3(hist_q[0], hist_t[0])
                pm = se3.mul(se3.inverse(pprev), prev)
                e2 = se3.mul(prev, se3.mul(pm, pm))
            else:
                e2 = e1
        res = track_frame_pairwise.__wrapped__(
            cams, base_pyr, pyramid, e1.q, e1.t, e2.q, e2.t,
            baseline_fx=baseline_fx,
            use_depth=use_depth,
            use_descriptor=use_descriptor,
            use_gradmag=use_gradmag,
            test_two_initial_estimates=test_two,
            max_iterations=max_iterations,
        )
        g = se3.mul(se3.SE3(base_q, base_t), se3.SE3(res.q, res.t))
        traj_q = traj_q.at[idx].set(g.q)
        traj_t = traj_t.at[idx].set(g.t)
        hist_q = jnp.roll(hist_q, -1, axis=0).at[2].set(res.q)
        hist_t = jnp.roll(hist_t, -1, axis=0).at[2].set(res.t)
        return frame, pyramid, traj_q, traj_t, hist_q, hist_t, g.q, g.t

    return steady


@functools.lru_cache(maxsize=16)
def _chunk_frames_fn(key, n):
    """Fused steady-frame CHUNK program: all `n` steady frames between two
    keyframes processed by ONE jitted lax.scan (preprocess -> pyramid ->
    motion model -> tracking -> trajectory/history update per frame).

    The per-frame fused program still pays one program submission + two
    uploads per frame on the TPU relay (~2.5-3 ms/submission under load,
    PERF_NOTES.md); with keyframe_interval=10 this program replaces nine
    submissions + eighteen uploads with ONE submission + two batched
    uploads. The scan body is identical math to `_steady_frame_fn`; the
    initial-estimate duel gate (PredictFramePose's two variants,
    bad_slam.cc:767-829) becomes a traced `hist_n >= 3` select carried
    through the scan instead of a static program variant."""
    (max_depth, sigma_xy, radius_factor, sigma_inv_depth, cell_size,
     raw_to_float, num_scales, use_gradmag, baseline_fx, use_depth,
     use_descriptor, use_motion_model, max_iterations,
     median_iterations) = key

    @functools.partial(jax.jit, donate_argnums=(10, 11, 12, 13))
    def chunk(cam, cams, base_pyr, depth_raw, rgb, undistort_map, a,
              cfactor, base_q, base_t, traj_q, traj_t, hist_q, hist_t,
              idx0, hist_n0):
        def body(carry, x):
            hq, ht, hn = carry
            d, r = x
            frame = preprocess_frame.__wrapped__(
                cam, d, r,
                max_depth=max_depth, sigma_xy=sigma_xy,
                radius_factor=radius_factor,
                sigma_inv_depth=sigma_inv_depth,
                a=a, cfactor=cfactor, cell_size=cell_size,
                undistort_map=undistort_map,
                raw_to_float_depth=raw_to_float,
                median_iterations=median_iterations,
            )
            pyramid = build_pyramid.__wrapped__(
                frame.depth, frame.nx, frame.ny, frame.intensity,
                num_scales, use_gradmag,
            )
            last = se3.SE3(hq[2], ht[2])
            if not use_motion_model:
                e1 = e2 = last
            else:
                prev = se3.SE3(hq[1], ht[1])
                motion = se3.mul(se3.inverse(prev), last)
                e1 = se3.mul(last, motion)
                pprev = se3.SE3(hq[0], ht[0])
                pm = se3.mul(se3.inverse(pprev), prev)
                est2 = se3.mul(prev, se3.mul(pm, pm))
                use2 = hn >= 3
                e2 = se3.SE3(jnp.where(use2, est2.q, e1.q),
                             jnp.where(use2, est2.t, e1.t))
            res = track_frame_pairwise.__wrapped__(
                cams, base_pyr, pyramid, e1.q, e1.t, e2.q, e2.t,
                baseline_fx=baseline_fx,
                use_depth=use_depth,
                use_descriptor=use_descriptor,
                use_gradmag=use_gradmag,
                test_two_initial_estimates=use_motion_model,
                max_iterations=max_iterations,
            )
            g = se3.mul(se3.SE3(base_q, base_t), se3.SE3(res.q, res.t))
            hq = jnp.roll(hq, -1, axis=0).at[2].set(res.q)
            ht = jnp.roll(ht, -1, axis=0).at[2].set(res.t)
            return (hq, ht, hn + 1), (g.q, g.t)

        (hist_q, hist_t, _), (gq, gt) = jax.lax.scan(
            body, (hist_q, hist_t, hist_n0), (depth_raw, rgb), length=n)
        traj_q = jax.lax.dynamic_update_slice(traj_q, gq, (idx0, 0))
        traj_t = jax.lax.dynamic_update_slice(traj_t, gt, (idx0, 0))
        return traj_q, traj_t, hist_q, hist_t, gq[n - 1], gt[n - 1]

    return chunk


class BadSlam:
    """Owns the full SLAM state and processes frames one at a time."""

    def __init__(
        self,
        config: BadSlamConfig,
        video: RGBDVideo,
        surfel_capacity: Optional[int] = None,
    ):
        self.config = config
        self.video = video
        self.cam: PinholeCamera = video.camera

        # Input pyramid level: process at a coarser resolution
        # (pyramid_level_for_depth/color, bad_slam.cc:666-688). The single
        # shared camera requires equal levels (the reference also FATALs on
        # unsupported combinations, bad_slam.cc:306-309).
        if config.pyramid_level_for_depth != config.pyramid_level_for_color:
            raise NotImplementedError(
                "pyramid_level_for_depth must equal pyramid_level_for_color")
        self.input_level = config.pyramid_level_for_depth
        if (self.input_level > 0
                and config.median_filter_and_densify_iterations > 0):
            # Matches the reference FATAL (bad_slam.cc:671-673).
            raise NotImplementedError(
                "simultaneous downscaling and median filtering of depth "
                "maps is not implemented (as in the reference)")
        if self.input_level > 0:
            if getattr(video, "undistortion_map", None) is not None:
                raise NotImplementedError(
                    "input pyramid levels cannot be combined with "
                    "undistortion (as in the reference, bad_slam.cc:306)")
            self.cam = self.cam.scaled(0.5 ** self.input_level)

        self.direct_ba = DirectBA(self.cam, config, surfel_capacity)

        self.cams_pyramid = tuple(
            self.cam.pyramid_level(i) for i in range(config.num_scales)
        )

        # Device remap table for distorted source images (loader-built).
        self._undistort_map = None
        if getattr(video, "undistortion_map", None) is not None:
            self._undistort_map = jnp.array(video.undistortion_map)

        # Base keyframe state (bad_slam.h: base_kf_*).
        self.base_kf_id: Optional[int] = None
        self.base_kf_global_T_frame = se3.identity()
        self.base_kf_pyramid = None
        # Relative pose history vs the base keyframe (bad_slam.cc:553-563):
        # device [3, 4]/[3, 3] ring (oldest first) + host-known length.
        self._hist_q, self._hist_t = _identity_hist()
        self._hist_n = 0

        # Trajectory: device-resident stacked pose buffers (static [F] shape
        # known from the dataset) + a host validity mask. Device-resident so
        # post-BA trajectory deformation runs as one jitted program with no
        # device->host reads (PERF_NOTES.md).
        n_frames = max(1, len(video))
        self.traj_q = jnp.zeros((n_frames, 4), jnp.float32).at[:, 0].set(1.0)
        self.traj_t = jnp.zeros((n_frames, 3), jnp.float32)
        self.has_pose = np.zeros(n_frames, bool)
        self.last_frame_index = -1
        self.queued_ba_keyframes: List[int] = []
        self.final_ba_done = False
        self.bundle_adjustment_counter = 0
        # Device-resident closure counter: closures are verified and
        # applied by a masked device program (read-free), so the host
        # cannot know whether one landed without a read. Read via the
        # loop_closure_count property — diagnostics/end-of-run only.
        self._closure_count_dev = jnp.int32(0)
        self._warned_pcg_parallel = False
        # Parallel-BA mode: iterations queued at keyframes, drained a few
        # per frame between keyframes (the reference's BA-thread iteration
        # queue, bad_slam.h:301-325; on one chip JAX's async dispatch
        # interleaves the device work the same way stream priorities do).
        self.queued_ba_iterations = 0
        self.chunks_processed = 0  # fused steady-chunk calls (diagnostics)
        # Degraded-session detectors (host clocks only; SURVEY §5.3 + the
        # runtime-specific failure mode in PERF_NOTES.md): separate
        # baselines for the per-frame and per-chunk programs.
        from badslam_tpu.utils.watchdog import DispatchWatch

        self._frame_watch = DispatchWatch("steady frame dispatch")
        self._chunk_watch = DispatchWatch("steady chunk dispatch")
        self._last_canary_check = 0.0

        # Optional quasi-live viewer (viz.viewer.LiveViewer). Each snapshot
        # reads device state — set only for interactive runs, never when
        # benchmarking (PERF_NOTES.md).
        self.live_viewer = None

        # Known-length dataset: pre-size the keyframe store and the surfel
        # bound so NO array capacity grows mid-run. Every capacity/bucket
        # growth re-specializes the fused frame/BA programs — a full
        # recompile, minutes each through the TPU relay — so a 240-frame
        # run used to pay ~10 such compiles; pre-sized it pays one set.
        # Live streams (unknown length) keep dynamic pow-2 growth.
        if (not hasattr(video, "wait_for_frame") and len(video) > 0
                and config.keyframe_interval > 0):
            frames = max(0, min(len(video), config.end_frame)
                         - config.start_frame)
            expected_kf = min(frames // config.keyframe_interval + 2,
                              config.max_keyframe_count)
            self.direct_ba.keyframes._ensure_capacity(expected_kf)
            self.direct_ba.prebudget_epochs(expected_kf)

        # Fused steady-frame path eligibility + config signature. The
        # undistortion remap and the median filter run INSIDE the fused
        # program (real ETH3D/TUM datasets are distorted — keeping them on
        # the one-program path is the difference between ~3 programs/frame
        # and 1 on the relay); only input pyramid levels (host downscale)
        # keep the unfused fallback.
        c = config
        self._steady_ok = self.input_level == 0
        self._steady_key = (
            c.max_depth, c.bilateral_filter_sigma_xy,
            c.bilateral_filter_radius_factor,
            c.bilateral_filter_sigma_inv_depth,
            c.sparse_surfel_cell_size, c.raw_to_float_depth,
            c.num_scales, c.use_gradmag, c.baseline_fx,
            c.use_geometric_residuals,
            c.use_photometric_residuals and not c.use_gradmag,
            c.use_motion_model, c.tracking_max_iterations,
            c.median_filter_and_densify_iterations,
        )

        self.loop_detector = None
        self._loop_thread = None
        self._loop_pending_seq = -1
        # Host keyframe-count clock of the last closure ATTEMPT (rate
        # limit; config.loop_closure_cooldown_keyframes). Value-free.
        self._last_closure_attempt_kf = -(1 << 30)
        if config.enable_loop_detection:
            from badslam_tpu.loop import LoopDetector

            det_size = None
            if (config.loop_detection_images_width > 0
                    and config.loop_detection_images_height > 0):
                det_size = (config.loop_detection_images_width,
                            config.loop_detection_images_height)
            # Detection-image frequency: explicit config value, else derived
            # as fps_restriction / keyframe_interval (the reference's
            # formula, bad_slam_config.h:371-372). DLoopDetector turns this
            # into the recency exclusion window (dislocal = 20s * f).
            freq = config.loop_detection_image_frequency
            if freq <= 0 and config.keyframe_interval > 0:
                freq = config.fps_restriction / float(config.keyframe_interval)
            self.loop_detector = LoopDetector(
                cam=self.cam,
                vocabulary_path=config.loop_detection_vocabulary_path,
                images_size=det_size,
                image_frequency=freq,
            )
            if config.parallel_loop_detection:
                from badslam_tpu.loop.thread import LoopDetectionThread

                self._loop_thread = LoopDetectionThread(self.loop_detector)

    def close(self) -> None:
        """Stop owned worker threads (idempotent). The detection thread is
        a daemon, so leaking it never blocks interpreter exit — but each
        leaked worker keeps a live queue.get waiter for the process
        lifetime (visible as thread pileup in crash dumps when many
        frontends are created in one process, e.g. the test suite)."""
        t, self._loop_thread = self._loop_thread, None
        if t is not None:
            t.stop()

    def _check_degradation(self, watch, tripped: bool,
                           last_frame_index: int) -> None:
        """Watchdog trip handling (SURVEY §5.3 'act on detection', the
        analog of the reference's OOM guard acting via MergeKeyframes,
        bad_slam.cc:962-972). A trip alone is ambiguous on the 1-core box
        (the detection worker stealing CPU inflates dispatch clocks), so a
        known-cost CANARY program discriminates: healthy -> re-arm the
        watch and continue; confirmed per-kernel sync fallback -> raise
        DegradedSessionError, which the CLI turns into save_state + exec
        of a fresh process resuming via --load_state."""
        from badslam_tpu.utils import watchdog as wd

        fake = wd.fake_degrade_at()
        if 0 <= fake <= last_frame_index:
            # Test injection. The CLI recovery handler clears the env var
            # before exec'ing the resume process, so this fires once.
            raise wd.DegradedSessionError(last_frame_index)
        if not tripped:
            return
        now = time.perf_counter()
        if now - self._last_canary_check < 30.0:
            watch.reset_trip(quiet_s=30.0)
            return
        self._last_canary_check = now
        if wd.probe_degradation():
            raise wd.DegradedSessionError(last_frame_index)
        from badslam_tpu.utils.logging import warning

        warning("%s: canary probe healthy — the trip was transient "
                "host/queue contention, continuing", watch.name)
        watch.reset_trip(quiet_s=30.0)

    @property
    def loop_closure_count(self) -> int:
        """Number of applied loop closures. DEVICE READ — never call in
        the steady loop on the axon runtime (PERF_NOTES.md); exports,
        checkpoints, and post-run diagnostics only."""
        return int(self._closure_count_dev)

    @loop_closure_count.setter
    def loop_closure_count(self, value: int) -> None:
        self._closure_count_dev = jnp.int32(value)

    # ------------------------------------------------------------------
    # Trajectory accessors (device buffers; list view for export/state)
    # ------------------------------------------------------------------

    def _set_frame_pose(self, frame_index: int, pose: se3.SE3) -> None:
        self.traj_q = self.traj_q.at[frame_index].set(jnp.asarray(pose.q))
        self.traj_t = self.traj_t.at[frame_index].set(jnp.asarray(pose.t))
        self.has_pose[frame_index] = True

    def frame_pose(self, frame_index: int) -> Optional[se3.SE3]:
        if not self.has_pose[frame_index]:
            return None
        return se3.SE3(self.traj_q[frame_index], self.traj_t[frame_index])

    @property
    def frame_poses(self) -> List[Optional[se3.SE3]]:
        """List view of the trajectory (device slices — not a host read)."""
        return [
            se3.SE3(self.traj_q[i], self.traj_t[i]) if self.has_pose[i]
            else None
            for i in range(self.traj_q.shape[0])
        ]

    @frame_poses.setter
    def frame_poses(self, poses) -> None:
        n = max(1, len(poses))
        q = np.zeros((n, 4), np.float32)
        q[:, 0] = 1.0
        t = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        for i, p in enumerate(poses):
            if p is None:
                continue
            q[i] = np.asarray(p.q, np.float32)
            t[i] = np.asarray(p.t, np.float32)
            has[i] = True
        self.traj_q = jnp.array(q)
        self.traj_t = jnp.array(t)
        self.has_pose = has

    # ------------------------------------------------------------------

    def preprocess(self, frame_index: int) -> Tuple[ProcessedFrame, tuple]:
        """Load + preprocess one frame; returns (frame, pyramid)."""
        c = self.config
        depth_u16 = self.video.depth_u16(frame_index)
        rgb = self.video.color_u8(frame_index)
        # Upload raw u16; the metric conversion (and undistortion + median
        # filtering) happens inside preprocess_frame on device. Input
        # pyramid levels transform on the host and convert here instead.
        raw_to_float = c.raw_to_float_depth
        if self.input_level > 0:
            # Host-side input-pyramid downscale (the reference FATALs on
            # combining it with the median filter, bad_slam.cc:671-673).
            from badslam_tpu.ops.preprocess import (
                downscale_color,
                downscale_depth_median,
            )

            depth = jnp.array(depth_u16.astype(np.float32)
                              * c.raw_to_float_depth)
            raw_to_float = None
            rgb_d = jnp.array(rgb)
            for _ in range(self.input_level):
                depth = downscale_depth_median(depth)
                rgb_d = downscale_color(rgb_d)
            rgb = rgb_d
        else:
            depth = jnp.array(depth_u16)
        params = self.direct_ba.depth_params
        frame = preprocess_frame(
            self.cam, depth, jnp.array(rgb),
            max_depth=c.max_depth,
            sigma_xy=c.bilateral_filter_sigma_xy,
            radius_factor=c.bilateral_filter_radius_factor,
            sigma_inv_depth=c.bilateral_filter_sigma_inv_depth,
            a=params.a,
            cfactor=params.cfactor,
            cell_size=c.sparse_surfel_cell_size,
            undistort_map=self._undistort_map,
            raw_to_float_depth=raw_to_float,
            median_iterations=c.median_filter_and_densify_iterations,
        )
        pyramid = build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, c.num_scales,
            gradmag=c.use_gradmag,
        )
        return frame, pyramid

    @property
    def base_kf_tr_frame(self) -> List[se3.SE3]:
        """Compatibility view of the motion history (state snapshots)."""
        n = min(self._hist_n, 3)
        return [se3.SE3(self._hist_q[3 - n + i], self._hist_t[3 - n + i])
                for i in range(n)]

    @base_kf_tr_frame.setter
    def base_kf_tr_frame(self, poses) -> None:
        q, t = _identity_hist()
        for i, p in enumerate(poses[-3:]):
            row = 3 - min(len(poses), 3) + i
            q = q.at[row].set(jnp.asarray(p.q))
            t = t.at[row].set(jnp.asarray(p.t))
        self._hist_q, self._hist_t = q, t
        self._hist_n = len(poses)

    def predict_frame_pose(self) -> Tuple[se3.SE3, se3.SE3]:
        """Constant-motion model (PredictFramePose, bad_slam.cc:767-829)."""
        n = min(self._hist_n, 3)
        if not self.config.use_motion_model:
            n = min(n, 1)
        e1q, e1t, e2q, e2t = _predict_pose(self._hist_q, self._hist_t, n)
        return se3.SE3(e1q, e1t), se3.SE3(e2q, e2t)

    def run_odometry(self, pyramid) -> se3.SE3:
        """Track the current frame against the base keyframe."""
        c = self.config
        n = min(self._hist_n, 3) if self.config.use_motion_model else 1
        e1q, e1t, e2q, e2t = _predict_pose(self._hist_q, self._hist_t, n)
        result = track_frame_pairwise(
            self.cams_pyramid,
            self.base_kf_pyramid,
            pyramid,
            e1q, e1t, e2q, e2t,
            baseline_fx=c.baseline_fx,
            use_depth=c.use_geometric_residuals,
            use_descriptor=(c.use_photometric_residuals
                            and not c.use_gradmag),
            use_gradmag=c.use_gradmag,
            test_two_initial_estimates=(
                c.use_motion_model and self._hist_n >= 3
            ),
            max_iterations=c.tracking_max_iterations,
        )
        return se3.SE3(result.q, result.t)

    # ------------------------------------------------------------------

    def process_frame(self, frame_index: int) -> se3.SE3:
        """Full per-frame pipeline (ProcessFrame, bad_slam.cc:174-283).
        Returns the frame's estimated global_T_frame."""
        c = self.config
        is_first = self.base_kf_id is None
        frame_tripped = False
        if not is_first and c.estimate_poses and self._steady_ok:
            # Fused path: 2 uploads + ONE program (preprocess + pyramid +
            # motion model + tracking + trajectory/history update).
            _t0 = time.perf_counter()
            with Timing.time("frame (fused)"):
                params = self.direct_ba.depth_params
                base = self.base_kf_global_T_frame
                test_two = c.use_motion_model and self._hist_n >= 3
                fn = _steady_frame_fn(self._steady_key)
                (frame, pyramid, self.traj_q, self.traj_t, self._hist_q,
                 self._hist_t, gq, gt) = fn(
                    self.cam, self.cams_pyramid, self.base_kf_pyramid,
                    jnp.asarray(self.video.depth_u16(frame_index)),
                    jnp.asarray(self.video.color_u8(frame_index)),
                    self._undistort_map,
                    params.a, params.cfactor,
                    jnp.asarray(base.q), jnp.asarray(base.t),
                    self.traj_q, self.traj_t, self._hist_q, self._hist_t,
                    jnp.int32(frame_index), test_two=test_two,
                )
            frame_tripped = self._frame_watch.sample(
                time.perf_counter() - _t0)
            global_T_frame = se3.SE3(gq, gt)
            self.has_pose[frame_index] = True
        else:
            with Timing.time("preprocessing"):
                frame, pyramid = self.preprocess(frame_index)

            if is_first:
                base_T_frame = se3.identity()
                global_T_frame = (
                    self.video.poses[frame_index] or se3.identity()
                )
            else:
                if c.estimate_poses:
                    with Timing.time("odometry", sync=None):
                        base_T_frame = self.run_odometry(pyramid)
                else:
                    base_T_frame = se3.SE3(self._hist_q[2], self._hist_t[2])

            # Pose composition + trajectory scatter + history shift in one
            # jitted program with donated buffers (see _frame_update).
            base = self.base_kf_global_T_frame
            (self.traj_q, self.traj_t, self._hist_q, self._hist_t,
             gq, gt) = _frame_update(
                jnp.asarray(base.q), jnp.asarray(base.t),
                jnp.asarray(base_T_frame.q), jnp.asarray(base_T_frame.t),
                self.traj_q, self.traj_t, self._hist_q, self._hist_t,
                jnp.int32(frame_index),
            )
            global_T_frame = (global_T_frame if is_first
                              else se3.SE3(gq, gt))
            if is_first:
                # The first frame's pose is the dataset prior, not base∘rel.
                self._set_frame_pose(frame_index, global_T_frame)
            else:
                self.has_pose[frame_index] = True
        self._hist_n += 1
        self.video.set_pose(frame_index, global_T_frame)
        self.last_frame_index = frame_index
        # Frame boundary: the frame's bookkeeping is complete, so a
        # confirmed degradation raised here resumes cleanly at
        # frame_index + 1 (state snapshots resume from last_frame_index).
        self._check_degradation(self._frame_watch, frame_tripped,
                                frame_index)

        # Drain queued BA iterations between keyframes (parallel BA mode).
        if self.queued_ba_iterations > 0:
            old_kq, old_kt = self._remember_keyframe_poses()
            n = min(self.queued_ba_iterations, 2)
            self.direct_ba.bundle_adjustment(
                max_iterations=n,
                do_surfel_updates=c.do_surfel_updates,
                increase_ba_iteration_count=False,
            )
            self.queued_ba_iterations -= n
            self._apply_ba_pose_updates(old_kq, old_kt)

        # Keyframe policy: every keyframe_interval-th processed frame
        # (bad_slam.cc:202-204), plus always the first.
        frames_processed = frame_index - c.start_frame
        if is_first or frames_processed % c.keyframe_interval == 0:
            # Memory-pressure guard: merge redundant keyframes when the
            # store approaches its configured bound OR free HBM falls under
            # min_free_gpu_memory_mb (cudaMemGetInfo analog via the PJRT
            # allocator — a host query, not a device read;
            # bad_slam.cc:962-972). Freed slots are recycled by
            # add_keyframe, so device capacity stays bounded.
            ks = self.direct_ba.keyframes
            low_memory = False
            if c.min_free_gpu_memory_mb > 0 and ks.live_count > 4:
                from badslam_tpu.utils.memory import free_device_memory_mb

                free_mb = free_device_memory_mb()
                low_memory = (free_mb is not None
                              and free_mb < c.min_free_gpu_memory_mb)
            if low_memory or ks.live_count >= c.max_keyframe_count - 2:
                freed = ks.merge_redundant_keyframes(4)
                for slot in freed:
                    if self._loop_thread is not None:
                        self._loop_thread.remove(slot)
                    elif self.loop_detector is not None:
                        self.loop_detector.remove_keyframe(slot)
                if not freed and ks.live_count >= c.max_keyframe_count:
                    from badslam_tpu.utils.logging import warning

                    warning(
                        "keyframe budget exceeded (%d live >= %d) and no "
                        "keyframe was mergeable", ks.live_count,
                        c.max_keyframe_count,
                    )

            self.create_keyframe(frame_index, frame, pyramid, global_T_frame)

            if c.max_num_ba_iterations_per_keyframe > 0 and not is_first:
                # Self-calibration gating: not before 10 keyframes (too
                # little data), every BA run between 10 and 20, then every
                # intrinsics_optimization_interval-th (bad_slam.cc:238-246).
                kf_count = self.direct_ba.keyframes.count
                opt_intr = (
                    c.optimize_intrinsics
                    and kf_count >= 10
                    and (kf_count <= 20
                         or self.bundle_adjustment_counter
                         % c.intrinsics_optimization_interval == 0)
                )
                self.bundle_adjustment_counter += 1
                old_kq, old_kt = self._remember_keyframe_poses()
                if c.use_pcg and c.parallel_ba:
                    # The reference refuses PCG in parallel mode
                    # (bad_slam.cc:1273-1276: "not supported for real-time
                    # running, using the alternating solver instead").
                    if not self._warned_pcg_parallel:
                        from badslam_tpu.utils.logging import warning

                        warning(
                            "use_pcg is not supported with parallel_ba; "
                            "using the alternating solver (run with "
                            "--parallel_ba false for live PCG)")
                        self._warned_pcg_parallel = True
                if c.use_pcg and not c.parallel_ba:
                    # Sequential per-keyframe PCG BA (bad_slam.cc:485-525
                    # passes config_.use_pcg into BundleAdjustment).
                    from badslam_tpu.ba.pcg import pcg_bundle_adjustment

                    with Timing.time("bundle adjustment (PCG)"):
                        pcg_bundle_adjustment(
                            self.direct_ba,
                            max_iterations=min(
                                c.max_num_ba_iterations_per_keyframe, 10),
                            optimize_intrinsics=(
                                opt_intr and c.use_geometric_residuals),
                            do_surfel_updates=c.do_surfel_updates,
                        )
                elif c.parallel_ba:
                    # Run a couple of iterations now, queue the rest to be
                    # drained between frames.
                    with Timing.time("bundle adjustment"):
                        self.direct_ba.bundle_adjustment(
                            max_iterations=2,
                            do_surfel_updates=c.do_surfel_updates,
                            optimize_depth_intrinsics=(
                                opt_intr and c.use_geometric_residuals),
                            optimize_color_intrinsics=(
                                opt_intr and c.use_photometric_residuals),
                        )
                    self.queued_ba_iterations += max(
                        0, c.max_num_ba_iterations_per_keyframe - 2)
                else:
                    with Timing.time("bundle adjustment"):
                        self.direct_ba.bundle_adjustment(
                            max_iterations=c.max_num_ba_iterations_per_keyframe,
                            do_surfel_updates=c.do_surfel_updates,
                            optimize_depth_intrinsics=(
                                opt_intr and c.use_geometric_residuals),
                            optimize_color_intrinsics=(
                                opt_intr and c.use_photometric_residuals),
                        )
                self._apply_ba_pose_updates(old_kq, old_kt)
                if self.direct_ba.intrinsics_updated:
                    self.cam = self.direct_ba.cam
                    self.cams_pyramid = tuple(
                        self.cam.pyramid_level(i) for i in range(c.num_scales)
                    )
                    self.direct_ba.intrinsics_updated = False
                # BA moved the keyframes: the returned pose must reflect
                # the deformed trajectory, not the pre-BA composition.
                return self.frame_pose(frame_index)

        return global_T_frame

    # ------------------------------------------------------------------
    # Steady-frame chunking (TPU throughput mode)
    # ------------------------------------------------------------------

    def _chunk_len(self) -> int:
        """Static chunk length: the steady frames between two keyframes.
        One fixed length = ONE compile variant for the whole run."""
        return self.config.keyframe_interval - 1

    def chunk_eligible(self, i: int, end: int) -> bool:
        """True if frames [i, i+chunk_len) are all steady (non-keyframe)
        frames that the fused chunk program can process as one submission."""
        c = self.config
        n = self._chunk_len()
        return (
            c.steady_frame_chunking and n >= 2
            and self._steady_ok and c.estimate_poses
            and self.base_kf_id is not None
            and self.live_viewer is None
            and c.fps_restriction <= 0 and c.target_frame_rate <= 0
            and not hasattr(self.video, "wait_for_frame")
            and i + n <= end
            # the chunk must sit exactly between two keyframes
            and (i - c.start_frame) % c.keyframe_interval == 1
        )

    def _process_chunk(self, start: int, n: int) -> None:
        """Process `n` consecutive steady frames as ONE fused program
        (2 batched uploads + 1 submission; see `_chunk_frames_fn`).
        Parallel-BA iterations drain once per chunk (2 per frame worth),
        after the chunk's trajectory writes — the post-drain trajectory
        deformation then corrects the chunk's frames exactly as the
        per-frame path's deformation does."""
        c = self.config
        depths = np.stack(
            [self.video.depth_u16(start + j) for j in range(n)])
        rgbs = np.stack([self.video.color_u8(start + j) for j in range(n)])
        _t0 = time.perf_counter()
        with Timing.time("frame chunk (fused)"):
            # Upload vs dispatch split so inflation under load attributes
            # correctly (H2D stalling behind a deep relay queue looks
            # different from GIL/dispatch starvation by worker threads).
            with Timing.time("frame chunk upload"):
                d_dev = jnp.asarray(depths)
                r_dev = jnp.asarray(rgbs)
            params = self.direct_ba.depth_params
            base = self.base_kf_global_T_frame
            fn = _chunk_frames_fn(self._steady_key, n)
            (self.traj_q, self.traj_t, self._hist_q, self._hist_t,
             gq, gt) = fn(
                self.cam, self.cams_pyramid, self.base_kf_pyramid,
                d_dev, r_dev,
                self._undistort_map, params.a, params.cfactor,
                jnp.asarray(base.q), jnp.asarray(base.t),
                self.traj_q, self.traj_t, self._hist_q, self._hist_t,
                jnp.int32(start), jnp.int32(self._hist_n),
            )
        for j in range(n):
            self.has_pose[start + j] = True
        # video.set_pose is skipped here: per-frame poses would each cost a
        # device slice submission; nothing in the product path reads
        # video.poses for non-first frames (exports use the traj buffers).
        self.video.set_pose(start + n - 1, se3.SE3(gq, gt))
        self._hist_n += n
        self.last_frame_index = start + n - 1
        self.chunks_processed += 1
        tripped = self._chunk_watch.sample(time.perf_counter() - _t0)
        self._check_degradation(self._chunk_watch, tripped,
                                self.last_frame_index)

        if self.queued_ba_iterations > 0:
            old_kq, old_kt = self._remember_keyframe_poses()
            nb = min(self.queued_ba_iterations, 2 * n)
            self.direct_ba.bundle_adjustment(
                max_iterations=nb,
                do_surfel_updates=c.do_surfel_updates,
                increase_ba_iteration_count=False,
            )
            self.queued_ba_iterations -= nb
            self._apply_ba_pose_updates(old_kq, old_kt)

    def process_frames(self, start: int, end: int) -> None:
        """Process frames [start, end), fusing each between-keyframes run
        of steady frames into one program where eligible (no pacing, no
        preload — callers wanting those use `run`)."""
        i = start
        while i < end:
            if self.chunk_eligible(i, end):
                n = self._chunk_len()
                self._process_chunk(i, n)
                i += n
            else:
                self.process_frame(i)
                i += 1

    def create_keyframe(self, frame_index, frame, pyramid, global_T_frame):
        """CreateKeyframe analog (bad_slam.cc:957-1101)."""
        with Timing.time("keyframe insert"):
            kf_id = self.direct_ba.add_keyframe(
                frame, global_T_frame, frame_index)
            if self.base_kf_id is None:
                # First keyframe: bootstrap surfels without filtering.
                self.direct_ba.create_surfels_for_keyframe(
                    kf_id, filter_new_surfels=False
                )
        self.base_kf_id = kf_id
        self.base_kf_global_T_frame = global_T_frame
        self.base_kf_pyramid = pyramid
        self._hist_q, self._hist_t = _identity_hist()
        self._hist_n = 1

        if self.loop_detector is not None:
            self._loop_detection_step(kf_id, frame_index)
        if self.live_viewer is not None:
            self.live_viewer.on_keyframe(self)
        return kf_id

    # ------------------------------------------------------------------
    # Loop closure (host subsystem; reads device poses only when a
    # candidate passes the cheap host-side gates — see loop/detector.py)
    # ------------------------------------------------------------------

    def _loop_detection_step(self, kf_id: int, frame_index: int) -> None:
        """Register the keyframe's features (from HOST image data — no
        device readback) and attempt a closure (AddKeyframeToBA analog,
        bad_slam.cc:1124-1162 -> loop_detector.cc:208-711)."""
        c = self.config
        rgb = self.video.color_u8(frame_index)
        gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2]).astype(np.uint8)
        depth = self.video.depth_u16(frame_index).astype(np.float32) \
            * c.raw_to_float_depth
        um = getattr(self.video, "undistortion_map", None)
        if um is not None:
            # Host nearest remap so loop features/geometry see the same
            # undistorted pinhole images the device pipeline uses.
            h, w = depth.shape
            xi = np.clip(np.floor(um[..., 0]).astype(np.int32), 0, w - 1)
            yi = np.clip(np.floor(um[..., 1]).astype(np.int32), 0, h - 1)
            inside = ((um[..., 0] >= 0) & (um[..., 1] >= 0)
                      & (um[..., 0] < w) & (um[..., 1] < h))
            gray = np.where(inside, gray[yi, xi], 0).astype(np.uint8)
            depth = np.where(inside, depth[yi, xi], 0.0).astype(np.float32)

        if self._loop_thread is not None:
            # Parallel mode (loop_detector.cc:793-832): consume results of
            # every detection enqueued up to the PREVIOUS keyframe (a
            # deterministic barrier — closures land one keyframe later than
            # the synchronous path, independent of thread timing), then
            # enqueue the current keyframe.
            self._drain_loop_detections()
            self._loop_pending_seq = self._loop_thread.enqueue(
                kf_id, gray, depth)
            return

        with Timing.time("loop detection (sync)"):
            self.loop_detector.add_keyframe(gray, depth, kf_id=kf_id)
            candidate = self.loop_detector.detect_candidate(kf_id)
        if candidate is None:
            return
        if not self._closure_attempt_allowed():
            return
        init = self.loop_detector.initial_alignment(kf_id, candidate)
        if init is None:
            return
        cur_T_matched_init, _ = init
        with Timing.time("loop closure attempt"):
            self._attempt_loop_closure(kf_id, candidate, cur_T_matched_init)

    def _closure_attempt_allowed(self) -> bool:
        """Host-side rate limit on closure attempts (value-free: counts
        keyframes, reads nothing). See
        config.loop_closure_cooldown_keyframes."""
        now = self.direct_ba.keyframes.count
        if (now - self._last_closure_attempt_kf
                < self.config.loop_closure_cooldown_keyframes):
            return False
        self._last_closure_attempt_kf = now
        return True

    def _drain_loop_detections(self) -> None:
        """Wait for enqueued detections and apply any verified closures."""
        if self._loop_thread is None or self._loop_pending_seq < 0:
            return
        with Timing.time("loop detection drain (wait)"):
            self._loop_thread.wait_through(self._loop_pending_seq)
        for r in self._loop_thread.drain_results():
            if (r.candidate is not None and r.cur_T_matched is not None
                    and self._closure_attempt_allowed()):
                with Timing.time("loop closure attempt"):
                    self._attempt_loop_closure(
                        r.kf_id, r.candidate, r.cur_T_matched)

    def _keyframe_pyramid(self, kf_id: int):
        from badslam_tpu.ops.pyramid import build_pyramid

        ks = self.direct_ba.keyframes
        return build_pyramid(
            ks.depth[kf_id], ks.nx[kf_id], ks.ny[kf_id], ks.intensity[kf_id],
            self.config.num_scales, gradmag=self.config.use_gradmag,
        )

    def _attempt_loop_closure(self, kf_id, matched_id, cur_T_matched_init):
        """Verify and apply a loop-closure candidate WITHOUT device->host
        reads (on the axon runtime one read permanently degrades the
        session ~1000x, PERF_NOTES.md — and closures happen mid-run). The
        host contributes only value-free metadata (temporal order, bracket
        indices) and its own feature data; the 3-way refinement runs the
        device tracker, and gates + pose graph + pose/trajectory update
        run as ONE masked device program (loop/closure_device.py) — a
        rejected closure leaves every pose bit-identical."""
        from badslam_tpu.loop.closure_device import apply_closure

        c = self.config
        ks = self.direct_ba.keyframes

        # Live keyframes in temporal order (slot order is not temporal once
        # slots are recycled by keyframe merging).
        order = ks.live_slots_in_time_order()
        if kf_id not in order or matched_id not in order:
            return
        cur_pos = order.index(kf_id)
        matched_pos = order.index(matched_id)

        # Direct refinement vs matched and its temporally previous/next
        # keyframes (loop_detector.cc:436-548). Initializations compose the
        # host RANSAC estimate with DEVICE keyframe poses (no reads).
        neighbors = [order[j] for j in (matched_pos - 1, matched_pos,
                                        matched_pos + 1)
                     if 0 <= j < len(order) and order[j] != kf_id]
        if len(neighbors) < 2:
            return
        init_host = se3.SE3(
            jnp.asarray(np.asarray(cur_T_matched_init.q), jnp.float32),
            jnp.asarray(np.asarray(cur_T_matched_init.t), jnp.float32),
        )
        cur_pyr = self._keyframe_pyramid(kf_id)
        matched_pose = se3.SE3(ks.q[matched_id], ks.t[matched_id])
        ref_q, ref_t, ref_valid = [], [], []
        for old in neighbors:
            matched_T_old = se3.mul(
                se3.inverse(matched_pose), se3.SE3(ks.q[old], ks.t[old]))
            init = se3.mul(init_host, matched_T_old)
            old_pyr = self._keyframe_pyramid(old)
            res = track_frame_pairwise(
                self.cams_pyramid, cur_pyr, old_pyr,
                init.q, init.t, init.q, init.t,
                baseline_fx=c.baseline_fx,
                use_depth=c.use_geometric_residuals,
                use_descriptor=(c.use_photometric_residuals
                                and not c.use_gradmag),
                use_gradmag=c.use_gradmag,
                max_iterations=c.tracking_max_iterations,
            )
            cur_T_matched_i = se3.mul(
                se3.SE3(res.q, res.t), se3.inverse(matched_T_old))
            ref_q.append(cur_T_matched_i.q)
            ref_t.append(cur_T_matched_i.t)
            ref_valid.append(True)
        while len(ref_q) < 3:  # static [3] refinement slots
            ref_q.append(jnp.array([1.0, 0, 0, 0], jnp.float32))
            ref_t.append(jnp.zeros(3, jnp.float32))
            ref_valid.append(False)

        # Current keyframe's keypoints (host feature store), padded to the
        # detector's static capacity for the necessity gate.
        det = self.loop_detector
        pts_np = det.features[kf_id].points_local if det is not None \
            else np.zeros((0, 3), np.float32)
        cap = max(det.max_features if det is not None else 1, 1)
        pts = np.zeros((cap, 3), np.float32)
        pts_valid = np.zeros(cap, bool)
        n = min(len(pts_np), cap)
        pts[:n] = pts_np[:n]
        pts_valid[:n] = True

        # Temporal order padded to a pow-2 bucket with the gauge vertex.
        b = 8
        while b < len(order):
            b *= 2
        order_arr = np.full(b, order[0], np.int32)
        order_arr[: len(order)] = order

        prev_slot, next_slot, alpha, kf_slot = self._bracket_arrays()
        (ks.q, ks.t, self.traj_q, self.traj_t, self._closure_count_dev,
         _ok) = apply_closure(
            ks.q, ks.t, jnp.asarray(order_arr), jnp.int32(len(order)),
            jnp.int32(cur_pos), jnp.int32(matched_pos),
            jnp.stack(ref_q), jnp.stack(ref_t), jnp.asarray(ref_valid),
            jnp.asarray(pts), jnp.asarray(pts_valid),
            self.traj_q, self.traj_t,
            prev_slot, next_slot, alpha, kf_slot,
            self._closure_count_dev, self.cam,
        )
        # Refresh the odometry anchor (device slice, not a read).
        self.base_kf_global_T_frame = ks.pose(self.base_kf_id)

    # Config fields editable at runtime from the viewer's settings panel
    # (gui_settings_window.cc analog). Restricted to fields the frame loop
    # re-reads every iteration — no construction-time coupling, so a live
    # edit is well-defined mid-run.
    RUNTIME_CONFIG_FIELDS = (
        "fps_restriction", "target_frame_rate", "keyframe_interval",
        "max_num_ba_iterations_per_keyframe", "parallel_ba",
        "do_surfel_updates", "steady_frame_chunking",
        "min_free_gpu_memory_mb",
    )

    def _apply_config_edit(self, assignment: str) -> None:
        """Apply one `key=value` runtime config edit (viewer settings
        panel). Values are coerced to the field's current type; unknown
        or non-whitelisted keys are ignored with a warning."""
        from badslam_tpu.utils.logging import warning

        key, _, raw = assignment.partition("=")
        if key not in self.RUNTIME_CONFIG_FIELDS or not hasattr(
                self.config, key):
            warning("ignoring config edit for %r (not runtime-editable)",
                    key)
            return
        cur = getattr(self.config, key)
        try:
            if isinstance(cur, bool):
                val = raw.strip().lower() in ("1", "true", "on", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            else:
                val = raw
        except ValueError:
            warning("ignoring config edit %r (bad value)", assignment)
            return
        setattr(self.config, key, val)

    def _apply_viewer_commands(self) -> None:
        """Manual BA / densify / config edits requested from the live
        viewer's control endpoint (gui_main_window.cc's manual-BA and
        densify actions; gui_settings_window.cc's parameter forms).
        Runs on the SLAM thread via wait_if_paused's on_wake hook."""
        lv = self.live_viewer
        if lv is None or not hasattr(lv, "take_commands"):
            return
        for cmd in lv.take_commands():
            if cmd == "ba" and self.direct_ba.keyframes.count > 0:
                old_kq, old_kt = self._remember_keyframe_poses()
                self.direct_ba.bundle_adjustment(
                    max_iterations=4,
                    do_surfel_updates=self.config.do_surfel_updates,
                )
                self._apply_ba_pose_updates(old_kq, old_kt)
                lv.snapshot(self)
            elif cmd == "densify" and self.base_kf_id is not None:
                self.direct_ba.create_surfels_for_keyframe(
                    self.base_kf_id, filter_new_surfels=False)
                lv.snapshot(self)
            elif cmd.startswith("set:"):
                self._apply_config_edit(cmd[4:])
            elif cmd.startswith("move_kf:"):
                # Debug tool: manually translate a keyframe (the reference
                # GUI's manual frame move, gui_main_window.h:143) — fault
                # injection for BA/loop-closure convergence inspection.
                self._debug_move_keyframe(cmd[len("move_kf:"):])
                lv.snapshot(self)
            elif cmd.startswith("delete_kf:"):
                self._debug_delete_keyframe(cmd[len("delete_kf:"):])
                lv.snapshot(self)

    def _debug_move_keyframe(self, spec: str) -> None:
        """`<slot>:<dx>,<dy>,<dz>` — translate a keyframe's pose (manual
        frame move debug tool, gui_main_window.h:143). The next BA run
        should pull it back; watching it converge (or not) is the tool's
        point."""
        from badslam_tpu.utils.logging import warning

        try:
            slot_s, _, vec = spec.partition(":")
            slot = int(slot_s)
            dx, dy, dz = (float(v) for v in vec.split(","))
        except ValueError:
            warning("ignoring malformed move_kf command %r", spec)
            return
        ks = self.direct_ba.keyframes
        if not (0 <= slot < ks.count) or slot in ks.free_slot_set:
            warning("move_kf: slot %d is not a live keyframe", slot)
            return
        pose = ks.pose(slot)
        moved = se3.SE3(pose.q, pose.t + jnp.array([dx, dy, dz],
                                                   jnp.float32))
        ks.set_pose(slot, moved)
        if slot == self.base_kf_id:
            self.base_kf_global_T_frame = moved

    def _debug_delete_keyframe(self, spec: str) -> None:
        """`<slot>` — delete a keyframe outright (keyframe-delete debug
        tool, gui_main_window.h:234); its slot is recycled and the loop
        detector forgets its features."""
        from badslam_tpu.utils.logging import warning

        try:
            slot = int(spec)
        except ValueError:
            warning("ignoring malformed delete_kf command %r", spec)
            return
        ks = self.direct_ba.keyframes
        if not (0 <= slot < ks.count) or slot in ks.free_slot_set:
            warning("delete_kf: slot %d is not a live keyframe", slot)
            return
        if slot == self.base_kf_id or ks.live_count <= 1:
            warning("delete_kf: refusing to delete the odometry base "
                    "keyframe (slot %d)", slot)
            return
        ks.remove_keyframe(slot)
        if self._loop_thread is not None:
            self._loop_thread.remove(slot)
        elif self.loop_detector is not None:
            self.loop_detector.remove_keyframe(slot)

    def _remember_keyframe_poses(self) -> Tuple[jax.Array, jax.Array]:
        """Snapshot keyframe poses before BA (RememberKeyframePoses analog,
        trajectory_deformation.cc:33-58). Device arrays are immutable, so
        this is just keeping references — zero cost, zero reads."""
        ks = self.direct_ba.keyframes
        return ks.q, ks.t

    def _bracket_arrays(self):
        """Host-computed (value-free) per-frame bracketing keyframe slots,
        interpolation fractions, and own-keyframe slots, from the dataset
        frame indices of the live keyframes."""
        ks = self.direct_ba.keyframes
        pairs = sorted(
            (f, s) for s, f in enumerate(ks.frame_indices[: ks.count])
            if f >= 0 and s not in ks.free_slot_set
        )
        n_frames = self.traj_q.shape[0]
        kf_frames = np.array([p[0] for p in pairs], np.int64)
        kf_slots = np.array([p[1] for p in pairs], np.int32)
        nk = len(pairs)

        fi = np.arange(n_frames, dtype=np.int64)
        j = np.searchsorted(kf_frames, fi, side="right")
        prev_i = np.clip(j - 1, 0, nk - 1)
        next_i = np.clip(j, 0, nk - 1)
        interior = (j > 0) & (j < nk)
        # Off both ends: extrapolate via the nearest keyframe (alpha 0 with
        # prev==next). Interior: fraction between the bracketing keyframes.
        denom = np.maximum(kf_frames[next_i] - kf_frames[prev_i], 1)
        alpha = np.where(interior, (fi - kf_frames[prev_i]) / denom, 0.0)
        prev_slot = kf_slots[np.where(interior, prev_i, np.where(j == 0,
                                                                 0, nk - 1))]
        next_slot = kf_slots[np.where(interior, next_i, np.where(j == 0,
                                                                 0, nk - 1))]
        kf_slot = np.full(n_frames, -1, np.int32)
        in_range = kf_frames < n_frames
        kf_slot[kf_frames[in_range]] = kf_slots[in_range]
        return (
            jnp.array(prev_slot), jnp.array(next_slot),
            jnp.array(alpha, jnp.float32), jnp.array(kf_slot),
        )

    def _apply_ba_pose_updates(self, old_kq, old_kt):
        """After BA: refresh the base-keyframe pose and deform the full
        trajectory — per-frame corrections interpolated between bracketing
        keyframes, exactly as the reference does after EVERY BA run
        (bad_slam.cc:529-534 -> trajectory_deformation.cc:61-130). One
        jitted program over the device trajectory buffers; no host reads."""
        from badslam_tpu.loop.trajectory import deform_trajectory_device

        ks = self.direct_ba.keyframes
        if ks.count == 0:
            return
        with Timing.time("trajectory deformation"):
            prev_slot, next_slot, alpha, kf_slot = self._bracket_arrays()
            self.traj_q, self.traj_t = deform_trajectory_device(
                self.traj_q, self.traj_t, old_kq, old_kt, ks.q, ks.t,
                prev_slot, next_slot, alpha, kf_slot,
            )
            self.base_kf_global_T_frame = ks.pose(self.base_kf_id)

    # ------------------------------------------------------------------

    def run(
        self,
        start: Optional[int] = None,
        end: Optional[int] = None,
        progress: bool = False,
    ) -> None:
        """Process a frame range (the main.cc frame loop)."""
        c = self.config
        start = c.start_frame if start is None else start
        end = min(len(self.video), c.end_frame) if end is None else end
        from badslam_tpu.io.preload import PreLoadThread

        preload = PreLoadThread(self.video)
        i = start
        while i < end:
            if self.live_viewer is not None:
                # Run/pause/step from the live viewer's /control endpoint
                # (the reference GUI's stepping, gui_main_window.cc).
                self.live_viewer.wait_if_paused(
                    on_wake=self._apply_viewer_commands)
            t0 = time.perf_counter()
            preload.wait_until_done()
            if self.chunk_eligible(i, end):
                # Fused steady chunk: ONE program for the whole
                # between-keyframes run (see _chunk_frames_fn).
                n = self._chunk_len()
                if i + n < end:
                    preload.preload(i + n)
                self._process_chunk(i, n)
                for j in range(n):
                    self.video.clear_frame(i + j)
                step = n
            else:
                if i + 1 < end:
                    preload.preload(i + 1)
                self.process_frame(i)
                self.video.clear_frame(i)
                step = 1
            if progress:
                # NOTE: no surfel-count print — that would be a device->host
                # read inside the steady-state loop (PERF_NOTES.md).
                dt = time.perf_counter() - t0
                print(
                    f"frame {i}+{step}: {step / max(dt, 1e-9):.1f} FPS",
                    flush=True,
                )
            i += step
            # EndFrame pacing (bad_slam.cc:453-483): fps_restriction caps
            # playback at the given rate; target_frame_rate simulates the
            # input sensor rate. Both sleep the remainder of the budget.
            min_frame_time = 0.0
            if c.fps_restriction > 0:
                min_frame_time = 1.0 / c.fps_restriction
            if c.target_frame_rate > 0:
                min_frame_time = max(min_frame_time, 1.0 / c.target_frame_rate)
            if min_frame_time > 0:
                dt = time.perf_counter() - t0
                if dt < min_frame_time:
                    time.sleep(min_frame_time - dt)
        preload.stop()
        # Apply any loop closures still in flight on the detection thread.
        self._drain_loop_detections()

    def run_live(self, progress: bool = False) -> int:
        """Consume a live input stream (io.live_inputs.LiveRGBDVideo):
        process frames as the capture thread delivers them, until the
        stream ends or capacity is reached (the reference's live frame
        loop, main.cc:652-760 with GetNextFrame). Returns the number of
        frames processed."""
        video = self.video
        i = 0
        while video.wait_for_frame(i):
            if self.live_viewer is not None:
                self.live_viewer.wait_if_paused(
                    on_wake=self._apply_viewer_commands)
            t0 = time.perf_counter()
            self.process_frame(i)
            video.clear_frame(i)
            if progress:
                dt = time.perf_counter() - t0
                print(f"frame {i}: {1.0 / max(dt, 1e-9):.1f} FPS",
                      flush=True)
            i += 1
        self._drain_loop_detections()
        return i

    def final_bundle_adjustment(
        self, window_size: int = 16, window_stride: int = 8
    ) -> None:
        """Post-loop final BA: sliding windows then global passes
        (main.cc:765-809). With config.use_pcg the global pass uses the
        PCG solver (--use_pcg analog; sequential only, bad_slam.cc:1273)."""
        kf_count = self.direct_ba.keyframes.count
        if kf_count == 0:
            return
        old_kq, old_kt = self._remember_keyframe_poses()
        if self.config.use_pcg:
            from badslam_tpu.ba.pcg import pcg_bundle_adjustment

            pcg_bundle_adjustment(
                self.direct_ba, max_iterations=10,
                optimize_intrinsics=self.config.optimize_intrinsics,
            )
            self._apply_ba_pose_updates(old_kq, old_kt)
            self.final_ba_done = True
            return
        lo = 0
        while lo < kf_count:
            hi = min(lo + window_size - 1, kf_count - 1)
            self.direct_ba.bundle_adjustment(
                max_iterations=10,
                active_keyframe_window=(lo, hi),
            )
            if hi == kf_count - 1:
                break
            lo += window_stride
        self.direct_ba.bundle_adjustment(
            max_iterations=10,
            active_keyframe_window=(0, kf_count - 1),
        )
        self._apply_ba_pose_updates(old_kq, old_kt)
        self.final_ba_done = True

    def export_trajectory(self, path: str) -> None:
        from badslam_tpu.io.dataset import save_tum_trajectory

        save_tum_trajectory(
            path, self.video.timestamps, self.frame_poses
        )

    def export_point_cloud(self, path: str) -> None:
        from badslam_tpu.io.ply import save_ply

        pos, nrm, col = self.direct_ba.export_point_cloud()
        save_ply(path, pos, nrm, col)
