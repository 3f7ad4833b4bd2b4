"""Headline benchmark: full SLAM throughput (tracking + keyframe-rate BA).

Mirrors the reference's operating point (BASELINE.md, `bad_slam.cc:174-283`,
`bad_slam_config.h:72,179,185`): VGA frames through the FULL per-frame
pipeline — upload, fused preprocessing, 5-scale pyramid, multi-scale direct
tracking at 30 GN iterations/scale, a keyframe every 10th frame, and 10
alternating-BA iterations per keyframe (surfel creation/activation/
geometry/merge/compaction/pose opt). The reference runs this at ~30 FPS on
a GTX 1080; `vs_baseline` is measured FPS / 30.

A secondary `vga_odometry_fps` (tracking-only loop) is reported inside the
same JSON line for continuity with round-1 numbers.

NO device->host value reads happen before or during the timed regions
(PERF_NOTES.md: a single read permanently degrades the axon session).
Timing is host clocks + jax.block_until_ready only.

Evidence is printed INCREMENTALLY (round-4 verdict #1): the headline JSON
line goes to stdout the moment the timed headline sections finish — BEFORE
the long-run child — and a final enriched line (long-run FPS segments, ATE,
loop closures) follows when the long-run completes. The driver records the
LAST JSON line, so a wall-clock timeout now surrenders only the enrichment,
never the headline. A global deadline governor (`BENCH_BUDGET_S`, default
2400 s) force-emits the best-available line with `"budget_exceeded": true`
and exits 0 before any external timeout can strike.

Prints JSON lines shaped {"metric", "value", "unit", "vs_baseline", ...};
the last one printed is the round's record.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# Env overrides exist ONLY for CPU smoke-testing the bench plumbing
# (subprocess structure, Timing report, JSON contract) — the driver runs
# with defaults on the real TPU.
WIDTH = int(os.environ.get("BENCH_WIDTH", 640))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 480))
NUM_SCALES = 5
SLAM_FRAMES = int(os.environ.get("BENCH_FRAMES", 60))
KEYFRAME_INTERVAL = 10
BA_ITERATIONS = 10
TRACK_ITERS = 30  # kMaxIterationsPerScale (bad_slam_config.h)
LONGRUN_FRAMES = int(os.environ.get("BENCH_LONGRUN_FRAMES", 720))

# ---------------------------------------------------------------------------
# Deadline governor (round-4 verdict #1): BENCH_r04 was rc=124/parsed=null —
# the driver's wall-clock budget expired before bench.py printed its
# output-last JSON. Every bench process now carries (a) a module-global
# "best line so far" updated after each completed section, and (b) a daemon
# thread that force-prints that line with `budget_exceeded: true` and exits
# 0 shortly before the budget runs out. Worst case is now a partial line,
# never an empty round.
# ---------------------------------------------------------------------------
_BEST_LINE: dict = {}
_BEST_LOCK = threading.Lock()
_DONE = False


def _set_best(line: dict) -> None:
    global _BEST_LINE
    with _BEST_LOCK:
        _BEST_LINE = dict(line)


def _start_governor(deadline: float, margin_s: float = 20.0) -> None:
    """Arm the force-emit thread: at `deadline - margin_s` (monotonic), print
    the best-available JSON line and os._exit(0). A normal completion sets
    `_DONE` first and wins the race; os._exit is mandatory here — a wedged
    device read can never be joined (C-land block, see _read_scalar)."""

    def _fire():
        while True:
            rem = (deadline - margin_s) - time.monotonic()
            if _DONE:
                return
            if rem <= 0:
                break
            time.sleep(min(rem, 2.0))
        if _DONE:
            return
        with _BEST_LOCK:
            line = dict(_BEST_LINE)
        line["budget_exceeded"] = True
        print(json.dumps(line), flush=True)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    threading.Thread(target=_fire, daemon=True).start()


def _apply_platform_override() -> None:
    """BENCH_PLATFORM=cpu forces the CPU backend (smoke tests only).
    Must be config-based: the machine's sitecustomize force-registers the
    axon plugin, so the JAX_PLATFORMS env var alone is not honored."""
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


class _InMemoryVideo:
    """RGBDVideo-shaped in-memory dataset (pre-rendered host frames), so the
    benchmark exercises the full host->device upload path per frame without
    disk IO noise."""

    def __init__(self, camera, depths_u16, rgbs_u8):
        self.camera = camera
        self.depth_camera = camera
        self._depths = depths_u16
        self._rgbs = rgbs_u8
        self.poses = [None] * len(depths_u16)
        self.timestamps = [i / 30.0 for i in range(len(depths_u16))]

    def __len__(self):
        return len(self._depths)

    def depth_u16(self, i):
        return self._depths[i]

    def color_u8(self, i):
        return self._rgbs[i]

    def set_pose(self, i, pose):
        self.poses[i] = pose

    def clear_frame(self, i):
        pass


def _render_frames(cam, scene, poses, raw_to_float_depth):
    from badslam_tpu import synthetic as syn

    depths, rgbs = [], []
    for p in poses:
        depth, inten = syn.render_scene(cam, scene, p)
        depths.append(
            np.clip(depth / raw_to_float_depth, 0, 65535).astype(np.uint16)
        )
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rgbs.append(np.stack([gray, gray, gray], axis=-1))
    return depths, rgbs


def _ate_of(slam, gt, timeout_s: float = 600.0) -> float:
    """ATE RMSE of a finished run: the device reduces the trajectory to the
    11-float Horn moments (mean/center/matmul only) and the 3x3 SVD runs
    on the HOST — `jnp.linalg.svd` on device crashed the TPU worker at
    this read in BOTH round-4 long-run children (kernel fault) and a bulk
    trajectory read did the same in round 3. Still call only after the
    caller's timed regions — even one read degrades the relay session
    (PERF_NOTES.md)."""
    from badslam_tpu import synthetic as syn

    gt_t = np.array([np.asarray(p.t, np.float32) for p in gt])
    n = min(slam.traj_q.shape[0], len(gt_t))
    C, se, sg = syn.ate_moments_device(slam.traj_t[:n], gt_t[:n])
    moments = [_read_scalar(x, as_array=True, timeout_s=timeout_s)
               for x in (C, se, sg)]
    return syn.ate_rmse_from_moments(moments[0], moments[1], moments[2], n)


_READ_HUNG = False  # a device read wedged in C land (thread never joined)


def _read_scalar(x, retries: int = 1, wait_s: float = 5.0,
                 as_array: bool = False, timeout_s: float = 600.0):
    """Read one device value with a bounded retry AND a hang timeout.

    Measured on the relay (tools/probe_wedge_slam.py, 2026-08-19): the
    FIRST D2H of a process that has touched non-trivial device state pays
    a ONE-TIME session sync of wildly variable cost — 16 s to 315 s
    observed, independent of live HBM and of how many programs ran — and
    every subsequent read is instant (<1 ms). The r03/r04 'post-long-run
    wedge' was exactly this cost crossing a 60 s timeout. So: the default
    budget is 10 minutes, callers read a TINY sentinel first to absorb
    the sync, and the read runs on a daemon thread (the block is
    un-interruptible in C land — SIGALRM never fires) so a true hang
    still times out the join. After a timeout the caller must finish via
    os._exit: jax's atexit backend teardown joins the same wedged state.
    The occasional hard worker crash at this sync (UNAVAILABLE,
    BENCH_r03) is retried by the caller in a fresh process."""
    import threading

    import jax

    global _READ_HUNG

    for attempt in range(retries + 1):
        result = {}

        def _do():
            try:
                jax.block_until_ready(x)
                result["v"] = np.asarray(x) if as_array else float(x)
            except Exception as e:  # pragma: no cover - backend-dependent
                result["e"] = e

        th = threading.Thread(target=_do, daemon=True)
        th.start()
        th.join(timeout_s)
        if th.is_alive():
            _READ_HUNG = True
            raise TimeoutError(f"device read hung > {timeout_s:.0f}s")
        if "v" in result:
            return result["v"]
        if attempt == retries:
            raise result["e"]
        time.sleep(wait_s)


def bench_slam(cam, scene):
    """Full SLAM loop FPS: N frames through BadSlam.process_frame.

    Returns (fps, slam, gt) WITHOUT reading any device values — accuracy
    evidence is extracted by the caller after every timed section."""
    import jax

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam

    import dataclasses

    cfg = BadSlamConfig(
        num_scales=NUM_SCALES,
        keyframe_interval=KEYFRAME_INTERVAL,
        max_num_ba_iterations_per_keyframe=BA_ITERATIONS,
        max_surfel_count=1 << 20,
        tracking_max_iterations=TRACK_ITERS,
        enable_loop_detection=False,
        fps_restriction=0,  # pacing off -> steady-frame chunking active
    )
    gt = syn.smooth_trajectory(SLAM_FRAMES, scale=0.002)
    depths, rgbs = _render_frames(cam, scene, gt, cfg.raw_to_float_depth)

    def one_pass(chunking: bool):
        video = _InMemoryVideo(cam, depths, rgbs)
        slam = BadSlam(
            dataclasses.replace(cfg, steady_frame_chunking=chunking), video)
        t0 = time.perf_counter()
        slam.process_frames(0, len(video))
        jax.block_until_ready(slam.traj_q)
        return time.perf_counter() - t0, slam

    # Warm both variants (compiles persist), then time each REPS times and
    # report median + all runs — round 3 shipped a single-sample regression
    # that was indistinguishable from relay noise (VERDICT r03 weak #1).
    # Default 2 (was 3): r04's budget timeout cost the whole round; 2 reps
    # still exposes spread while fitting the deadline governor's budget.
    reps = int(os.environ.get("BENCH_REPS", 2))
    one_pass(True)
    one_pass(False)
    runs_ch, runs_pf = [], []
    slam = None
    for _ in range(reps):
        dt, slam = one_pass(True)
        runs_ch.append(SLAM_FRAMES / dt)
        dt_pf, _ = one_pass(False)
        runs_pf.append(SLAM_FRAMES / dt_pf)
    med = lambda xs: float(np.median(xs))

    def repass():
        """One more chunked pass, for re-timing AFTER the parent's first
        read: on an async-ack relay the pre-read FPS above measures
        submission throughput; post-read, blocks are true syncs and this
        pass measures execution."""
        dt, _ = one_pass(True)
        return SLAM_FRAMES / dt

    return med(runs_ch), med(runs_pf), runs_ch, runs_pf, slam, gt, repass


def bench_slam_scaling() -> dict:
    """Long-run evidence (round-2 verdict #1/#2): a 500-frame QVGA
    revisiting loop through the FULL default pipeline — loop detection ON
    (organic: candidates are never injected), parallel BA ON, textured
    room scene with sensor noise. Reports segment FPS at frames 100/250/
    400/500 (BA cost growing with the live keyframe count shows up here),
    the organic loop-closure count, final ATE, and the per-BA-iteration
    device time at the final keyframe count.

    Returns (partial_results, slam, gt) WITHOUT reading device values:
    ATE and the device closure counter are extracted by the caller after
    ALL timed sections of the process (host clocks + block_until_ready
    only, PERF_NOTES.md)."""
    import jax

    from badslam_tpu import synthetic as syn
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import BadSlam

    w = int(os.environ.get("BENCH_LONGRUN_WIDTH", 320))
    h = int(os.environ.get("BENCH_LONGRUN_HEIGHT", 240))
    # 720 frames -> 74 keyframes -> K=128 fused-BA programs. (A previous
    # round capped this at 500 frames blaming a K=128 "compile cliff" —
    # that measurement ran in a session already degraded ~1000x by an
    # earlier ATE read; with reads strictly deferred the K=128 compile is
    # ordinary.)
    frames = LONGRUN_FRAMES
    loop_frames = max(frames - 70, int(frames * 0.9))
    cam = syn.default_camera(w, h)
    scene = syn.room_scene(3.0)
    gt = syn.loop_trajectory(frames, loop_frames=loop_frames)
    cfg = BadSlamConfig(
        num_scales=NUM_SCALES,
        max_surfel_count=1 << 20,
        # Detection-image rate matched to the 500-frame loop (the derived
        # default's 20 s dislocal window would exceed the whole sequence;
        # the reference exposes this flag for exactly this purpose).
        loop_detection_image_frequency=0.5,
        loop_detection_images_width=w,
        loop_detection_images_height=h,
        fps_restriction=0,  # pacing off -> steady-frame chunking active
        # Bisection knobs ONLY (defaults on): BENCH_LONGRUN_DETECTION=0
        # isolates the detection/closure path; BENCH_LONGRUN_CHUNKING=0
        # isolates the fused lax.scan chunk program (D2H-wedge hunt,
        # PERF_NOTES.md).
        enable_loop_detection=os.environ.get(
            "BENCH_LONGRUN_DETECTION", "1") != "0",
        steady_frame_chunking=os.environ.get(
            "BENCH_LONGRUN_CHUNKING", "1") != "0",
    )  # everything else: DEFAULTS (loop detection on, parallel BA on)

    rng = np.random.default_rng(7)
    depths, rgbs = [], []
    for p in gt:
        depth, inten = syn.render_scene(
            cam, scene, p, albedo=lambda q: syn.textured_intensity_at(
                q, cell=0.07))
        sigma = 0.01 * depth * depth
        depth = np.where(depth > 0, np.maximum(
            depth + sigma * rng.standard_normal(depth.shape), 1e-3), 0.0)
        depths.append(np.clip(depth / cfg.raw_to_float_depth, 0,
                              65535).astype(np.uint16))
        inten = inten + (3.0 / 255.0) * rng.standard_normal(inten.shape)
        gray = np.clip(inten * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rgbs.append(np.stack([gray, gray, gray], axis=-1))

    marks = tuple(sorted({m for m in (100, 250, 500) if m < frames}
                         | {frames}))

    from badslam_tpu.utils.timing import Timing

    def one_pass():
        video = _InMemoryVideo(cam, depths, rgbs)
        slam = BadSlam(cfg, video)
        seg_t, seg_phases = [], []
        t0 = time.perf_counter()
        last_t, last_f = t0, 0
        last_snap = Timing.snapshot()
        i = 0
        while i < len(video):
            if slam.chunk_eligible(i, len(video)):
                n = slam._chunk_len()
                slam._process_chunk(i, n)
                i += n
            else:
                slam.process_frame(i)
                i += 1
            # every mark is a multiple of keyframe_interval, so chunk
            # steps land on marks exactly; the crossing test is a guard
            if any(last_f < m <= i for m in marks):
                jax.block_until_ready(slam.traj_q)
                now = time.perf_counter()
                seg_t.append((i - last_f) / (now - last_t))
                # Per-segment phase attribution (round-3 verdict #1b: the
                # 505->69 FPS collapse had no evidence separating
                # detection-thread host cost from relay degradation).
                snap = Timing.snapshot()
                seg_phases.append({k: round(v, 2) for k, v in
                                   Timing.delta(last_snap, snap).items()})
                last_snap = snap
                last_t, last_f = now, i
        jax.block_until_ready(slam.traj_q)
        return slam, seg_t, seg_phases, frames / (time.perf_counter() - t0)

    one_pass()                        # warmup (compiles; cache persists)
    # Pre-compile the degradation canary so a mid-run watchdog trip costs
    # a probe, not a compile (utils/watchdog.py). Also logs the healthy
    # canary time for this session.
    from badslam_tpu.utils.watchdog import probe_degradation
    probe_degradation()
    Timing.reset()                    # phase breakdown covers the timed pass
    slam, seg_fps, seg_phases, total_fps = one_pass()

    # Per-BA-iteration time at the final keyframe count (read-free:
    # block-synced wall time around single-iteration calls).
    # BENCH_LONGRUN_BA_TIMING=0 skips it (D2H-wedge bisection: these
    # post-run BA calls are the last device work before the reads).
    ba_iter_ms = None
    if os.environ.get("BENCH_LONGRUN_BA_TIMING", "1") != "0":
        ba = slam.direct_ba
        # increase_ba_iteration_count=False: an advancing epoch grows the
        # pessimistic surfel bound ~58k/call here, crossing pow-2 buckets
        # and RECOMPILING the fused programs inside the timed reps
        # (measured: 8.9 s/"iteration" on an 0.9 ms program, 2026-08-19).
        kw = dict(max_iterations=1, increase_ba_iteration_count=False)
        ba.bundle_adjustment(**kw)                  # warm this variant
        jax.block_until_ready(ba.keyframes.q)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ba.bundle_adjustment(**kw)
        jax.block_until_ready(ba.keyframes.q)
        ba_iter_ms = 1e3 * (time.perf_counter() - t0) / reps

    out = {"frames": frames}
    for m, fps, ph in zip(marks, seg_fps, seg_phases):
        out[f"fps_at_{m}"] = round(fps, 2)
        out[f"phases_to_{m}"] = ph
    out.update(
        fps_total=round(total_fps, 2),
        live_keyframes=slam.direct_ba.keyframes.live_count,
        # null + explicit flag when timing is disabled (advisor r04: -1.0
        # was ingestible downstream as a measured time).
        ba_iteration_ms=None if ba_iter_ms is None else round(ba_iter_ms, 3),
    )
    if ba_iter_ms is None:
        out["ba_timing_disabled"] = True
    return out, slam, gt


def bench_odometry(cam, scene) -> float:
    """Tracking-only loop FPS (round-1 metric, now at 30 iters/scale)."""
    import jax
    import jax.numpy as jnp

    from badslam_tpu import synthetic as syn
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.ops.pyramid import build_pyramid
    from badslam_tpu.tracking.pairwise import track_frame_pairwise

    cams = tuple(cam.pyramid_level(i) for i in range(NUM_SCALES))

    def pyramid_for(world_T_frame):
        depth, inten = syn.render_scene(cam, scene, world_T_frame)
        rgb = np.repeat(
            np.clip(inten[..., None] * 255.0, 0, 255).astype(np.uint8), 3, -1
        )
        frame = preprocess_frame(
            cam, jnp.array(depth), jnp.array(rgb),
            max_depth=20.0, sigma_xy=1.5, radius_factor=2.0,
            sigma_inv_depth=0.005,
        )
        return build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, NUM_SCALES
        )

    base_pyr = pyramid_for(syn.identity_pose())

    n_distinct = 4
    host_frames = []
    for i in range(n_distinct):
        d, inten = syn.render_scene(
            cam, scene, syn.pose(tx=0.01 + 0.002 * i, ty=0.002, ry=0.004)
        )
        rgb = np.repeat(
            np.clip(inten[..., None] * 255.0, 0, 255).astype(np.uint8), 3, -1
        )
        host_frames.append((d, rgb))

    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)

    def frame_step(depth_np, rgb_np, q, t):
        frame = preprocess_frame(
            cam, jnp.array(depth_np), jnp.array(rgb_np),
            max_depth=20.0, sigma_xy=1.5, radius_factor=2.0,
            sigma_inv_depth=0.005,
        )
        pyramid = build_pyramid(
            frame.depth, frame.nx, frame.ny, frame.intensity, NUM_SCALES
        )
        return track_frame_pairwise(
            cams, base_pyr, pyramid, q, t, q, t,
            baseline_fx=40.0, use_depth=True, use_descriptor=True,
            test_two_initial_estimates=False, max_iterations=TRACK_ITERS,
        )

    for d, rgb in host_frames:  # warmup / compile
        r = frame_step(d, rgb, q0, t0)
    jax.block_until_ready(r)

    n = 60
    t_start = time.perf_counter()
    for i in range(n):
        d, rgb = host_frames[i % n_distinct]
        r = frame_step(d, rgb, q0, t0)
    jax.block_until_ready(r)
    return n / (time.perf_counter() - t_start)


def _longrun_child() -> None:
    """Run ONLY the long-run section and print its JSON (child process).

    Process isolation serves two measured relay behaviors (PERF_NOTES.md):
    degradation from the parent's reads is per-process, and device buffers
    left idle for the long-run's ~30-60 min (the parent's finished SLAM
    states) have crashed the TPU worker when finally read — 2026-08-17,
    twice, both times at the first post-long-run readback. Here every
    section reads its own values promptly in its own process. The timed
    results are printed BEFORE the reads so a read-time worker crash
    still surrenders the measurements.

    The child runs under its own deadline governor: the parent passes the
    remaining budget via BENCH_CHILD_BUDGET_S, and every sleep/read budget
    below is scaled to what is actually left, so the child can never
    outlive the parent's deadline silently."""
    global _DONE

    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache
    from badslam_tpu.utils.timing import Timing

    budget = float(os.environ.get("BENCH_CHILD_BUDGET_S", 1500))
    deadline = time.monotonic() + budget
    _set_best({"error": "child budget expired before timed results"})
    _start_governor(deadline, margin_s=10.0)

    def _left(margin: float = 0.0) -> float:
        return max(0.0, deadline - time.monotonic() - margin)

    _apply_platform_override()
    enable_compile_cache()
    # Pre-pay the chronometric channel BEFORE the run (round-5 TPU
    # post-mortem: the first chrono attempt compiled its probe (twice: f32
    # + i32), compiled the on-device ATE program, and calibrated — all
    # post-run, through the relay, ~minutes each — and expired a 1243 s
    # deadline. Warm + calibrate now, at exact shapes, while the relay is
    # healthy; the post-run readout is then pure warm execution (a few
    # seconds). No device reads happen here.
    chrono_prep = None
    if os.environ.get("BENCH_CHRONO_READS", "1") != "0":
        from badslam_tpu import synthetic as syn
        from badslam_tpu.utils import timeread
        t0 = time.perf_counter()
        try:
            info = timeread.chrono_warmup(
                unit_ms=float(os.environ.get("BENCH_CHRONO_UNIT_MS", 25)),
                deadline_s=max(60.0, _left(margin=600.0)))
            z = np.zeros((LONGRUN_FRAMES, 3), np.float32)
            jax.block_until_ready(syn.ate_rmse_device(jnp.asarray(z), z))
            info["ate_program_warm_s"] = round(
                time.perf_counter() - t0 - info["elapsed_s"], 3)
            chrono_prep = info
        except Exception as e:
            chrono_prep = {"error": repr(e)[:160],
                           "elapsed_s": round(time.perf_counter() - t0, 3)}
    # Sentinel uploaded AND READ at t=0, before ANY compiled program
    # (round-5 discovery, tools/probe.py read-first 2026-08-19): a first
    # D2H issued before the session has program state costs ~5 s, does
    # NOT arm the per-kernel sync fallback (the degradation canary stays
    # healthy afterwards), and pre-pays the one-time session flush — the
    # post-run evidence reads then complete in milliseconds. Reading the
    # sentinel AFTER the run instead crashed the TPU worker outright in
    # every round-5 attempt (95-130 s into the flush, 3/3, independent of
    # run length), which is how r03/r04/r05 kept losing ATE + closures.
    sentinel = jnp.asarray(np.float32(42.0))
    jax.block_until_ready(sentinel)
    t0_read_s = None
    if os.environ.get("BENCH_T0_READ", "0") == "1":
        # Opt-in only: after a t0 read, heavy CHUNKED runs crashed the
        # worker mid-run 2/2 on 2026-08-19 (PERF_NOTES round 5).
        try:
            t0 = time.perf_counter()
            _read_scalar(sentinel, retries=0,
                         timeout_s=max(30.0, min(240.0, _left(margin=300.0))))
            t0_read_s = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep going: the post-run sentinel read
            t0_read_s = repr(e)[:120]   # remains as the (risky) fallback
    try:
        long_run, slam2, gt2 = bench_slam_scaling()
    except Exception as e:
        print(json.dumps({"error": repr(e)[:200]}), flush=True)
        return
    long_run["t0_read_s"] = t0_read_s
    # Host-clock phase breakdown of the TIMED pass (bench_slam_scaling
    # resets the registry after warmup) — stderr so the driver's
    # one-JSON-line contract on stdout is untouched.
    print(Timing.report(), file=sys.stderr, flush=True)
    # HBM allocator stats (host-side PJRT query, not a buffer read) ride
    # along with the crash bisection: a near-limit bytes_in_use or peak
    # here would explain the worker dying by the end of long runs.
    from badslam_tpu.utils.memory import device_memory_stats
    stats = device_memory_stats()
    if stats:
        long_run["hbm"] = {k: stats.get(k) for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit", "num_allocs") if k in stats}
    print(json.dumps(long_run), flush=True)  # timed results, pre-read
    _set_best(long_run)  # governor now surrenders at worst the timed pass
    # Liveness probe BEFORE any D2H: submit one trivial program and block
    # (on a daemon thread — the block itself can wedge). Long timing here
    # = the 'block_until_ready is not a full sync' theory (a minutes-deep
    # queue finally draining); a crash/hang here = the worker died mid-run
    # and D2H was never the trigger.
    global _READ_HUNG
    try:
        t0 = time.perf_counter()
        y = jax.jit(lambda v: v + 1.0)(sentinel)
        box = {}

        def _block():
            try:
                jax.block_until_ready(y)
                box["ok"] = True
            except Exception as e:  # pragma: no cover
                box["e"] = e

        th = threading.Thread(target=_block, daemon=True)
        th.start()
        th.join(60.0)
        if th.is_alive():
            _READ_HUNG = True
            long_run["liveness_error"] = "program block hung > 60s"
        elif "e" in box:
            long_run["liveness_error"] = repr(box["e"])[:120]
        else:
            long_run["liveness_program_s"] = round(
                time.perf_counter() - t0, 3)
    except Exception as e:
        long_run["liveness_error"] = repr(e)[:120]
    # -------- chronometric reads: the read-free evidence channel --------
    # Program submission + block_until_ready stay healthy after runs that
    # wedge every D2H (PERF_NOTES round 5: post-run first-reads crash the
    # worker after chunked runs and hang >900 s after unchunked ones), so
    # the ATE and the closure counter leave the device through the TIMING
    # channel first (utils/timeread.py). On a clean decode the child EXITS
    # WITHOUT ISSUING ANY D2H: the session flush is never triggered, the
    # worker stays alive, and the parent's follow-on sections inherit a
    # healthy relay. BENCH_D2H_VERIFY=1 still runs the old read path
    # afterwards as a cross-check.
    chrono_ok = False
    if (os.environ.get("BENCH_CHRONO_READS", "1") != "0"
            and "liveness_error" not in long_run):
        from badslam_tpu import synthetic as syn
        from badslam_tpu.utils import timeread
        long_run["chrono_prep"] = chrono_prep
        t0 = time.perf_counter()
        try:
            # Decode check on a KNOWN constant through the identical
            # path/scale as the ATE read: a wrong decode here brands the
            # channel (not the metric) as lying for this session.
            st = timeread.chrono_selftest(
                deadline_s=max(30.0, _left(margin=240.0)))
            long_run["chrono_selftest"] = {
                "ok": st["ok"], "raw": st["raw"], "want": st["want"],
                "unit_ms": st["unit_ms"], "calibration": st["calibration"],
                "elapsed_s": st["elapsed_s"]}
            c = timeread.chronometric_read_int(
                slam2._closure_count_dev, max_value=999,
                deadline_s=max(30.0, _left(margin=150.0)))
            long_run["loop_closures"] = c["value"]
            long_run["loop_closures_read"] = {
                "channel": "chronometric",
                "checksum_ok": c["checksum_ok"],
                "unit_ms": c["unit_ms"]}
            _set_best(long_run)
            gt_t2 = np.array([np.asarray(p.t, np.float32) for p in gt2])
            n_tr = min(slam2.traj_q.shape[0], len(gt_t2))
            a = timeread.chronometric_read(
                syn.ate_rmse_device(slam2.traj_t[:n_tr], gt_t2[:n_tr]),
                scale=1e7, digits=8,
                deadline_s=max(30.0, _left(margin=120.0)))
            long_run["ate_rmse_m"] = a["value"]
            long_run["ate_read"] = {
                "channel": "chronometric",
                "checksum_ok": a["checksum_ok"],
                "unit_ms": a["unit_ms"],
                "raw": a["raw"]}
            long_run["chrono_read_s"] = round(time.perf_counter() - t0, 3)
            chrono_ok = bool(st["ok"] and c["checksum_ok"]
                             and a["checksum_ok"])
        except Exception as e:
            long_run["chrono_error"] = repr(e)[:160]
            long_run["chrono_read_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(long_run), flush=True)
        _set_best(long_run)
    if chrono_ok and os.environ.get("BENCH_D2H_VERIFY", "0") != "1":
        _DONE = True
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)  # exit WITHOUT triggering the D2H session flush
    # A short quiesce before the first D2H: the read triggers a one-time
    # session-wide flush (PERF_NOTES), and every r04 sentinel issued hot on
    # the run's heels crashed the worker ~100 s in; give the relay a
    # moment to drain the run's queue before asking for the sync. Skipped
    # when the budget is nearly spent — the reads matter more.
    time.sleep(min(30.0, _left(margin=180.0)))
    # Reads happen right after the timed sections while the session is
    # still healthy: sentinel (absorbs the one-time sync), then the device
    # closure counter, then the device-computed ATE moments. Every read
    # budget is capped by the remaining child budget (minus a margin for
    # the prints) so the governor never has to kill a read mid-flight.
    try:
        t0 = time.perf_counter()
        long_run["sentinel_read"] = _read_scalar(
            sentinel, retries=0,
            timeout_s=max(30.0, min(600.0, _left(margin=120.0))))
        long_run["sentinel_read_s"] = round(time.perf_counter() - t0, 3)
    except Exception as e:
        long_run["sentinel_error"] = repr(e)[:120]
        long_run["sentinel_error_s"] = round(time.perf_counter() - t0, 3)
        if isinstance(e, TimeoutError):
            # A HUNG sentinel means the session flush is wedged: the
            # closure/ATE reads would each hang their full budgets too
            # (worst case +20 min per attempt). Bail fast; the parent's
            # fresh-process retry is the recovery path.
            long_run["read_error"] = "sentinel hung; skipping reads"
            print(json.dumps(long_run), flush=True)
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)
    if os.environ.get("BENCH_LONGRUN_DETECTION", "1") == "0":
        long_run["detection_disabled"] = True
    try:
        # Closure counter FIRST: it reads an existing int buffer (no new
        # kernel), so a crash in the ATE kernels can no longer take the
        # closure evidence down with it (BENCH_r03/r04 lost both).
        long_run["loop_closures"] = int(_read_scalar(
            slam2._closure_count_dev,
            timeout_s=max(20.0, min(300.0, _left(margin=60.0)))))
        _set_best(long_run)
    except Exception as e:
        long_run["read_error"] = repr(e)[:120]
    try:
        long_run["ate_rmse_m"] = round(
            _ate_of(slam2, gt2,
                    timeout_s=max(20.0, min(300.0, _left(margin=30.0)))), 6)
    except Exception as e:
        long_run.setdefault("read_error", repr(e)[:120])
    # Post-first-read the relay enters TRUE-sync mode
    # (tools/probe_exec_semantics.py, 2026-08-20: pre-read, blocks ack at
    # enqueue — a 1e6-step chain "blocks" in 0.1 ms; post-read, blocks
    # scale linearly with work and reads are instant). This is the ONLY
    # regime on an async-ack relay build where host clocks measure
    # execution, so re-time the fused BA iteration here and report it as
    # the trustworthy end-to-end number (round-4 verdict #5: the pre-read
    # profile_mfu rows were flagged unreliable). Runs LAST — after every
    # evidence read — so a hang here costs nothing already banked; the
    # block runs on a daemon thread with a bounded join for that reason.
    if ("sentinel_read" in long_run
            and os.environ.get("BENCH_SYNC_RETIME", "1") != "0"
            and _left(margin=60.0) > 30.0):
        def _block_bounded(x, timeout_s):
            box = {}

            def _b():
                try:
                    import jax as _jax
                    _jax.block_until_ready(x)
                    box["ok"] = True
                except Exception as ex:  # pragma: no cover
                    box["e"] = ex

            th = threading.Thread(target=_b, daemon=True)
            th.start()
            th.join(timeout_s)
            if th.is_alive():
                raise TimeoutError(f"block hung > {timeout_s:.0f}s")
            if "e" in box:
                raise box["e"]

        try:
            ba = slam2.direct_ba
            kw = dict(max_iterations=1, increase_ba_iteration_count=False)
            ba.bundle_adjustment(**kw)      # warm variant + drain queue
            _block_bounded(ba.keyframes.q, 60.0)
            t0 = time.perf_counter()
            for _ in range(3):
                ba.bundle_adjustment(**kw)
            _block_bounded(ba.keyframes.q, 120.0)
            long_run["ba_iteration_ms_sync"] = round(
                1e3 * (time.perf_counter() - t0) / 3, 3)
        except Exception as e:
            long_run["sync_retime_error"] = repr(e)[:120]
    print(json.dumps(long_run), flush=True)
    _set_best(long_run)
    _DONE = True
    if _READ_HUNG:
        # A read wedged inside the PJRT client; jax's atexit teardown
        # would join the same wedged state and hang the child forever.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


def _run_longrun_subprocess(budget_s: float) -> dict:
    """Launch the long-run in a fresh process; return its best JSON line.

    The relay accepts a second client while the parent holds its session
    (verified 2026-08-17: concurrent A/B processes both jit + read fine).
    If the child's post-run reads crashed the TPU worker (read_error) or
    the child died, retry in a fresh process WHEN the budget allows —
    compiles are warm in the persistent cache, so a retry costs the run,
    not the compiles. `budget_s` caps the whole section: each child gets
    the remaining time via BENCH_CHILD_BUDGET_S (its own governor trims
    sleeps/reads to fit), and retries are skipped once too little budget
    remains for a meaningful attempt."""
    import subprocess

    deadline = time.monotonic() + budget_s
    # Below this much remaining budget a child attempt cannot complete a
    # warm 720-frame warmup + timed pass + reads (measured r04 tail: the
    # passes alone are ~1-2 min warm); don't burn the tail on a doomed run.
    min_attempt_s = float(os.environ.get("BENCH_MIN_ATTEMPT_S", 420))
    retry_sleep_s = 150.0  # a crashed worker needs time to restart; 60 s
    # was not enough in r04 — all 3 attempts hit the same UNAVAILABLE.

    def once(child_budget: float):
        env = dict(os.environ, BENCH_CHILD_BUDGET_S=str(int(child_budget)))
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--longrun-child"],
                capture_output=True, text=True, env=env,
                timeout=child_budget + 60.0)
            out, err, rc = proc.stdout, proc.stderr, proc.returncode
        except subprocess.TimeoutExpired as te:  # governor failed to fire;
            # salvage whatever the child printed before the hard kill
            out = te.stdout or ""
            err = te.stderr or ""
            if isinstance(out, bytes):
                out = out.decode("utf-8", "replace")
            if isinstance(err, bytes):
                err = err.decode("utf-8", "replace")
            rc = -9
        if err:
            # Forward the child's stderr (phase Timing report + jax
            # warnings): stdout keeps the JSON-lines contract, stderr
            # carries diagnosis.
            print(err, file=sys.stderr, flush=True)
        last = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    last = json.loads(line)
                except ValueError:
                    pass
        if last is None:
            return {"error": f"child rc={rc}: {err.strip()[-200:]}"}
        if rc != 0:
            last.setdefault("child_error", err.strip()[-200:])
        return last

    attempts = [once(max(min_attempt_s, deadline - time.monotonic() - 30))]
    # The first-read session sync is flaky (PERF_NOTES: completes in
    # 16-315 s OR crashes the worker after ~10 min, apparently by relay
    # load) — retry in a fresh process while the budget holds.
    while ("error" in attempts[-1] or "read_error" in attempts[-1]) and \
            len(attempts) < 3 and \
            deadline - time.monotonic() > retry_sleep_s + min_attempt_s:
        time.sleep(retry_sleep_s)
        attempts.append(once(deadline - time.monotonic() - 30))

    def _completeness(a: dict) -> int:
        # Advisor r04: rank by completeness, not first-evidence — a partial
        # first attempt (closures read, ATE crashed) must not shadow a
        # later complete retry.
        return (2 if "ate_rmse_m" in a else 0) + \
               (1 if "loop_closures" in a else 0)

    best = max(attempts, key=_completeness)  # ties -> earliest attempt
    if len(attempts) > 1:
        best["prior_attempts"] = [
            {k: a.get(k) for k in ("error", "read_error") if k in a}
            for a in attempts if a is not best]
    return best


def _run_accuracy_subprocess(budget_s: float) -> dict:
    """Accuracy-evidence fallback child: the SAME long-run pipeline at
    BENCH_ACCURACY_FRAMES (default 240) with steady-frame chunking OFF and
    BA timing OFF. This is the SECOND chance at ATE/closure evidence when
    the 720-frame child dies mid-run (its primary evidence channel — the
    chronometric reads — never fires if the run itself crashes). A smaller
    unchunked run is the lowest-risk recipe we have: both post-run D2H
    modes are broken on this relay (chunked runs: worker crash ~100 s into
    the flush; unchunked: hang >900 s — measured 2026-08-19), but the
    chronometric channel needs only a LIVE worker, which short unchunked
    runs reliably leave behind. Provenance fields keep the recovered
    numbers from being mistaken for the 720-frame run's."""
    env_over = {
        "BENCH_LONGRUN_FRAMES": os.environ.get("BENCH_ACCURACY_FRAMES",
                                               "240"),
        "BENCH_LONGRUN_CHUNKING": "0",
        "BENCH_LONGRUN_BA_TIMING": "0",
    }
    old = {k: os.environ.get(k) for k in env_over}
    os.environ.update(env_over)
    try:
        out = _run_longrun_subprocess(budget_s)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return out


def main() -> None:
    global _DONE

    from badslam_tpu.utils.cache import enable_compile_cache

    # Global deadline (round-4 verdict #1b): bench must fit the driver's
    # wall-clock budget or force-emit its best line before dying. 2400 s
    # default leaves headroom under any plausible external timeout while
    # covering cold compiles + the long-run on the measured warm numbers.
    budget = float(os.environ.get("BENCH_BUDGET_S", 2400))
    deadline = time.monotonic() + budget
    _set_best({"metric": "slam_fps", "value": 0.0, "unit": "frames/s",
               "vs_baseline": 0.0,
               "error": "budget expired before the headline sections"})
    _start_governor(deadline, margin_s=25.0)

    _apply_platform_override()
    enable_compile_cache()

    # OPT-IN t=0 read (BENCH_T0_READ=1): pre-pays the session's one-time
    # first-read flush before any compiled program exists, making the
    # final slam_ate read instant (probe read-first 2026-08-19). Default
    # OFF: both 240-frame chunked runs attempted after a t0 read crashed
    # the TPU worker MID-RUN (PERF_NOTES round 5) — a risk the headline
    # sections must never take.
    if os.environ.get("BENCH_T0_READ", "0") == "1":
        import jax.numpy as jnp

        try:
            _read_scalar(jnp.asarray(np.float32(7.0)), retries=0,
                         timeout_s=240.0)
        except Exception:
            pass  # fall back to the guarded end-of-run read

    from badslam_tpu import synthetic as syn

    rng = np.random.default_rng(0)
    cam = syn.default_camera(WIDTH, HEIGHT)
    scene = syn.random_plane_scene(rng, num_planes=3)

    # One-time kernel autotuning for the benchmark shape (persisted in
    # ~/.cache/badslam_tpu/auto_tuning_result.json — later runs skip this).
    from badslam_tpu.ops import autotune as tuner
    from badslam_tpu.ops.pallas_kernels import autotune_preprocess

    if tuner.get(tuner.backend_key(f"bilateral_impl_{HEIGHT}x{WIDTH}")) is None:
        autotune_preprocess(HEIGHT, WIDTH)

    # Pre-pay the parent's own chrono channel (headline ATE leaves via
    # program timing too): probe compiles + calibration + the on-device
    # ATE executable at the headline trajectory shape, all BEFORE the
    # timed sections. Populates the persistent compile cache, so the
    # long-run child's identical warmup is a cache fetch. No reads.
    if os.environ.get("BENCH_CHRONO_READS", "1") != "0":
        import jax
        import jax.numpy as jnp

        from badslam_tpu.utils import timeread
        try:
            timeread.chrono_warmup(
                unit_ms=float(os.environ.get("BENCH_CHRONO_UNIT_MS", 25)),
                deadline_s=max(60.0, deadline - time.monotonic() - 900.0))
            z = np.zeros((SLAM_FRAMES, 3), np.float32)
            jax.block_until_ready(syn.ate_rmse_device(jnp.asarray(z), z))
        except Exception as e:
            print(f"chrono warmup failed: {e!r}", file=sys.stderr,
                  flush=True)

    # ALL timed sections of THIS process run before ANY device->host value
    # read: one read degrades the relay session ~1000x for the remainder
    # of the process (PERF_NOTES.md). The long-run section lives in its
    # own subprocess (own relay session, own prompt reads) so neither its
    # timing nor its reads interact with this process's state.
    errors = {}
    odo_runs = []
    try:
        for _ in range(3):
            odo_runs.append(bench_odometry(cam, scene))
        odo_fps = float(np.median(odo_runs))
    except Exception as e:
        odo_fps, errors["odometry"] = 0.0, repr(e)[:200]
    try:
        (slam_fps, slam_fps_pf, runs_ch, runs_pf, slam1, gt1,
         slam_repass) = bench_slam(cam, scene)
    except Exception as e:
        slam_fps, slam_fps_pf, runs_ch, runs_pf, slam1, gt1 = (
            0.0, 0.0, [], [], None, None)
        slam_repass = None
        errors["slam"] = repr(e)[:200]

    # Print the HEADLINE line IMMEDIATELY (round-4 verdict #1a): the driver
    # records the last JSON line on stdout, so from this point a timeout
    # surrenders only the long-run enrichment, never the round's number.
    headline = {
        "metric": "slam_fps",
        "value": round(slam_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(slam_fps / 30.0, 3),
        "value_runs": [round(v, 1) for v in runs_ch],
        "slam_fps_per_frame": round(slam_fps_pf, 2),
        "per_frame_runs": [round(v, 1) for v in runs_pf],
        "vga_odometry_fps": round(odo_fps, 2),
        "odometry_runs": [round(v, 1) for v in odo_runs],
        "long_run": {"status": "pending"},
        **({"errors": errors} if errors else {}),
    }
    _set_best(headline)
    print(json.dumps(headline), flush=True)

    # The long-run child goes BEFORE any parent read: in both r03 and r04
    # the parent's post-headline ATE read wedged (600 s hang) or crashed
    # the TPU worker, and the long-run children launched into that
    # poisoned window — every child sentinel read then hit UNAVAILABLE.
    # With the child first, its one evidence read runs against a quiet
    # relay; the parent's own read risk comes after, where it can only
    # hurt the parent's ATE field.
    min_attempt_s = float(os.environ.get("BENCH_MIN_ATTEMPT_S", 420))
    remaining = deadline - time.monotonic() - 60.0
    # Reserve an accuracy-fallback slice UP FRONT (r05 rehearsal: the
    # 720-frame child burned the whole remaining budget on a 536 s
    # sentinel-read worker crash, so the fallback — the only channel that
    # has ever produced ATE on this relay — was skipped with 0 s left).
    # Only reserve when there is room for both; otherwise the long-run
    # keeps everything, as before.
    reserve = 0.0
    if (os.environ.get("BENCH_ACCURACY_FALLBACK", "1") != "0"
            and remaining >= 2 * min_attempt_s + 90.0):
        reserve = min_attempt_s + 90.0
    if remaining >= min_attempt_s:
        long_run = _run_longrun_subprocess(remaining - reserve)
    else:
        long_run = {"skipped":
                    f"insufficient budget ({remaining:.0f}s left)"}
    headline["long_run"] = long_run
    _set_best(headline)

    # Accuracy fallback (round-4 verdict #2: no long_run.ate_rmse_m has
    # EVER landed in a BENCH json): if the 720-frame child lost its reads
    # to the post-run worker crash and budget remains, recover ATE +
    # closures from a smaller UNCHUNKED run whose flush survives, with
    # explicit provenance fields.
    remaining = deadline - time.monotonic() - 60.0
    if ("ate_rmse_m" not in long_run
            and os.environ.get("BENCH_ACCURACY_FALLBACK", "1") != "0"
            and remaining >= min_attempt_s):
        # If the long-run child's reads crashed the TPU worker, it needs
        # ~150 s to restart before a new session can attach (measured
        # 2026-08-20: an accuracy child launched 90 s after the crash
        # died instantly with UNAVAILABLE). Sleep only when evidence of a
        # crash is present and the budget can absorb it.
        crashed = any(("UNAVAILABLE" in str(long_run.get(k, "")))
                      for k in ("sentinel_error", "read_error", "error"))
        if crashed and remaining - 150.0 >= min_attempt_s:
            time.sleep(150.0)
            remaining = deadline - time.monotonic() - 60.0
        acc = _run_accuracy_subprocess(remaining)
        for k in ("ate_rmse_m", "loop_closures"):
            if k in acc and k not in long_run:
                long_run[k] = acc[k]
                long_run[f"{k}_provenance"] = {
                    "frames": acc.get("frames"),
                    "chunking": False,
                    "note": "accuracy fallback child (unchunked)",
                }
        long_run["accuracy_run"] = {
            k: acc.get(k) for k in
            ("frames", "fps_total", "ate_rmse_m", "loop_closures",
             "sentinel_read_s", "error", "read_error", "sentinel_error")
            if k in acc}
        _set_best(headline)

    # -------- parent reads (degradation tolerated from here on) --------
    # Guarded AND bounded: the final enriched line must print even if the
    # TPU worker died mid-run. The ATE itself is computed on device; only
    # 11 floats are read, inside the remaining budget.
    try:
        slam_ate = None
        if slam1 is None:
            slam_ate = -1.0
        elif os.environ.get("BENCH_CHRONO_READS", "1") != "0":
            # Read-free channel first (utils/timeread.py): the headline
            # ATE arrives via program timing, so the parent never issues
            # the D2H session flush that killed this read in r03/r04. On
            # an async-ack relay build (blocks ack at enqueue, measured
            # 2026-08-20) this raises ChronoError in milliseconds and the
            # D2H path below takes over — on that build the post-run
            # first read is slow (~390 s one-time flush) but completes.
            try:
                from badslam_tpu import synthetic as syn
                from badslam_tpu.utils import timeread
                gt_t1 = np.array([np.asarray(p.t, np.float32)
                                  for p in gt1])
                n_tr = min(slam1.traj_q.shape[0], len(gt_t1))
                a = timeread.chronometric_read(
                    syn.ate_rmse_device(slam1.traj_t[:n_tr],
                                        gt_t1[:n_tr]),
                    scale=1e7, digits=8,
                    deadline_s=max(30.0,
                                   deadline - time.monotonic() - 45.0))
                slam_ate = a["value"]
                headline["slam_ate_read"] = {
                    "channel": "chronometric",
                    "checksum_ok": a["checksum_ok"],
                    "unit_ms": a["unit_ms"]}
            except Exception as e:
                headline["slam_ate_chrono_error"] = repr(e)[:120]
        if slam_ate is None:
            read_budget = max(20.0, min(
                600.0, deadline - time.monotonic() - 45.0))
            slam_ate = round(_ate_of(slam1, gt1, timeout_s=read_budget), 8)
            headline["slam_ate_read"] = {"channel": "d2h"}
    except Exception as e:
        slam_ate = f"read failed: {repr(e)[:120]}"
    headline["slam_ate_rmse_m"] = slam_ate

    # True-sync FPS re-pass (async-ack relay builds only meaningful after
    # the first read above flipped the session to sync mode): one more
    # 60-frame chunked pass whose blocks now wait for execution. Reported
    # NEXT TO the submission-rate headline, never replacing it — the pair
    # bounds the real number from both sides.
    if (slam_repass is not None and isinstance(slam_ate, float)
            and headline.get("slam_ate_read", {}).get("channel") == "d2h"
            and os.environ.get("BENCH_SYNC_RETIME", "1") != "0"
            and deadline - time.monotonic() > 180.0):
        try:
            headline["slam_fps_sync"] = round(slam_repass(), 2)
        except Exception as e:
            headline["slam_fps_sync_error"] = repr(e)[:120]

    print(json.dumps(headline), flush=True)
    _set_best(headline)
    _DONE = True
    if _READ_HUNG:  # see _longrun_child: atexit would join the wedge
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    import sys

    if "--longrun-child" in sys.argv:
        _longrun_child()
    else:
        try:
            main()
        except BaseException as e:  # the driver records exactly ONE line:
            # emit it even when the TPU backend itself is unavailable
            # (observed 2026-08-17: axon init UNAVAILABLE after a worker
            # crash — the run died before any section could print).
            print(json.dumps({
                "metric": "slam_fps", "value": 0.0, "unit": "frames/s",
                "vs_baseline": 0.0, "error": repr(e)[:300],
            }))
            raise
