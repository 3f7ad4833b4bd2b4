#!/usr/bin/env python
"""Utilization profile of the FUSED programs (VERDICT round-2 #6).

For each fused program (steady frame, one BA iteration, and the BA
sub-stages with the descriptor term on/off), reports:

- XLA cost analysis of the compiled module: FLOPs + bytes accessed
  (``compiled.cost_analysis()`` — host-side metadata, no device read);
- amortized wall time per call (host clocks + ONE block_until_ready per
  batch, PERF_NOTES.md: never read device values on the relay);
- achieved GFLOP/s and GB/s, arithmetic intensity, and the implied
  fraction of TPU v5e peak (197 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU,
  819 GB/s HBM) -> a roofline classification per program.

The descriptor on/off delta on geometry+pose opt isolates the
descriptor-gather path's cost (SURVEY §7 hard-part #5) to decide whether
a Pallas kernel for it is warranted.

Run ON THE TPU (no JAX_PLATFORMS override) with an idle relay — a busy
queue inflates every number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]

V5E_PEAK_F32 = 49e12     # MXU f32 (half of bf16 197/2 ≈ 98 per MXU pass;
                         # conservative public figure for v5e f32 matmul)
V5E_PEAK_BF16 = 197e12
V5E_HBM_BPS = 819e9


def _fmt_cost(ca: dict) -> tuple[float, float]:
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def main() -> int:
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from badslam_tpu import synthetic as syn
    from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
    from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
    from badslam_tpu.ba.scheme import DirectBA
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.frontend import _identity_hist, _steady_frame_fn
    from badslam_tpu.ops.preprocess import preprocess_frame
    from badslam_tpu.ops.pyramid import build_pyramid

    print(f"backend: {jax.default_backend()}", flush=True)

    # --- representative state: K=6 VGA keyframes, surfels created ---
    # (--small: QVGA/K=4/2-scale smoke mode to validate the tool on CPU
    # without burning an hour of XLA:CPU compiles.)
    small = "--small" in sys.argv
    K = 4 if small else 6
    cfg = BadSlamConfig(num_scales=2 if small else 5,
                        max_surfel_count=1 << (16 if small else 20),
                        enable_loop_detection=False)
    rng = np.random.default_rng(0)
    cam = syn.default_camera(160 if small else 640, 120 if small else 480)
    scene = syn.random_plane_scene(rng, 3)
    ba = DirectBA(cam, cfg)
    gt = syn.smooth_trajectory(K, scale=0.02)
    for i, pose in enumerate(gt):
        depth, inten = syn.render_scene(cam, scene, pose)
        g = np.clip(inten * 255, 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], -1)
        frame = preprocess_frame(cam, jnp.array(depth), jnp.array(rgb),
                                 max_depth=cfg.max_depth)
        ba.add_keyframe(frame, pose, i)
        ba.create_surfels_for_keyframe(i, filter_new_surfels=(i > 0))
    bucket = ba._bucket_size(ba.known_surfel_bound)

    def fresh_view():
        # Fresh high-water slice per section: the fused BA program DONATES
        # its surfel-map argument, so a shared slice would be a deleted
        # buffer by the second section. jnp.copy matters: when bucket ==
        # capacity, a[:bucket] is an identity slice aliasing ba.surfels,
        # and donating the alias deletes the master copy.
        return jax.tree.map(
            lambda a: jnp.copy(a[:bucket]) if getattr(a, "ndim", 0) > 0
            else jnp.copy(a),  # scalar leaves (count) are donated too
            ba.surfels)

    ks = ba.keyframes
    print(f"keyframes: {K}/{ks.capacity} cap, surfel bucket {bucket}",
          flush=True)

    results = {}

    def profile(name, fn, *args, reps=8, feedback=None, **kwargs):
        """cost_analysis flops + memory_analysis traffic + amortized timing.

        Bytes: ``cost_analysis()['bytes accessed']`` counts LOGICAL bytes of
        every HLO op including fusion-internal values (82 GB for one VGA
        frame program) — useless as HBM traffic. ``memory_analysis()``
        argument+output+temp sizes are what the executable actually touches
        in HBM at least once; we report that as the traffic LOWER bound and
        build the roofline from it (a kernel re-reading an operand raises
        real traffic above the bound, so pct_of_roofline is an upper bound
        on how close to the speed of light the program is). Donated
        (aliased) buffers count TWICE — the pages are read as an input and
        written as an output, i.e. two HBM traversals.

        Sanity (round-3 advisor findings): a row whose implied traffic rate
        exceeds the HBM peak, or that otherwise contradicts physics, is
        re-timed once and, if still impossible, published with
        ``"unreliable": reason`` so it cannot silently mislead kernel
        decisions.

        `feedback`: optional fn(out, args)->args mapping outputs back into
        the argument tuple for donated-buffer programs."""
        lowered = fn.lower(*args, **kwargs)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        flops, logical_bytes = _fmt_cost(ca)
        traffic = None
        try:
            ma = compiled.memory_analysis()
            # arg + out + temp; aliased (donated) bytes appear in BOTH the
            # argument and output sizes, which is correct: they are read
            # once and written once.
            traffic = float(ma.argument_size_in_bytes
                            + ma.output_size_in_bytes
                            + ma.temp_size_in_bytes)
        except Exception as e:
            print(f"WARNING: memory_analysis failed for {name}: {e!r}; "
                  "traffic-derived fields will be null", flush=True)

        out = fn(*args, **kwargs)
        if feedback is not None:
            args = feedback(out, args)
        jax.block_until_ready(out)

        def timed(n):
            nonlocal out, args
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args, **kwargs)
                if feedback is not None:
                    args = feedback(out, args)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / n

        dt = timed(reps)
        # Sub-ms programs need a longer batch: relay/dispatch jitter is
        # ~ms-scale, so make the timed region span >=30 ms of work.
        if dt * reps < 0.030:
            dt = timed(max(reps, int(0.030 / max(dt, 1e-5)) + 1))

        unreliable = None
        if traffic is not None and traffic / dt > V5E_HBM_BPS:
            # The traffic LOWER bound divided by wall time cannot exceed the
            # HBM peak; re-time with a longer batch (>=300 ms of work) in
            # case the short batch under-measured a sub-ms donated program.
            dt2 = timed(max(reps, int(0.300 / max(dt, 1e-5)) + 1))
            dt = max(dt, dt2)
            if traffic / dt > V5E_HBM_BPS:
                unreliable = (
                    "implied traffic rate exceeds HBM peak: the timing "
                    "under-measures this program or memory_analysis bytes "
                    "are not all touched per call")
                print(f"WARNING: {name}: {unreliable}", flush=True)

        gflops = flops / dt / 1e9
        results[name] = {
            "ms_per_call": round(1e3 * dt, 3),
            "gflop_per_call": round(flops / 1e9, 3),
            "logical_gbytes_cost_analysis": round(logical_bytes / 1e9, 2),
            "achieved_gflops": round(gflops, 1),
            "pct_of_f32_peak": round(100 * gflops * 1e9 / V5E_PEAK_F32, 2),
        }
        if traffic is None:
            results[name].update(
                min_traffic_gbytes=None, min_traffic_gbps=None,
                arith_intensity_flop_per_byte=None,
                pct_of_hbm_bw_lower_bound=None,
                pct_of_roofline_upper_bound=None,
                unreliable="memory_analysis failed",
            )
            print(f"{name:<34} {1e3*dt:8.3f} ms  {flops/1e9:8.2f} GF  "
                  f"(no traffic) -> {gflops:8.1f} GF/s", flush=True)
            return out
        gbps = traffic / dt / 1e9
        intensity = flops / max(traffic, 1.0)
        # Roofline from the traffic lower bound, f32 compute peak.
        roof = min(V5E_PEAK_F32, intensity * V5E_HBM_BPS)
        results[name].update({
            "min_traffic_gbytes": round(traffic / 1e9, 4),
            "min_traffic_gbps": round(gbps, 1),
            "arith_intensity_flop_per_byte": round(intensity, 2),
            "pct_of_hbm_bw_lower_bound": round(100 * gbps * 1e9 / V5E_HBM_BPS,
                                               2),
            "pct_of_roofline_upper_bound": round(100 * flops / dt / roof, 1),
        })
        if unreliable:
            results[name]["unreliable"] = unreliable
        print(f"{name:<34} {1e3*dt:8.3f} ms  {flops/1e9:8.2f} GF  "
              f"{traffic/1e9:7.3f} GB  -> {gflops:8.1f} GF/s "
              f"{gbps:7.1f} GB/s  AI={intensity:6.1f} "
              f"roofline<={100*flops/dt/roof:5.1f}%", flush=True)
        return out

    def check_subset_consistency(full_name, subset_names):
        """A strictly-less-work variant timing slower than its superset
        means the measurements cannot locate costs (round-3 advisor):
        mark both rows so the bisect is not trusted."""
        full = results.get(full_name)
        if not full:
            return
        for s in subset_names:
            sub = results.get(s)
            if sub and sub["ms_per_call"] > 1.15 * full["ms_per_call"]:
                msg = (f"subset '{s}' measured slower than its superset "
                       f"'{full_name}' ({sub['ms_per_call']} vs "
                       f"{full['ms_per_call']} ms) — bisect unreliable "
                       "(re-run with an idle relay)")
                print(f"WARNING: {msg}", flush=True)
                sub["unreliable"] = msg
                full.setdefault("unreliable", msg)

    # ---------------- fused steady frame ----------------
    steady = _steady_frame_fn((
        cfg.max_depth, cfg.bilateral_filter_sigma_xy,
        cfg.bilateral_filter_radius_factor,
        cfg.bilateral_filter_sigma_inv_depth,
        cfg.sparse_surfel_cell_size, cfg.raw_to_float_depth,
        cfg.num_scales, cfg.use_gradmag, cfg.baseline_fx,
        cfg.use_geometric_residuals, cfg.use_photometric_residuals,
        cfg.use_motion_model, cfg.tracking_max_iterations,
        cfg.median_filter_and_densify_iterations))
    cams = tuple(cam.pyramid_level(i) for i in range(cfg.num_scales))
    depth_np, inten_np = syn.render_scene(cam, scene, gt[0])
    depth_u16 = np.clip(depth_np / cfg.raw_to_float_depth, 0,
                        65535).astype(np.uint16)
    g8 = np.clip(inten_np * 255, 0, 255).astype(np.uint8)
    rgb_u8 = np.stack([g8, g8, g8], -1)
    frame0 = preprocess_frame(cam, jnp.array(depth_np),
                              jnp.array(rgb_u8), max_depth=cfg.max_depth)
    base_pyr = build_pyramid(frame0.depth, frame0.nx, frame0.ny,
                             frame0.intensity, cfg.num_scales)
    hq, ht = _identity_hist()
    n_frames = 64
    traj_q = jnp.zeros((n_frames, 4), jnp.float32).at[:, 0].set(1.0)
    traj_t = jnp.zeros((n_frames, 3), jnp.float32)
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)

    params = ba.depth_params

    def steady_args():
        return (cam, cams, base_pyr, jnp.array(depth_u16),
                jnp.array(rgb_u8), None, params.a, params.cfactor,
                q0, t0v, traj_q, traj_t, hq, ht, jnp.int32(1))

    def steady_feedback(out, args):
        _, _, tq, tt, nhq, nht, _, _ = out
        a = list(args)
        a[3] = jnp.array(depth_u16)  # fresh uploads each frame, like the
        a[4] = jnp.array(rgb_u8)     # real loop
        a[10], a[11], a[12], a[13] = tq, tt, nhq, nht
        return tuple(a)

    profile(f"steady frame (fused, {cam.width}x{cam.height})",
            steady, *steady_args(),
            test_two=True, feedback=steady_feedback)

    # ---------------- one fused BA iteration ----------------
    from badslam_tpu.ba.scheme import _ba_iteration

    def ba_args(use_desc):
        return (fresh_view(), cam, ks.depth, ks.nx, ks.ny, ks.radius2,
                ks.intensity, ks.rgb, ks.q, ks.t, ks.valid,
                ks.activation, ks.last_active_iter, ks.last_covis_iter,
                ks.covis, jnp.int32(1), jnp.int32(1)), dict(
                    baseline_fx=cfg.baseline_fx,
                    cell_size=cfg.sparse_surfel_cell_size,
                    merge_dist_factor=0.8,
                    use_depth=True, use_descriptor=use_desc,
                    optimize_geometry=True, do_surfel_updates=True,
                    optimize_poses=True, pose_iterations=30,
                    activate_all=True)

    def ba_feedback(out, args):
        a = list(args)
        a[0] = out[0]  # donated surfel map flows through
        return tuple(a)

    args, kw = ba_args(True)
    profile("BA iteration (fused, desc on)", _ba_iteration, *args,
            feedback=ba_feedback, **kw)
    args, kw = ba_args(False)
    profile("BA iteration (fused, desc off)", _ba_iteration, *args,
            feedback=ba_feedback, **kw)

    # Stage bisect of the fused desc-on iteration: turn one stage group off
    # at a time (they are static flags) to locate where the desc-on cost
    # lives inside the single program.
    for label, overrides in (
        ("fused desc on, pose opt OFF", dict(optimize_poses=False)),
        ("fused desc on, geometry OFF", dict(optimize_geometry=False)),
        ("fused desc on, surfel upd OFF", dict(do_surfel_updates=False)),
    ):
        args, kw = ba_args(True)
        kw.update(overrides)
        profile(label, _ba_iteration, *args, feedback=ba_feedback, **kw)

    check_subset_consistency(
        "BA iteration (fused, desc on)",
        ["fused desc on, pose opt OFF", "fused desc on, geometry OFF",
         "fused desc on, surfel upd OFF"])

    # ---------------- descriptor-gather isolation ----------------
    kstack = ks.stack()
    stage_view = fresh_view()
    for name, use_desc in (("pose opt 30GN (desc on)", True),
                           ("pose opt 30GN (desc off)", False)):
        profile(name, optimize_keyframe_poses, stage_view, cam, kstack,
                baseline_fx=cfg.baseline_fx, use_depth=True,
                use_descriptor=use_desc, max_iterations=30)
    for name, use_desc in (("geometry opt (desc on)", True),
                           ("geometry opt (desc off)", False)):
        profile(name, optimize_geometry_iteration, stage_view, cam, kstack,
                baseline_fx=cfg.baseline_fx, use_depth=True,
                use_descriptor=use_desc)

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "profile_mfu.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out_path)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
