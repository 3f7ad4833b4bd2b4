"""Intrinsics/deformation self-calibration round-trip tests
(test_intrinsics_optimization_geometric_residual.cc analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.ba.intrinsics_opt import (
    DepthParams,
    empty_depth_params,
    optimize_intrinsics,
    updated_depth_camera,
)
from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3

import fixtures
import synthetic

CELL = 4
CAP = 1 << 13


def build_ba(rng, num_kf=6, width=128, height=96):
    cam = synthetic.default_camera(width, height)
    scene = synthetic.random_plane_scene(rng, 4)
    cfg = BadSlamConfig(max_surfel_count=CAP, sparse_surfel_cell_size=CELL)
    ba = DirectBA(cam, cfg, surfel_capacity=CAP)
    gt = [synthetic.pose(tx=0.05 * i, ry=0.01 * i, ty=0.02 * (i % 2))
          for i in range(num_kf)]
    frames = []
    for i, g in enumerate(gt):
        d, inten = synthetic.render_scene(cam, scene, g)
        f = fixtures.frame_from_render(cam, d, inten)
        f = f._replace(raw_depth=f.depth)
        frames.append(f)
        ba.add_keyframe(f, g, i)
    ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
    for i in range(1, num_kf):
        ba.create_surfels_for_keyframe(i, filter_new_surfels=True)
    ba.surfels = ba.surfels._replace(active=ba.surfels.valid)
    return cam, ba, gt, frames


def test_updated_depth_camera_identity():
    cam = synthetic.default_camera(64, 48)
    out = updated_depth_camera(cam, np.zeros(5, np.float32))
    assert np.allclose(
        [out.fx, out.fy, out.cx, out.cy], [cam.fx, cam.fy, cam.cx, cam.cy],
        rtol=1e-6,
    )


def test_depth_deformation_recovery():
    """Corrupt keyframe depth with a known cfactor offset; the Schur GN must
    drive the calibrated depth back toward the surfel map (built from GT)."""
    rng = np.random.default_rng(11)
    cam, ba, gt, frames = build_ba(rng)
    ks = ba.keyframes

    # GT deformation: cfactor* = 0.02 everywhere (a* = 0). Raw depth chosen
    # so that calibrating with GT params reproduces the GT depth:
    # 1/raw = 1/cal - cf*.
    cf_gt = 0.01
    gt_depth = np.asarray(ks.depth)

    raw = np.where(
        gt_depth > 0, 1.0 / (1.0 / np.maximum(gt_depth, 1e-6) - cf_gt), 0.0
    ).astype(np.float32)
    ks.raw_depth = jnp.array(raw)
    # Start from identity params: keyframe depth = raw (miscalibrated).
    params0 = empty_depth_params(cam.height, cam.width, CELL)
    ba.depth_params = params0
    ks.recalibrate(cam, params0.a, params0.cfactor, CELL)

    err0 = float(np.mean(np.abs(
        np.asarray(ks.depth)[gt_depth > 0] - gt_depth[gt_depth > 0]
    )))
    assert err0 > 1e-3  # the corruption is material

    for _ in range(5):
        ba.optimize_intrinsics_step(
            optimize_depth_intrinsics=True, optimize_color_intrinsics=False
        )

    # Cells with no surfel observation keep cfactor = 0 by design (the
    # reference resets them, kernel_opt_intrinsics.cu:415-420), so measure
    # over pixels whose cell WAS optimized.
    cf = np.asarray(ba.depth_params.cfactor)
    observed = np.abs(cf) > 1e-6
    assert observed.mean() > 0.3
    # The recovered per-cell deformation matches the GT corruption.
    assert abs(np.median(cf[observed]) - cf_gt) < 0.2 * cf_gt

    ys, xs = np.mgrid[0:cam.height, 0:cam.width]
    px_observed = observed[ys // CELL, xs // CELL][None] & (gt_depth > 0)
    err1 = float(np.mean(np.abs(
        np.asarray(ba.keyframes.depth)[px_observed]
        - gt_depth[px_observed]
    )))
    assert err1 < 0.25 * err0, (err0, err1)


def test_joint_depth_and_color_intrinsics_recovery():
    """Perturb the camera and enable BOTH depth and color optimization (the
    default configuration). Regression test for the round-1 bug where the
    color system was accumulated and silently discarded when optimize_depth
    was also set; now the photometric system folds into the joint 5x5 solve
    (reference runs both solves per call, kernel_opt_intrinsics.cc:256-280)."""
    rng = np.random.default_rng(17)
    cam, ba, gt, frames = build_ba(rng)
    ks = ba.keyframes
    kstack = ks.stack()
    raw = ks.stack_raw()
    params = ba.depth_params

    bad_cam = cam.with_intrinsics(
        fx=cam.fx * 1.004, fy=cam.fy, cx=cam.cx + 0.5, cy=cam.cy - 0.5
    )

    def err(c):
        return (abs(c.fx - cam.fx) / cam.fx * 100.0
                + abs(c.cx - cam.cx) + abs(c.cy - cam.cy))

    err0 = err(bad_cam)
    out_cam = bad_cam
    for _ in range(6):
        out_cam, params = optimize_intrinsics(
            ba.surfels, out_cam, kstack, raw, params,
            baseline_fx=40.0, cell_size=CELL,
            optimize_depth=True, optimize_color=True,
        )
    err1 = err(out_cam)
    assert np.isfinite(err1)
    assert err1 < 0.5 * err0, (err0, err1)


def test_color_intrinsics_recovery():
    """Perturb the sampling camera; photometric 4x4 GN must pull cx/cy back."""
    rng = np.random.default_rng(13)
    cam, ba, gt, frames = build_ba(rng)
    ks = ba.keyframes
    kstack = ks.stack()
    raw = ks.stack_raw()
    params = ba.depth_params

    bad_cam = cam.with_intrinsics(
        fx=cam.fx, fy=cam.fy, cx=cam.cx + 0.6, cy=cam.cy - 0.6
    )
    err0 = abs(bad_cam.cx - cam.cx) + abs(bad_cam.cy - cam.cy)
    out_cam = bad_cam
    for _ in range(5):
        out_cam, _ = optimize_intrinsics(
            ba.surfels, out_cam, kstack, raw, params,
            baseline_fx=40.0, cell_size=CELL,
            optimize_depth=False, optimize_color=True,
        )
    err1 = abs(out_cam.cx - cam.cx) + abs(out_cam.cy - cam.cy)
    assert err1 < 0.5 * err0, (err0, err1)
