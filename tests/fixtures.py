"""Shared fixture helpers for BA/tracking round-trip tests."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from badslam_tpu.ops.preprocess import (
    ProcessedFrame,
    compute_normals,
    compute_radii_and_remove_isolated,
)


def frame_from_render(cam, depth, intensity) -> ProcessedFrame:
    """ProcessedFrame from ground-truth renders (no bilateral smoothing),
    like the reference's test-only Keyframe CPU constructor
    (keyframe.h:93-100)."""
    d = jnp.array(depth)
    d1, nx, ny = compute_normals(cam, d)
    d2, r2 = compute_radii_and_remove_isolated(cam, d1)
    keep = d2 > 0
    return ProcessedFrame(
        depth=d2,
        nx=jnp.where(keep, nx, 0.0),
        ny=jnp.where(keep, ny, 0.0),
        radius2=r2,
        intensity=jnp.array(intensity),
    )


def relative_pose_error(se3_mod, pose_a, pose_b, gt_a, gt_b) -> float:
    """|log((a^-1 b)^-1 (gta^-1 gtb))| — gauge-invariant pose error."""
    rel = se3_mod.mul(se3_mod.inverse(pose_a), pose_b)
    gt_rel = se3_mod.mul(se3_mod.inverse(gt_a), gt_b)
    err = se3_mod.log(se3_mod.mul(se3_mod.inverse(rel), gt_rel))
    return float(np.linalg.norm(np.asarray(err)))
