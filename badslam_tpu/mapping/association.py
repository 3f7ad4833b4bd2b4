"""Surfel <-> keyframe-pixel association (vectorized over all surfels).

TPU rebuild of IsAssociatedWithPixel / SurfelProjectsToAssociatedPixel
(/root/reference/applications/badslam/src/badslam/surfel_projection_nvcc_only.cuh:46-230):
project every surfel into a frame, gather the pixel measurements, and apply
the association gates (depth gap vs propagated stereo sigma, camera-facing,
normal compatibility). One [N]-wide masked computation instead of one CUDA
thread per surfel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry.linalg import rotate3, transform3
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import gather_nearest
from badslam_tpu.ops.preprocess import normal_z


class Association(NamedTuple):
    """Per-surfel association result against one frame. All arrays [N]."""

    valid: jax.Array        # associated with the pixel it projects to
    projects: jax.Array     # projects into the image with valid pixel depth
    free_space_violation: jax.Array  # pixel depth far BEHIND surfel
    px: jax.Array           # int32 pixel column (clamped)
    py: jax.Array           # int32 pixel row (clamped)
    pxy_x: jax.Array        # float corner-convention projection x
    pxy_y: jax.Array
    lx: jax.Array           # surfel position in frame coords
    ly: jax.Array
    lz: jax.Array
    nlx: jax.Array          # surfel normal in frame coords
    nly: jax.Array
    nlz: jax.Array
    pixel_depth: jax.Array  # measured calibrated depth at (py, px)
    stddev: jax.Array       # propagated depth-residual sigma


def associate_surfels_with_frame(
    cam: PinholeCamera,
    positions: jax.Array,     # [N, 3] global
    normals: jax.Array,       # [N, 3] global
    surfel_mask: jax.Array,   # [N] bool (valid surfels)
    frame_q: jax.Array,       # frame_T_global rotation (wxyz)
    frame_t: jax.Array,
    depth: jax.Array,         # [H, W]
    f_nx: jax.Array,          # [H, W] frame normal planes
    f_ny: jax.Array,
    baseline_fx: float,
    depth_tukey_param: float = robust.DEPTH_TUKEY_PARAM,
) -> Association:
    h, w = depth.shape
    R = se3.quat_to_matrix(frame_q)

    local = transform3(R, frame_t, positions)
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    proj = surfel_mask & (lz > 0)

    safe_z = jnp.where(proj, lz, 1.0)
    pxy_x = cam.fx * lx / safe_z + cam.cx
    pxy_y = cam.fy * ly / safe_z + cam.cy
    pxf = jnp.floor(pxy_x)
    pyf = jnp.floor(pxy_y)
    proj &= (pxy_x >= 0) & (pxy_y >= 0) & (pxf < w) & (pyf < h) & (pxf >= 0) & (pyf >= 0)
    px = jnp.clip(pxf.astype(jnp.int32), 0, w - 1)
    py = jnp.clip(pyf.astype(jnp.int32), 0, h - 1)

    d_pix = gather_nearest(depth, px, py)
    projects = proj & (d_pix > 0)

    nl = rotate3(R, normals)
    nlx, nly, nlz = nl[..., 0], nl[..., 1], nl[..., 2]

    dtype = positions.dtype
    un_x = cam.fx_inv * px.astype(dtype) + cam.cx_inv
    un_y = cam.fy_inv * py.astype(dtype) + cam.cy_inv
    stddev = (
        robust.DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
        * jnp.abs(nlx * un_x + nly * un_y + nlz)
        * (d_pix * d_pix)
    ) / baseline_fx

    gap = d_pix - lz
    threshold = depth_tukey_param * stddev
    fsv = projects & (gap > threshold)
    depth_ok = projects & (jnp.abs(gap) <= threshold)

    facing = (lx * nlx + ly * nly + lz * nlz) <= 0

    m_nx = gather_nearest(f_nx, px, py)
    m_ny = gather_nearest(f_ny, px, py)
    m_nz = normal_z(m_nx, m_ny)
    normal_ok = (
        nlx * m_nx + nly * m_ny + nlz * m_nz
    ) >= robust.COS_NORMAL_COMPATIBILITY_THRESHOLD

    valid = depth_ok & facing & normal_ok
    return Association(
        valid=valid,
        projects=projects,
        free_space_violation=fsv,
        px=px, py=py, pxy_x=pxy_x, pxy_y=pxy_y,
        lx=lx, ly=ly, lz=lz,
        nlx=nlx, nly=nly, nlz=nlz,
        pixel_depth=d_pix,
        stddev=stddev,
    )


def tangent_projections(
    positions: jax.Array,   # [N, 3] global surfel positions
    normals: jax.Array,     # [N, 3] global surfel normals
    radius2: jax.Array,     # [N]
    frame_q: jax.Array,     # frame_T_global
    frame_t: jax.Array,
    cam: PinholeCamera,
):
    """Project two fixed tangent points on each surfel's border.

    Rebuild of ComputeTangentProjections (cost_function.cuh:113-135):
    t1 = normal x (|nx|>0.9 ? ey : ex), t2 = normal x t1, both scaled to
    kTangentScaling * surfel radius. Returns (t1_px, t1_py, t2_px, t2_py,
    z-positive mask).
    """
    k_tangent_scaling = 2.0
    n = normals
    pick_ey = jnp.abs(n[..., 0]) > 0.9
    ref = jnp.where(
        pick_ey[..., None],
        jnp.array([0.0, 1.0, 0.0], n.dtype),
        jnp.array([1.0, 0.0, 0.0], n.dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 * (
        k_tangent_scaling
        * jnp.sqrt(radius2 / jnp.maximum(1e-12, jnp.sum(t1 * t1, axis=-1)))
    )[..., None]
    t2 = jnp.cross(n, t1)
    t2 = t2 * (
        k_tangent_scaling
        * jnp.sqrt(radius2 / jnp.maximum(1e-12, jnp.sum(t2 * t2, axis=-1)))
    )[..., None]

    R = se3.quat_to_matrix(frame_q)
    p1 = transform3(R, frame_t, positions + t1)
    p2 = transform3(R, frame_t, positions + t2)
    ok = (p1[..., 2] > 0) & (p2[..., 2] > 0)
    s1 = jnp.where(p1[..., 2] > 0, p1[..., 2], 1.0)
    s2 = jnp.where(p2[..., 2] > 0, p2[..., 2], 1.0)
    t1_px = cam.fx * p1[..., 0] / s1 + cam.cx
    t1_py = cam.fy * p1[..., 1] / s1 + cam.cy
    t2_px = cam.fx * p2[..., 0] / s2 + cam.cx
    t2_py = cam.fy * p2[..., 1] / s2 + cam.cy
    return t1_px, t1_py, t2_px, t2_py, ok
