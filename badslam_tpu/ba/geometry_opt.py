"""Surfel geometry optimization (normals, 1-D position, descriptors).

TPU rebuild of OptimizeGeometryIterationCUDA
(/root/reference/applications/badslam/src/badslam/kernel_opt_geometry.cu,
kernel_opt_geometry.cc:80-201). Two sub-steps per BA iteration:

  (a) normals: average the observing keyframes' measurement normals
      (rotated to world) over all associations;
  (b) position along the normal, jointly with the 2 descriptor components
      when photometric residuals are on: accumulate a per-surfel 3x3
      Gauss-Newton system over keyframes, then a closed-form Cholesky
      solve per surfel.

TPU redesign: the reference launches one accumulation kernel per keyframe
into persistent SoA scratch rows; here a lax.scan over the stacked keyframe
axis accumulates into live [N]-vector registers inside one jitted program,
and the final solve is a vectorized 3x3 Cholesky over all surfels at once.
Deviation: averaged normals are re-normalized to unit length (the reference
stores the raw average, clamped by its 10-bit packing)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry.linalg import rotate3
from badslam_tpu.mapping.association import (
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import KeyframeStack
from badslam_tpu.mapping.surfels import SurfelMap
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear_and_gradient, gather_nearest
from badslam_tpu.ops.preprocess import normal_z


def _assoc(smap, cam, q, t, d, fx_, fy_, baseline_fx):
    ftg = se3.inverse(se3.SE3(q, t))
    return ftg, associate_surfels_with_frame(
        cam, smap.pos, smap.normal, smap.valid & smap.active,
        ftg.q, ftg.t, d, fx_, fy_, baseline_fx,
    )


@functools.partial(jax.jit, static_argnames=("baseline_fx",))
def update_surfel_normals(
    smap: SurfelMap, cam: PinholeCamera, kstack: KeyframeStack,
    baseline_fx: float,
) -> SurfelMap:
    """Step (a): re-estimate active surfels' normals by averaging."""

    def body(carry, kf):
        nsum, cnt = carry
        (d, fx_, fy_, q, t, m) = kf
        _, a = _assoc(smap, cam, q, t, d, fx_, fy_, baseline_fx)
        hit = a.valid & m
        mnx = gather_nearest(fx_, a.px, a.py)
        mny = gather_nearest(fy_, a.px, a.py)
        mnz = normal_z(mnx, mny)
        R = se3.quat_to_matrix(q)  # global_R_frame
        gn = rotate3(R, jnp.stack([mnx, mny, mnz], axis=-1))
        nsum = nsum + jnp.where(hit[:, None], gn, 0.0)
        cnt = cnt + hit.astype(jnp.int32)
        return (nsum, cnt), None

    n = smap.capacity
    (nsum, cnt), _ = jax.lax.scan(
        body,
        (jnp.zeros((n, 3), smap.normal.dtype), jnp.zeros((n,), jnp.int32)),
        (kstack.depth, kstack.nx, kstack.ny, kstack.q, kstack.t, kstack.mask),
    )
    norm = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    new_normal = jnp.where(
        (cnt >= 1)[:, None] & (norm > 1e-12),
        nsum / jnp.maximum(norm, 1e-12),
        smap.normal,
    )
    return smap._replace(normal=new_normal)


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "use_depth", "use_descriptor"),
)
def optimize_geometry_iteration(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    baseline_fx: float = 40.0,
    use_depth: bool = True,
    use_descriptor: bool = True,
) -> SurfelMap:
    """One full geometry step: normals then position(+descriptors)."""
    smap = update_surfel_normals(smap, cam, kstack, baseline_fx)
    n = smap.capacity
    dtype = smap.pos.dtype

    if not use_descriptor:
        # --- 1-D position along the normal from depth residuals only ---
        def body(carry, kf):
            Hacc, bacc = carry
            (d, fx_, fy_, inten, q, t, m) = kf
            _, a = _assoc(smap, cam, q, t, d, fx_, fy_, baseline_fx)
            hit = a.valid & m
            inv_stddev = 1.0 / jnp.maximum(a.stddev, 1e-30)
            un_x = cam.fx_inv * a.px.astype(dtype) + cam.cx_inv
            un_y = cam.fy_inv * a.py.astype(dtype) + cam.cy_inv
            r = inv_stddev * (
                a.nlx * (a.pixel_depth * un_x - a.lx)
                + a.nly * (a.pixel_depth * un_y - a.ly)
                + a.nlz * (a.pixel_depth - a.lz)
            )
            J = -inv_stddev
            w = jnp.where(hit, robust.depth_residual_weight(r), 0.0)
            Hacc = Hacc + w * J * J
            bacc = bacc + w * r * J
            return (Hacc, bacc), None

        (H, b), _ = jax.lax.scan(
            body,
            (jnp.zeros((n,), dtype), jnp.zeros((n,), dtype)),
            (kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
             kstack.q, kstack.t, kstack.mask),
        )
        upd = smap.valid & smap.active & (H > 1e-6)
        step = jnp.where(upd, -b / jnp.maximum(H, 1e-6), 0.0)
        new_pos = smap.pos + step[:, None] * smap.normal
        return smap._replace(pos=new_pos)

    # --- position + 2 descriptor components jointly (3x3 per surfel) ---
    def body(carry, kf):
        (H00, H01, H02, H11, H12, H22, b0, b1, b2) = carry
        (d, fx_, fy_, inten, q, t, m) = kf
        ftg, a = _assoc(smap, cam, q, t, d, fx_, fy_, baseline_fx)
        hit = a.valid & m

        if use_depth:
            inv_stddev = 1.0 / jnp.maximum(a.stddev, 1e-30)
            un_x = cam.fx_inv * a.px.astype(dtype) + cam.cx_inv
            un_y = cam.fy_inv * a.py.astype(dtype) + cam.cy_inv
            r = inv_stddev * (
                a.nlx * (a.pixel_depth * un_x - a.lx)
                + a.nly * (a.pixel_depth * un_y - a.ly)
                + a.nlz * (a.pixel_depth - a.lz)
            )
            Jd = -inv_stddev
            w = jnp.where(hit, robust.depth_residual_weight(r), 0.0)
            H00 = H00 + w * Jd * Jd
            b0 = b0 + w * r * Jd

        # Descriptor residuals at the tangent points.
        t1x, t1y, t2x, t2y, t_ok = tangent_projections(
            smap.pos, smap.normal, smap.radius2, ftg.q, ftg.t, cam
        )
        dhit = hit & t_ok
        ic, c_dx, c_dy = bilinear_and_gradient(inten, a.pxy_x, a.pxy_y)
        i1, t1_dx, t1_dy = bilinear_and_gradient(inten, t1x, t1y)
        i2, t2_dx, t2_dy = bilinear_and_gradient(inten, t2x, t2y)
        r1 = jnp.where(dhit, 180.0 * (i1 - ic) - smap.desc[:, 0], 0.0)
        r2 = jnp.where(dhit, 180.0 * (i2 - ic) - smap.desc[:, 1], 0.0)
        w1 = jnp.where(dhit, robust.descriptor_residual_weight(r1), 0.0)
        w2 = jnp.where(dhit, robust.descriptor_residual_weight(r2), 0.0)

        # d residual / d (position along normal), fx/fy folded into terms
        # (kernel_opt_geometry.cu:188-196).
        gx1 = 180.0 * (t1_dx - c_dx)
        gy1 = 180.0 * (t1_dy - c_dy)
        gx2 = 180.0 * (t2_dx - c_dx)
        gy2 = 180.0 * (t2_dy - c_dy)
        safe_z = jnp.where(dhit, a.lz, 1.0)
        term1 = -cam.fx * (a.nlx * a.lz - a.nlz * a.lx)
        term2 = -cam.fy * (a.nly * a.lz - a.nlz * a.ly)
        term3 = 1.0 / (safe_z * safe_z)
        jp1 = -(gx1 * term1 + gy1 * term2) * term3
        jp2 = -(gx2 * term1 + gy2 * term2) * term3
        jd = -1.0  # d residual / d descriptor

        H00 = H00 + w1 * jp1 * jp1 + w2 * jp2 * jp2
        H01 = H01 + w1 * jp1 * jd
        H02 = H02 + w2 * jp2 * jd
        H11 = H11 + w1 * jd * jd
        H22 = H22 + w2 * jd * jd
        b0 = b0 + w1 * r1 * jp1 + w2 * r2 * jp2
        b1 = b1 + w1 * r1 * jd
        b2 = b2 + w2 * r2 * jd
        return (H00, H01, H02, H11, H12, H22, b0, b1, b2), None

    z = jnp.zeros((n,), dtype)
    (H00, H01, H02, H11, H12, H22, b0, b1, b2), _ = jax.lax.scan(
        body, (z, z, z, z, z, z, z, z, z),
        (kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
         kstack.q, kstack.t, kstack.mask),
    )

    # Vectorized 3x3 Cholesky solve (kernel_opt_geometry.cu:273-340).
    eps = 1e-6
    H00 = H00 + eps
    H11 = H11 + eps
    H22 = H22 + eps
    L00 = jnp.sqrt(H00)
    L01 = H01 / L00
    L11 = jnp.sqrt(jnp.maximum(H11 - L01 * L01, 1e-12))
    L02 = H02 / L00
    L12 = (H12 - L02 * L01) / L11
    L22 = jnp.sqrt(jnp.maximum(H22 - L02 * L02 - L12 * L12, 1e-12))

    y0 = b0 / L00
    y1 = (b1 - L01 * y0) / L11
    y2 = (b2 - L02 * y0 - L12 * y1) / L22
    x2 = y2 / L22
    x1 = (y1 - L12 * x2) / L11
    x0 = (y0 - L02 * x2 - L01 * x1) / L00

    upd = smap.valid & smap.active
    fin = jnp.isfinite(x0) & jnp.isfinite(x1) & jnp.isfinite(x2)
    x0 = jnp.where(upd & fin, x0, 0.0)
    x1 = jnp.where(upd & fin, x1, 0.0)
    x2 = jnp.where(upd & fin, x2, 0.0)

    new_pos = smap.pos - x0[:, None] * smap.normal
    new_desc = jnp.clip(
        smap.desc - jnp.stack([x1, x2], axis=-1), -180.0, 180.0
    )
    return smap._replace(pos=new_pos, desc=new_desc)
