"""Intrinsics + depth-deformation self-calibration (Schur complement).

TPU rebuild of OptimizeIntrinsicsCUDA
(/root/reference/applications/badslam/src/badslam/kernel_opt_intrinsics.cu,
kernel_opt_intrinsics.cc:39-281). Unknowns:

  depth:  x1 = [fx_inv, fy_inv, cx_inv, cy_inv, a]  (5 global) and
          x2 = cfactor per sparsification cell (arrow-head structure), where
          calibrated depth d_cal = 1 / (1/d_raw + cfactor * exp(-a / d_raw))
          (util.cuh:62-79). Solved by the Schur complement over x2.
  color:  [fx, fy, cx, cy] of the descriptor-sampling camera, plain 4x4 GN
          over the photometric residuals.

Jacobians (derived from the geometric residual
r = s * n_l . (d_cal * (nx, ny, 1) - p_l), s = 1/sigma):
  dr/dcx_inv = s * d_cal * n_l.x          dr/dfx_inv = px * dr/dcx_inv
  dr/dcy_inv = s * d_cal * n_l.y          dr/dfy_inv = py * dr/dcy_inv
  dr/da      = +jac_base * cfactor * (1/d_raw)
  dr/dcf     = -jac_base,   jac_base = s * (n_l.(nx,ny,1)) * e / ci^2,
  with e = exp(-a/d_raw), ci = 1/d_raw + cfactor*e.

TPU redesign vs the reference: one jitted lax.scan over the stacked
keyframe axis with deterministic segment (scatter-add) reductions per cell
instead of one kernel launch per keyframe with CUB block reductions +
atomics; the Schur reduction B^T D^{-1} B is one [5,C]x[C,5] matmul on the
MXU instead of a per-cell atomic pass. Only the 5x5 solve goes to the host
(float64, as the reference found necessary, kernel_opt_intrinsics.cc:168).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.mapping.association import (
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import KeyframeStack
from badslam_tpu.mapping.surfels import SurfelMap
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear_and_gradient, gather_nearest
from badslam_tpu.ops.preprocess import (
    apply_depth_deformation,
    compute_normals,
    compute_radii_and_remove_isolated,
)

A_PRIOR_WEIGHT = 10.0  # weak zero-prior on `a` (kernel_opt_intrinsics.cc:154)


class DepthParams(NamedTuple):
    """Depth-deformation state (DepthParameters analog)."""

    a: jax.Array        # [] f32 global deformation parameter
    cfactor: jax.Array  # [Hc, Wc] f32 per-sparsification-cell factors


def cfactor_shape(height: int, width: int, cell_size: int) -> Tuple[int, int]:
    """ceil-div grid, matching (w-1)/cell+1 (kernel_opt_intrinsics.cc:64)."""
    return ((height - 1) // cell_size + 1, (width - 1) // cell_size + 1)


def empty_depth_params(height: int, width: int, cell_size: int) -> DepthParams:
    hc, wc = cfactor_shape(height, width, cell_size)
    return DepthParams(
        a=jnp.zeros((), jnp.float32), cfactor=jnp.zeros((hc, wc), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("cell_size",))
def recalibrate_planes(
    cam: PinholeCamera,
    raw_depth: jax.Array,  # [K, H, W] pre-deformation metric depth
    a,
    cfactor: Optional[jax.Array],
    cell_size: int = 4,
):
    """Batched re-derivation of (depth, nx, ny, radius2) from raw depth."""

    def one(raw):
        cal = apply_depth_deformation(raw, a, cfactor, cell_size)
        d1, nx, ny = compute_normals(cam, cal)
        d2, r2 = compute_radii_and_remove_isolated(cam, d1)
        keep = d2 > 0
        return d2, jnp.where(keep, nx, 0.0), jnp.where(keep, ny, 0.0), r2

    return jax.vmap(one)(raw_depth)


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "cell_size", "optimize_depth",
                     "optimize_color"),
)
def accumulate_intrinsics_coeffs(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    raw_depth: jax.Array,     # [K, H, W] aligned with kstack
    params: DepthParams,
    baseline_fx: float,
    cell_size: int,
    optimize_depth: bool = True,
    optimize_color: bool = True,
):
    """Accumulate the arrow-head GN system over all keyframes and surfels.

    Returns dict with depth system (A [5,5], b1 [5], B [C,5], D [C], b2 [C],
    obs [C]) and/or color system (H [4,4], b [4]).
    """
    k, h, w = kstack.depth.shape
    hc, wc = params.cfactor.shape
    num_cells = hc * wc
    dtype = smap.pos.dtype

    def body(carry, kf):
        (d, f_nx, f_ny, inten, raw, q, t, m) = kf
        ftg = se3.inverse(se3.SE3(q, t))
        assoc = associate_surfels_with_frame(
            cam, smap.pos, smap.normal, smap.valid, ftg.q, ftg.t,
            d, f_nx, f_ny, baseline_fx,
        )
        ok = assoc.valid & m
        inv_stddev = 1.0 / jnp.maximum(assoc.stddev, 1e-30)
        un_x = cam.fx_inv * assoc.px.astype(dtype) + cam.cx_inv
        un_y = cam.fy_inv * assoc.py.astype(dtype) + cam.cy_inv
        d_cal = assoc.pixel_depth

        out = carry
        if optimize_depth:
            (A, b1, B, D, b2, obs) = carry[0]
            cell = jnp.where(
                ok,
                (assoc.py // cell_size) * wc + (assoc.px // cell_size),
                0,
            )
            raw_d = gather_nearest(raw, assoc.px, assoc.py)
            raw_inv = 1.0 / jnp.maximum(raw_d, 1e-12)
            cf = params.cfactor.reshape(-1)[cell]
            e = jnp.exp(-params.a * raw_inv)
            ci = raw_inv + cf * e
            okd = ok & (raw_d > 0) & (jnp.abs(ci) > 1e-4)

            dot = assoc.nlx * un_x + assoc.nly * un_y + assoc.nlz
            jac_base = inv_stddev * dot * e / (ci * ci)

            j_cx = inv_stddev * d_cal * assoc.nlx
            j_cy = inv_stddev * d_cal * assoc.nly
            J = jnp.stack(
                [
                    assoc.px.astype(dtype) * j_cx,
                    assoc.py.astype(dtype) * j_cy,
                    j_cx,
                    j_cy,
                    cf * raw_inv * jac_base,
                ],
                axis=-1,
            )  # [N, 5]
            j_cf = -jac_base

            r = inv_stddev * (
                assoc.nlx * (d_cal * un_x - assoc.lx)
                + assoc.nly * (d_cal * un_y - assoc.ly)
                + assoc.nlz * (d_cal - assoc.lz)
            )
            wgt = jnp.where(okd, robust.depth_residual_weight(r), 0.0)

            wJ = J * wgt[:, None]
            A = A + jnp.einsum(
                "ni,nj->ij", wJ, J, preferred_element_type=jnp.float32
            )
            b1 = b1 + jnp.einsum("ni,n->i", wJ, r)
            B = B.at[cell].add(wJ * j_cf[:, None])
            D = D.at[cell].add(wgt * j_cf * j_cf)
            b2 = b2.at[cell].add(wgt * r * j_cf)
            obs = obs.at[cell].add(okd.astype(jnp.int32))
            out = ((A, b1, B, D, b2, obs), out[1])

        if optimize_color:
            (Hc_, bc_) = carry[1]
            t1x, t1y, t2x, t2y, t_ok = tangent_projections(
                smap.pos, smap.normal, smap.radius2, ftg.q, ftg.t, cam
            )
            okc = ok & t_ok
            c_x = assoc.pxy_x
            c_y = assoc.pxy_y
            ic, c_dx, c_dy = bilinear_and_gradient(inten, c_x, c_y)
            i1, t1_dx, t1_dy = bilinear_and_gradient(inten, t1x, t1y)
            i2, t2_dx, t2_dy = bilinear_and_gradient(inten, t2x, t2y)
            r1 = 180.0 * (i1 - ic) - smap.desc[:, 0]
            r2 = 180.0 * (i2 - ic) - smap.desc[:, 1]
            w1 = jnp.where(okc, robust.descriptor_residual_weight(r1), 0.0)
            w2 = jnp.where(okc, robust.descriptor_residual_weight(r2), 0.0)

            def accum(Hc_, bc_, gx, gy, r, wgt):
                Jc = jnp.stack([gx * un_x, gy * un_y, gx, gy], axis=-1)
                wJ = Jc * wgt[:, None]
                Hc_ = Hc_ + jnp.einsum(
                    "ni,nj->ij", wJ, Jc, preferred_element_type=jnp.float32
                )
                bc_ = bc_ + jnp.einsum("ni,n->i", wJ, r)
                return Hc_, bc_

            Hc_, bc_ = accum(Hc_, bc_, 180.0 * (t1_dx - c_dx),
                             180.0 * (t1_dy - c_dy), r1, w1)
            Hc_, bc_ = accum(Hc_, bc_, 180.0 * (t2_dx - c_dx),
                             180.0 * (t2_dy - c_dy), r2, w2)
            out = (out[0], (Hc_, bc_))

        return out, None

    depth_init = (
        jnp.zeros((5, 5), jnp.float32),
        jnp.zeros((5,), jnp.float32),
        jnp.zeros((num_cells, 5), jnp.float32),
        jnp.zeros((num_cells,), jnp.float32),
        jnp.zeros((num_cells,), jnp.float32),
        jnp.zeros((num_cells,), jnp.int32),
    )
    color_init = (jnp.zeros((4, 4), jnp.float32), jnp.zeros((4,), jnp.float32))

    (depth_sys, color_sys), _ = jax.lax.scan(
        body,
        (depth_init, color_init),
        (kstack.depth, kstack.nx, kstack.ny, kstack.intensity, raw_depth,
         kstack.q, kstack.t, kstack.mask),
    )
    return depth_sys, color_sys


@jax.jit
def schur_reduce(depth_sys):
    """(A, b1, ...) -> Schur-reduced (A', b1') plus backsub precomputations."""
    A, b1, B, D, b2, obs = depth_sys
    good = D > 1e-12
    D_inv = jnp.where(good, 1.0 / jnp.maximum(D, 1e-30), 0.0)
    DiB = B * D_inv[:, None]               # D^{-1} B     [C, 5]
    A_r = A - jnp.einsum(
        "ci,cj->ij", DiB, B, preferred_element_type=jnp.float32
    )
    Dib2 = D_inv * b2                      # D^{-1} b2    [C]
    b1_r = b1 - jnp.einsum("ci,c->i", B, Dib2)
    return A_r, b1_r, DiB, Dib2, good, obs


def solve_depth_intrinsics(A_r, b1_r, a) -> np.ndarray:
    """Host float64 5x5 solve with the weak a-prior (must be f64:
    kernel_opt_intrinsics.cc:166-168)."""
    A = np.asarray(A_r, np.float64)
    b = np.asarray(b1_r, np.float64)
    A[4, 4] += A_PRIOR_WEIGHT * A_PRIOR_WEIGHT
    b[4] += A_PRIOR_WEIGHT * A_PRIOR_WEIGHT * float(a)
    try:
        return np.linalg.solve(A, b).astype(np.float32)
    except np.linalg.LinAlgError:
        return np.zeros(5, np.float32)


@jax.jit
def backsubstitute_cfactor(params: DepthParams, x1, DiB, Dib2, good, obs):
    """x2 = D^{-1} b2 - D^{-1} B x1; cfactor -= x2; unobserved cells -> 0."""
    x1 = jnp.asarray(x1, jnp.float32)
    offset = jnp.where(good, Dib2 - DiB @ x1, 0.0)
    cf = params.cfactor.reshape(-1) - offset
    cf = jnp.where(obs > 0, cf, 0.0)
    return DepthParams(
        a=params.a - x1[4], cfactor=cf.reshape(params.cfactor.shape)
    )


def updated_depth_camera(cam: PinholeCamera, x1) -> PinholeCamera:
    """Apply the inverse-parametrization update and convert back to
    corner-convention fx..cy (kernel_opt_intrinsics.cc:184-196)."""
    fx_inv = float(cam.fx_inv) - float(x1[0])
    fy_inv = float(cam.fy_inv) - float(x1[1])
    cx_inv = float(cam.cx_inv) - float(x1[2])
    cy_inv = float(cam.cy_inv) - float(x1[3])
    fx = 1.0 / fx_inv
    fy = 1.0 / fy_inv
    return cam.with_intrinsics(
        fx=fx, fy=fy, cx=-(fx * cx_inv) + 0.5, cy=-(fy * cy_inv) + 0.5
    )


def _color_to_inverse_param_T(cam: PinholeCamera) -> np.ndarray:
    """Constant chain-rule matrix T = d[fx,fy,cx,cy]/d[fx_inv,..,cy_inv,a].

    With fx = 1/fx_inv and cx = -(fx*cx_inv) + 0.5 (see updated_depth_camera),
    the photometric 4x4 system (parametrized by fx..cy) folds EXACTLY into
    the depth 5x5 system (parametrized by the inverse intrinsics) as
    A += T^T H T, b += T^T b_c — the parametrization change is linear and
    identical for every observation.
    """
    fx, fy = float(cam.fx), float(cam.fy)
    cx_inv, cy_inv = float(cam.cx_inv), float(cam.cy_inv)
    T = np.zeros((4, 5), np.float64)
    T[0, 0] = -fx * fx
    T[1, 1] = -fy * fy
    T[2, 0] = cx_inv * fx * fx
    T[2, 2] = -fx
    T[3, 1] = cy_inv * fy * fy
    T[3, 3] = -fy
    return T


def solve_color_intrinsics(color_sys) -> np.ndarray:
    H, b = color_sys
    H = np.asarray(H, np.float64)
    b = np.asarray(b, np.float64)
    try:
        return np.linalg.solve(H, b).astype(np.float32)
    except np.linalg.LinAlgError:
        return np.zeros(4, np.float32)


def updated_color_camera(cam: PinholeCamera, x) -> PinholeCamera:
    return cam.with_intrinsics(
        fx=float(cam.fx) - float(x[0]),
        fy=float(cam.fy) - float(x[1]),
        cx=float(cam.cx) - float(x[2]),
        cy=float(cam.cy) - float(x[3]),
    )


def optimize_intrinsics(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    raw_depth: jax.Array,
    params: DepthParams,
    baseline_fx: float,
    cell_size: int,
    optimize_depth: bool = True,
    optimize_color: bool = False,
):
    """One full intrinsics GN step. Returns (new_cam, new_params).

    `optimize_color` here refines the same (shared) camera from photometric
    residuals — this rebuild resamples color into depth-camera geometry at
    preprocessing, so the reference's separate color camera collapses onto
    the depth camera by construction.
    """
    depth_sys, color_sys = accumulate_intrinsics_coeffs(
        smap, cam, kstack, raw_depth, params, baseline_fx, cell_size,
        optimize_depth=optimize_depth, optimize_color=optimize_color,
    )
    new_cam = cam
    if optimize_depth:
        A_r, b1_r, DiB, Dib2, good, obs = schur_reduce(depth_sys)
        if optimize_color:
            # Joint solve: fold the photometric 4x4 system into the Schur-
            # reduced 5x5 depth system through the exact (linear) change of
            # parametrization. One update, no double-correction of the
            # shared camera. The reference keeps two separate cameras and
            # solves two systems (kernel_opt_intrinsics.cc:256-280); this
            # rebuild resamples color into depth geometry at preprocessing,
            # so both residual families constrain the SAME intrinsics.
            T = _color_to_inverse_param_T(cam)
            Hc = np.asarray(color_sys[0], np.float64)
            bc = np.asarray(color_sys[1], np.float64)
            A_r = np.asarray(A_r, np.float64) + T.T @ Hc @ T
            b1_r = np.asarray(b1_r, np.float64) + T.T @ bc
        x1 = solve_depth_intrinsics(A_r, b1_r, params.a)
        if np.all(np.isfinite(x1)):
            params = backsubstitute_cfactor(params, x1, DiB, Dib2, good, obs)
            new_cam = updated_depth_camera(new_cam, x1)
    elif optimize_color:
        x = solve_color_intrinsics(color_sys)
        if np.all(np.isfinite(x)):
            new_cam = updated_color_camera(new_cam, x)
    return new_cam, params
