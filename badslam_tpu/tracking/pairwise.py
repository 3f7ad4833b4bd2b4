"""Direct multi-resolution frame-to-frame tracking (odometry core).

TPU-native rebuild of the reference's pairwise tracker
(/root/reference/applications/badslam/src/badslam/pairwise_frame_tracking.cc:153-676
plus the GradientXY image-tracking kernel in kernel_opt_pose.cu:422-660):
point-to-plane depth residuals and 2-component intensity-gradient descriptor
residuals between a base frame and a tracked frame, coarse-to-fine
Gauss-Newton over an image pyramid.

TPU redesign vs the reference:
  * The ENTIRE multi-scale optimization — pyramid loop, per-scale
    initial-estimate duels, <=`max_iterations` GN iterations each with a
    6x6 solve — runs inside one jitted program. The reference instead
    downloads 27 floats and solves on the CPU every iteration
    (pairwise_frame_tracking.cc:524-561), costing a device sync per
    iteration; that pattern would be fatal with TPU dispatch latencies.
  * H/b accumulation is a single deterministic [P, 8]^T [P, 8] reduction
    feeding the MXU, replacing CUB block reductions + atomics.
  * Early exit uses the converged flag in a lax.while_loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry.linalg import solve_psd
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear_and_gradient, gather_nearest
from badslam_tpu.ops.preprocess import normal_z, shift2d
from badslam_tpu.ops.pyramid import FramePyramidLevel

# Convergence thresholds (convergence_analysis.h:45-63).
_SCALE_N_TRANS_THR = 1e-8
_SCALE_N_ROT_THR = 1e-8


class TrackingResult(NamedTuple):
    q: jax.Array  # base_T_frame quaternion (wxyz)
    t: jax.Array  # base_T_frame translation
    cost: jax.Array  # final-scale cost (diagnostic)
    residual_count: jax.Array
    # Divergence diagnostics (device values; the reference logs
    # non-convergence counters, direct_ba_alternating.cc:246-250 and
    # pairwise_frame_tracking.cc:649-669):
    converged: jax.Array  # bool — finest level hit its convergence test


def _transform_planes(R: jax.Array, t: jax.Array, x, y, z):
    """Apply [3,3] rotation + translation to plane triplets."""
    ox = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    oy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    oz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    return ox, oy, oz


def _rotate_planes(R: jax.Array, x, y, z):
    ox = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
    oy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
    oz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
    return ox, oy, oz


def _image_residuals(
    cam: PinholeCamera,
    base: FramePyramidLevel,
    tracked: FramePyramidLevel,
    frame_q: jax.Array,
    frame_t: jax.Array,
    threshold_factor: float | jax.Array,
    baseline_fx: float,
    use_depth: bool,
    use_descriptor: bool,
    with_jacobians: bool,
    use_gradmag: bool = False,
):
    """Shared residual/Jacobian evaluation over all base-frame pixels.

    `frame_q/t` is frame_T_base (the inverse of the estimate being tracked).
    Returns a dict with masks, residuals, weights and (optionally) Jacobian
    plane-stacks for each enabled residual type.
    """
    h, w = base.depth.shape
    dtype = base.depth.dtype
    R = se3.quat_to_matrix(frame_q)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)

    d_b = base.depth
    valid = d_b > 0

    # Unproject base pixels (pixel-center convention).
    nxs = cam.fx_inv * xs + cam.cx_inv
    nys = cam.fy_inv * ys + cam.cy_inv
    pbx = d_b * nxs
    pby = d_b * nys
    pbz = d_b

    # Into the tracked frame.
    ltx, lty, ltz = _transform_planes(R, frame_t, pbx, pby, pbz)
    valid &= ltz > 0

    # Project (corner convention), floor to pixel indices, bounds test.
    safe_z = jnp.where(valid, ltz, 1.0)
    pxy_x = cam.fx * ltx / safe_z + cam.cx
    pxy_y = cam.fy * lty / safe_z + cam.cy
    px = jnp.floor(pxy_x).astype(jnp.int32)
    py = jnp.floor(pxy_y).astype(jnp.int32)
    valid &= (pxy_x >= 0) & (pxy_y >= 0) & (px < w) & (py < h) & (px >= 0) & (py >= 0)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)

    # Tracked-frame measurements at the projected pixel.
    d_t = gather_nearest(tracked.depth, pxc, pyc)
    valid &= d_t > 0

    # Base normal rotated into the tracked frame.
    nbz = normal_z(base.nx, base.ny)
    nlx, nly, nlz = _rotate_planes(R, base.nx, base.ny, nbz)

    # Association test (surfel_projection_nvcc_only.cuh:133-230).
    un_x = cam.fx_inv * pxc.astype(dtype) + cam.cx_inv
    un_y = cam.fy_inv * pyc.astype(dtype) + cam.cy_inv
    stddev = (
        robust.DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
        * jnp.abs(nlx * un_x + nly * un_y + nlz)
        * (d_t * d_t)
    ) / baseline_fx
    depth_tukey_param = threshold_factor * robust.DEPTH_TUKEY_PARAM
    valid &= jnp.abs(ltz - d_t) <= depth_tukey_param * stddev
    # Surfel must face the camera.
    valid &= (ltx * nlx + lty * nly + ltz * nlz) <= 0
    # Normal compatibility with the measurement.
    ntz = normal_z(
        gather_nearest(tracked.nx, pxc, pyc), gather_nearest(tracked.ny, pxc, pyc)
    )
    ntx = gather_nearest(tracked.nx, pxc, pyc)
    nty = gather_nearest(tracked.ny, pxc, pyc)
    valid &= (
        nlx * ntx + nly * nty + nlz * ntz
    ) >= robust.COS_NORMAL_COMPATIBILITY_THRESHOLD

    out = {"h": h, "w": w}

    if use_depth:
        inv_stddev = 1.0 / jnp.maximum(stddev, 1e-30)
        # local_unproj: tracked pixel unprojected with measured depth.
        ux = d_t * un_x
        uy = d_t * un_y
        uz = d_t
        r_d = inv_stddev * (nlx * (ux - ltx) + nly * (uy - lty) + nlz * (uz - ltz))
        r_d = jnp.where(valid, r_d, 0.0)
        out["depth_residual"] = r_d
        out["depth_weight"] = jnp.where(
            valid, robust.depth_residual_weight(r_d, threshold_factor), 0.0
        )
        if with_jacobians:
            out["depth_jacobian"] = [
                inv_stddev * nlx,
                inv_stddev * nly,
                inv_stddev * nlz,
                inv_stddev * (-nly * uz + nlz * uy),
                inv_stddev * (nlx * uz - nlz * ux),
                inv_stddev * (-nlx * uy + nly * ux),
            ]

    if use_descriptor:
        desc_valid = valid
        # Descriptors computable only where right/down neighbors exist.
        desc_valid &= (xs < w - 1) & (ys < h - 1)
        i_c = base.intensity
        i_r = shift2d(base.intensity, 0, 1)
        i_dn = shift2d(base.intensity, 1, 0)
        desc1 = 180.0 * (i_r - i_c)
        desc2 = 180.0 * (i_dn - i_c)

        # Plane through the base point with the base normal: estimate the
        # depths of the +x / +y neighbor pixels on that plane.
        plane_d = (nxs * d_b) * base.nx + (nys * d_b) * base.ny + d_b * nbz
        nxs_r = cam.fx_inv * (xs + 1.0) + cam.cx_inv
        nys_d = cam.fy_inv * (ys + 1.0) + cam.cy_inv
        denom1 = nxs_r * base.nx + nys * base.ny + nbz
        denom2 = nxs * base.nx + nys_d * base.ny + nbz
        desc_valid &= (jnp.abs(denom1) > 1e-12) & (jnp.abs(denom2) > 1e-12)
        t1_depth = plane_d / jnp.where(jnp.abs(denom1) > 1e-12, denom1, 1.0)
        t2_depth = plane_d / jnp.where(jnp.abs(denom2) > 1e-12, denom2, 1.0)

        t1x, t1y, t1z = _transform_planes(
            R, frame_t, t1_depth * nxs_r, t1_depth * nys, t1_depth
        )
        t2x, t2y, t2z = _transform_planes(
            R, frame_t, t2_depth * nxs, t2_depth * nys_d, t2_depth
        )
        desc_valid &= (t1z > 0) & (t2z > 0)
        s1 = jnp.where(t1z > 0, t1z, 1.0)
        s2 = jnp.where(t2z > 0, t2z, 1.0)
        t1_px = cam.fx * t1x / s1 + cam.cx
        t1_py = cam.fy * t1y / s1 + cam.cy
        t2_px = cam.fx * t2x / s2 + cam.cx
        t2_py = cam.fy * t2y / s2 + cam.cy
        desc_valid &= (
            (t1_px >= 0) & (t1_py >= 0)
            & (jnp.floor(t1_px) < w) & (jnp.floor(t1_py) < h)
            & (t2_px >= 0) & (t2_py >= 0)
            & (jnp.floor(t2_px) < w) & (jnp.floor(t2_py) < h)
        )

        ic_t, c_dx, c_dy = bilinear_and_gradient(tracked.intensity, pxy_x, pxy_y)
        i1_t, t1_dx, t1_dy = bilinear_and_gradient(tracked.intensity, t1_px, t1_py)
        i2_t, t2_dx, t2_dy = bilinear_and_gradient(tracked.intensity, t2_px, t2_py)

        r1 = 180.0 * (i1_t - ic_t) - desc1
        r2 = 180.0 * (i2_t - ic_t) - desc2
        r1 = jnp.where(desc_valid, r1, 0.0)
        r2 = jnp.where(desc_valid, r2, 0.0)
        out["desc_valid"] = desc_valid
        out["desc_residual_1"] = r1
        out["desc_residual_2"] = r2
        out["desc_weight_1"] = jnp.where(
            desc_valid, robust.descriptor_residual_weight(r1, threshold_factor), 0.0
        )
        out["desc_weight_2"] = jnp.where(
            desc_valid, robust.descriptor_residual_weight(r2, threshold_factor), 0.0
        )
        if with_jacobians:
            gx1 = 180.0 * (t1_dx - c_dx) * cam.fx
            gy1 = 180.0 * (t1_dy - c_dy) * cam.fy
            gx2 = 180.0 * (t2_dx - c_dx) * cam.fx
            gy2 = 180.0 * (t2_dy - c_dy) * cam.fy
            inv_z = 1.0 / jnp.where(valid, ltz, 1.0)
            inv_z_sq = inv_z * inv_z
            z_sq = ltz * ltz
            xy = ltx * lty

            def desc_jac(gx, gy):
                return [
                    -gx * inv_z,
                    -gy * inv_z,
                    (ltx * gx + lty * gy) * inv_z_sq,
                    ((lty * lty + z_sq) * gy + xy * gx) * inv_z_sq,
                    -((ltx * ltx + z_sq) * gx + xy * gy) * inv_z_sq,
                    -(ltx * gy - lty * gx) * inv_z,
                ]

            out["desc_jacobian_1"] = desc_jac(gx1, gy1)
            out["desc_jacobian_2"] = desc_jac(gx2, gy2)

        # The reference invalidates the whole pixel (depth residual too) if
        # descriptor computation fails (kernel_opt_pose.cu:503-570 sets
        # visible=false). Reproduce that coupling.
        valid = desc_valid
        if use_depth:
            out["depth_residual"] = jnp.where(valid, out["depth_residual"], 0.0)
            out["depth_weight"] = jnp.where(valid, out["depth_weight"], 0.0)
        out["desc_residual_1"] = jnp.where(valid, out["desc_residual_1"], 0.0)
        out["desc_residual_2"] = jnp.where(valid, out["desc_residual_2"], 0.0)
        out["desc_weight_1"] = jnp.where(valid, out["desc_weight_1"], 0.0)
        out["desc_weight_2"] = jnp.where(valid, out["desc_weight_2"], 0.0)

    if use_gradmag:
        # Gradient-magnitude color residual (cost_function.cuh:322-352):
        # pyramids must carry gradmag planes in `intensity`. One residual
        # per pixel: 255 * I_t(projected) - 255 * I_b(pixel).
        gm_t, g_dx, g_dy = bilinear_and_gradient(
            tracked.intensity, pxy_x, pxy_y)
        r_g = jnp.where(valid, 255.0 * gm_t - 255.0 * base.intensity, 0.0)
        out["gradmag_residual"] = r_g
        out["gradmag_weight"] = jnp.where(
            valid, robust.descriptor_residual_weight(r_g, threshold_factor),
            0.0,
        )
        if with_jacobians:
            gx = 255.0 * g_dx * cam.fx
            gy = 255.0 * g_dy * cam.fy
            inv_z = 1.0 / jnp.where(valid, ltz, 1.0)
            inv_z_sq = inv_z * inv_z
            z_sq = ltz * ltz
            xy = ltx * lty
            out["gradmag_jacobian"] = [
                -gx * inv_z,
                -gy * inv_z,
                (ltx * gx + lty * gy) * inv_z_sq,
                ((lty * lty + z_sq) * gy + xy * gx) * inv_z_sq,
                -((ltx * ltx + z_sq) * gx + xy * gy) * inv_z_sq,
                -(ltx * gy - lty * gx) * inv_z,
            ]

    out["valid"] = valid
    return out


def _accumulate_h_b(res, use_depth: bool, use_descriptor: bool,
                    use_gradmag: bool = False):
    """Stack residual terms into one [P, 8] matrix and reduce (MXU path).

    Column layout: [J0..J5, r, 0]; H = M[:6,:6], b = M[:6,6] of
    M = (w*A)^T A summed over residual types.
    """
    terms = []
    if use_depth:
        terms.append((res["depth_jacobian"], res["depth_residual"], res["depth_weight"]))
    if use_descriptor:
        terms.append((res["desc_jacobian_1"], res["desc_residual_1"], res["desc_weight_1"]))
        terms.append((res["desc_jacobian_2"], res["desc_residual_2"], res["desc_weight_2"]))
    if use_gradmag:
        terms.append((res["gradmag_jacobian"], res["gradmag_residual"],
                      res["gradmag_weight"]))

    H = jnp.zeros((6, 6), jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    for jac, r, wt in terms:
        A = jnp.stack(jac + [r], axis=-1).reshape(-1, 7).astype(jnp.float32)
        wA = A * wt.reshape(-1, 1).astype(jnp.float32)
        M = jnp.einsum(
            "pi,pj->ij", wA, A,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        H = H + M[:6, :6]
        b = b + M[:6, 6]
    return H, b


def _cost_and_count(res, threshold_factor, use_depth: bool,
                    use_descriptor: bool, use_gradmag: bool = False):
    """Total robust cost + residual count (the duel heuristic inputs).

    Matches ComputeCostAndResidualCountFromImagesCUDA semantics:
    weighted (robustified) residuals summed over all active terms.
    """
    cost = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.int32)
    valid = res["valid"]
    if use_depth:
        cost += jnp.sum(
            jnp.where(
                valid,
                robust.weighted_depth_residual(res["depth_residual"], threshold_factor),
                0.0,
            )
        )
        count += jnp.sum(valid.astype(jnp.int32))
    if use_descriptor:
        cost += jnp.sum(
            jnp.where(
                valid,
                robust.weighted_descriptor_residual(
                    res["desc_residual_1"], threshold_factor
                )
                + robust.weighted_descriptor_residual(
                    res["desc_residual_2"], threshold_factor
                ),
                0.0,
            )
        )
        if not use_depth:
            count += jnp.sum(valid.astype(jnp.int32))
    if use_gradmag:
        cost += jnp.sum(jnp.where(
            valid,
            robust.weighted_descriptor_residual(
                res["gradmag_residual"], threshold_factor),
            0.0,
        ))
        if not use_depth:
            count += jnp.sum(valid.astype(jnp.int32))
    return cost, count


def accumulate_pose_coeffs(
    cam: PinholeCamera,
    base: FramePyramidLevel,
    tracked: FramePyramidLevel,
    base_T_frame_q: jax.Array,
    base_T_frame_t: jax.Array,
    threshold_factor,
    baseline_fx: float,
    use_depth: bool = True,
    use_descriptor: bool = True,
    use_gradmag: bool = False,
):
    """One GN accumulation: returns (H[6,6], b[6], count). Public for tests."""
    frame_T_base = se3.inverse(se3.SE3(base_T_frame_q, base_T_frame_t))
    res = _image_residuals(
        cam, base, tracked, frame_T_base.q, frame_T_base.t,
        threshold_factor, baseline_fx, use_depth, use_descriptor, True,
        use_gradmag,
    )
    H, b = _accumulate_h_b(res, use_depth, use_descriptor, use_gradmag)
    return H, b, jnp.sum(res["valid"].astype(jnp.int32))


def compute_cost_and_count(
    cam, base, tracked, base_T_frame_q, base_T_frame_t,
    threshold_factor, baseline_fx, use_depth=True, use_descriptor=True,
    use_gradmag=False,
):
    frame_T_base = se3.inverse(se3.SE3(base_T_frame_q, base_T_frame_t))
    res = _image_residuals(
        cam, base, tracked, frame_T_base.q, frame_T_base.t,
        threshold_factor, baseline_fx, use_depth, use_descriptor, False,
        use_gradmag,
    )
    return _cost_and_count(res, threshold_factor, use_depth, use_descriptor,
                           use_gradmag)


def _is_converged(x: jax.Array, scaling_factor: float) -> jax.Array:
    """IsScaleNPoseEstimationConverged (convergence_analysis.h:56-63)."""
    scaled = x * jnp.array(
        [1.0, 1.0, 1.0] + [_SCALE_N_TRANS_THR / _SCALE_N_ROT_THR] * 3,
        dtype=x.dtype,
    )
    return jnp.sum(scaled * scaled) < (scaling_factor * scaling_factor * _SCALE_N_TRANS_THR)


def _gn_level(
    cam, base, tracked, q, t, scaling_factor, damping, baseline_fx,
    use_depth, use_descriptor, max_iterations, use_gradmag=False,
):
    """Gauss-Newton at one pyramid level, fully on-device with early exit.
    Returns (q, t, converged)."""
    threshold_factor = scaling_factor

    def cond(carry):
        _, _, it, conv = carry
        return (it < max_iterations) & jnp.logical_not(conv)

    def body(carry):
        q, t, it, _ = carry
        H, b, count = accumulate_pose_coeffs(
            cam, base, tracked, q, t, threshold_factor, baseline_fx,
            use_depth, use_descriptor, use_gradmag,
        )
        # Guard the solve: with no residuals, keep the pose.
        ok = count > 6
        Hs = jnp.where(ok, H, jnp.eye(6, dtype=H.dtype))
        x = solve_psd(Hs, b)
        x = jnp.where(ok & jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
        upd = se3.mul(se3.SE3(q, t), se3.exp(-damping * x))
        conv = _is_converged(x, scaling_factor)
        return upd.q, upd.t, it + 1, conv

    q, t, _, conv = jax.lax.while_loop(
        cond, body, (q, t, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    )
    return q, t, conv


def _duel(cam, base, tracked, qa, ta, qb, tb, threshold_factor, baseline_fx,
          use_depth, use_descriptor, use_gradmag=False):
    """Pick the better of two pose hypotheses (pairwise_frame_tracking.cc:479-500)."""
    cost_a, count_a = compute_cost_and_count(
        cam, base, tracked, qa, ta, threshold_factor, baseline_fx,
        use_depth, use_descriptor, use_gradmag)
    cost_b, count_b = compute_cost_and_count(
        cam, base, tracked, qb, tb, threshold_factor, baseline_fx,
        use_depth, use_descriptor, use_gradmag)
    pick_a = jnp.where(
        count_a > 2 * count_b,
        True,
        jnp.where(count_b > 2 * count_a, False, cost_a < cost_b),
    )
    q = jnp.where(pick_a, qa, qb)
    t = jnp.where(pick_a, ta, tb)
    return q, t


@functools.partial(
    jax.jit,
    static_argnames=(
        "baseline_fx", "use_depth", "use_descriptor", "use_gradmag",
        "test_two_initial_estimates", "max_iterations", "use_pyramid_level_0",
    ),
)
def track_frame_pairwise(
    cams: Tuple[PinholeCamera, ...],
    base_pyramid: Tuple[FramePyramidLevel, ...],
    tracked_pyramid: Tuple[FramePyramidLevel, ...],
    init1_q: jax.Array,
    init1_t: jax.Array,
    init2_q: jax.Array,
    init2_t: jax.Array,
    baseline_fx: float = 40.0,
    use_depth: bool = True,
    use_descriptor: bool = True,
    use_gradmag: bool = False,
    test_two_initial_estimates: bool = False,
    max_iterations: int = 30,
    use_pyramid_level_0: bool = True,
) -> TrackingResult:
    """Estimate base_T_frame aligning `tracked` to `base`, coarse-to-fine.

    `cams`/pyramids are finest-first tuples of static-shaped levels. The
    initial estimates are base_T_frame (e.g. from the constant-motion model);
    the second is only consulted when `test_two_initial_estimates`.
    """
    num_scales = len(cams)
    q, t = init1_q, init1_t
    chosen_q, chosen_t = init1_q, init1_t

    finest = 0 if use_pyramid_level_0 else 1
    for scale in range(num_scales - 1, finest - 1, -1):
        cam = cams[scale]
        base = base_pyramid[scale]
        tracked = tracked_pyramid[scale]
        scaling_factor = float(2 ** scale)
        if scale == num_scales - 1:
            damping = 0.25
        elif scale == num_scales - 2:
            damping = 0.5
        else:
            damping = 1.0

        if scale == num_scales - 1:
            if test_two_initial_estimates:
                q, t = _duel(
                    cam, base, tracked, init1_q, init1_t, init2_q, init2_t,
                    scaling_factor, baseline_fx, use_depth, use_descriptor,
                    use_gradmag,
                )
            chosen_q, chosen_t = q, t
        else:
            q, t = _duel(
                cam, base, tracked, q, t, chosen_q, chosen_t,
                scaling_factor, baseline_fx, use_depth, use_descriptor,
                use_gradmag,
            )

        q, t, converged = _gn_level(
            cam, base, tracked, q, t, scaling_factor, damping, baseline_fx,
            use_depth, use_descriptor, max_iterations, use_gradmag,
        )

    cost, count = compute_cost_and_count(
        cams[finest], base_pyramid[finest], tracked_pyramid[finest], q, t,
        float(2 ** finest), baseline_fx, use_depth, use_descriptor,
        use_gradmag,
    )
    return TrackingResult(q=q, t=t, cost=cost, residual_count=count,
                          converged=converged)
