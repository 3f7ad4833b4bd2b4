"""Per-keyframe pose optimization against the surfel map.

TPU rebuild of DirectBA::EstimateFramePose + the surfel-based pose cost
kernel (/root/reference/applications/badslam/src/badslam/
direct_ba_alternating.cc:42-283, kernel_opt_pose.cu:251-420): Gauss-Newton
on each keyframe's 6-DoF pose, with depth (point-to-plane, Tukey) and
descriptor (tangent-point intensity, Huber) residuals over all surfels.

TPU redesign: ALL keyframes are optimized inside one jitted program — a
lax.scan over the stacked keyframe axis whose body runs the full
<=max_iterations GN while_loop with an on-device 6x6 solve, instead of the
reference's per-keyframe host loop with a 27-float download + CPU LDLT per
iteration (a device sync per iteration per keyframe).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry.linalg import solve_psd
from badslam_tpu.mapping.association import (
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import KeyframeStack
from badslam_tpu.mapping.surfels import SurfelMap
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear_and_gradient

# Scale-1 convergence thresholds (convergence_analysis.h:45-52).
_TRANS_THR = 1e-6
_ROT_THR = 1e-7


def is_scale1_converged(x: jax.Array) -> jax.Array:
    scaled = x * jnp.array([1.0, 1.0, 1.0] + [_TRANS_THR / _ROT_THR] * 3, x.dtype)
    return jnp.sum(scaled * scaled) < _TRANS_THR


def surfel_pose_coeffs(
    smap: SurfelMap,
    cam: PinholeCamera,
    kf_q, kf_t,                      # global_T_frame estimate
    depth, f_nx, f_ny, intensity,    # keyframe planes
    baseline_fx: float,
    use_depth: bool,
    use_descriptor: bool,
):
    """One GN accumulation over all surfels. Returns (H[6,6], b[6], count)."""
    ftg = se3.inverse(se3.SE3(kf_q, kf_t))
    a = associate_surfels_with_frame(
        cam, smap.pos, smap.normal, smap.valid, ftg.q, ftg.t,
        depth, f_nx, f_ny, baseline_fx,
    )
    valid = a.valid
    dtype = smap.pos.dtype

    terms = []
    if use_depth:
        inv_stddev = 1.0 / jnp.maximum(a.stddev, 1e-30)
        un_x = cam.fx_inv * a.px.astype(dtype) + cam.cx_inv
        un_y = cam.fy_inv * a.py.astype(dtype) + cam.cy_inv
        ux = a.pixel_depth * un_x
        uy = a.pixel_depth * un_y
        uz = a.pixel_depth
        r_d = inv_stddev * (
            a.nlx * (ux - a.lx) + a.nly * (uy - a.ly) + a.nlz * (uz - a.lz)
        )
        r_d = jnp.where(valid, r_d, 0.0)
        w_d = jnp.where(valid, robust.depth_residual_weight(r_d), 0.0)
        jac = [
            inv_stddev * a.nlx,
            inv_stddev * a.nly,
            inv_stddev * a.nlz,
            inv_stddev * (-a.nly * uz + a.nlz * uy),
            inv_stddev * (a.nlx * uz - a.nlz * ux),
            inv_stddev * (-a.nlx * uy + a.nly * ux),
        ]
        terms.append((jac, r_d, w_d))

    if use_descriptor:
        t1x, t1y, t2x, t2y, t_ok = tangent_projections(
            smap.pos, smap.normal, smap.radius2, ftg.q, ftg.t, cam
        )
        dvalid = valid & t_ok
        ic, c_dx, c_dy = bilinear_and_gradient(intensity, a.pxy_x, a.pxy_y)
        i1, t1_dx, t1_dy = bilinear_and_gradient(intensity, t1x, t1y)
        i2, t2_dx, t2_dy = bilinear_and_gradient(intensity, t2x, t2y)
        r1 = jnp.where(dvalid, 180.0 * (i1 - ic) - smap.desc[:, 0], 0.0)
        r2 = jnp.where(dvalid, 180.0 * (i2 - ic) - smap.desc[:, 1], 0.0)
        w1 = jnp.where(dvalid, robust.descriptor_residual_weight(r1), 0.0)
        w2 = jnp.where(dvalid, robust.descriptor_residual_weight(r2), 0.0)

        inv_z = 1.0 / jnp.where(dvalid, a.lz, 1.0)
        inv_z_sq = inv_z * inv_z
        z_sq = a.lz * a.lz
        xy = a.lx * a.ly

        def desc_jac(gx_raw, gy_raw):
            gx = 180.0 * (gx_raw - c_dx) * cam.fx
            gy = 180.0 * (gy_raw - c_dy) * cam.fy
            return [
                -gx * inv_z,
                -gy * inv_z,
                (a.lx * gx + a.ly * gy) * inv_z_sq,
                ((a.ly * a.ly + z_sq) * gy + xy * gx) * inv_z_sq,
                -((a.lx * a.lx + z_sq) * gx + xy * gy) * inv_z_sq,
                -(a.lx * gy - a.ly * gx) * inv_z,
            ]

        terms.append((desc_jac(t1_dx, t1_dy), r1, w1))
        terms.append((desc_jac(t2_dx, t2_dy), r2, w2))

    H = jnp.zeros((6, 6), jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    for jac, r, wt in terms:
        A = jnp.stack(jac + [r], axis=-1).astype(jnp.float32)
        wA = A * wt[:, None].astype(jnp.float32)
        M = jnp.einsum(
            "pi,pj->ij", wA, A,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        H = H + M[:6, :6]
        b = b + M[:6, 6]
    return H, b, jnp.sum(valid.astype(jnp.int32))


def _estimate_one_pose(
    smap, cam, q0, t0, depth, f_nx, f_ny, intensity,
    baseline_fx, use_depth, use_descriptor, max_iterations,
):
    """Full GN loop for one keyframe (on-device, early exit)."""

    def cond(carry):
        _, _, it, conv = carry
        return (it < max_iterations) & jnp.logical_not(conv)

    def body(carry):
        q, t, it, _ = carry
        H, b, count = surfel_pose_coeffs(
            smap, cam, q, t, depth, f_nx, f_ny, intensity,
            baseline_fx, use_depth, use_descriptor,
        )
        ok = count > 6
        Hs = jnp.where(ok, H, jnp.eye(6, dtype=H.dtype))
        x = solve_psd(Hs, b)
        x = jnp.where(ok & jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
        upd = se3.mul(se3.SE3(q, t), se3.exp(-x))
        return upd.q, upd.t, it + 1, is_scale1_converged(x)

    q, t, _, _ = jax.lax.while_loop(
        cond, body, (q0, t0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    )
    return q, t


class PoseOptResult(NamedTuple):
    q: jax.Array      # [K, 4] updated global_T_frame rotations
    t: jax.Array      # [K, 3]
    moved: jax.Array  # [K] bool — pose changed beyond the scale-1 threshold


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "use_depth", "use_descriptor",
                     "max_iterations"),
)
def optimize_keyframe_poses(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    baseline_fx: float = 40.0,
    use_depth: bool = True,
    use_descriptor: bool = True,
    max_iterations: int = 30,
) -> PoseOptResult:
    """Optimize every masked keyframe's pose against the (fixed) map.

    Poses are independent given fixed surfels, so the evaluation order does
    not affect results; masked-out keyframes pass through unchanged.

    Round-4 traffic redesign: keyframes are processed in vmapped CHUNKS
    (a lax.scan over chunks of `_KF_BATCH`, the GN while_loops of a chunk
    running in lockstep until the whole chunk converges). Each lockstep GN
    step reads the surfel arrays ONCE for the whole chunk instead of once
    per keyframe — the round-3 profile measured the per-keyframe scan at
    ~100x the minimum HBM traffic, dominated by exactly these re-reads.
    Masked keyframes still occupy a lane (their empty association converges
    them after one step)."""
    from badslam_tpu.ba.geometry_opt import _chunk_of

    k = kstack.depth.shape[0]
    c = _chunk_of(k)

    def chunked(a):
        return a.reshape((-1, c) + a.shape[1:])

    def body(_, xs):
        (d, fx_, fy_, inten, q0, t0, m) = xs  # [C, ...]
        q, t = jax.vmap(
            lambda d1, n1, n2, i1, qq, tt: _estimate_one_pose(
                smap, cam, qq, tt, d1, n1, n2, i1,
                baseline_fx, use_depth, use_descriptor, max_iterations)
        )(d, fx_, fy_, inten, q0, t0)
        q = jnp.where(m[:, None], q, q0)
        t = jnp.where(m[:, None], t, t0)
        diff = se3.mul(se3.inverse(se3.SE3(q0, t0)), se3.SE3(q, t))
        moved = m & jnp.logical_not(
            jax.vmap(is_scale1_converged)(se3.log(diff)))
        return None, (q, t, moved)

    _, (q, t, moved) = jax.lax.scan(
        body, None,
        tuple(chunked(a) for a in
              (kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
               kstack.q, kstack.t, kstack.mask)),
    )
    return PoseOptResult(
        q=q.reshape(k, 4), t=t.reshape(k, 3), moved=moved.reshape(k))
