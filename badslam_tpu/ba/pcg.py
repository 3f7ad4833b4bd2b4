"""PCG bundle adjustment: one global Gauss-Newton system, matrix-free.

TPU rebuild of DirectBA::BundleAdjustmentPCG
(/root/reference/applications/badslam/src/badslam/direct_ba_pcg.cc:43-700
and kernel_pcg.cu): instead of alternating pose/geometry steps, build ONE
Gauss-Newton system over all unknowns and solve it inexactly with
Jacobi-preconditioned conjugate gradients on the normal equations,
J^T W J x = -J^T W r, with matrix-free products.

Unknowns (direct_ba_pcg.cc:270-307, minus the gauge keyframe):
  * 6 per keyframe (se3 twist, right-multiplied),
  * 1 per surfel (position offset along its normal),
  * 2 per surfel (descriptor components) when photometric residuals are on.
Deviation: depth/color intrinsics stay in the alternating Schur step
(intrinsics_opt.py) rather than being folded into the PCG system.

TPU-first design vs the reference:
  * The ENTIRE solver — init, the <=max_inner_iterations CG loop with its
    alpha/beta reductions, convergence test (3 consecutive non-improving
    residual norms, direct_ba_pcg.cc:440-456), and the final update apply —
    is ONE jitted program. The reference downloads the 1-float beta every
    CG step (direct_ba_pcg.cc:441-443), a device sync per step.
  * Per-(keyframe, surfel) coefficients are recomputed on the fly in a
    lax.scan over the keyframe axis (like kernel_pcg.cu recomputes
    SurfelProjectsToAssociatedPixel per step) — O(K*N) work, zero O(K*N)
    memory.
  * Accumulations are deterministic segment reductions, not atomics.

Jacobians: the depth (point-to-plane) residual couples a keyframe pose
with its surfel's 1-D position: dr/ddelta = -inv_stddev (the surfel moves
by delta*n_l in frame coords and r = s*n_l.(unproj - p_l), |n_l| = 1).
The descriptor residuals couple the pose with the surfel descriptor:
dr_k/ddesc_k = -1. Pose Jacobians match pose_opt.surfel_pose_coeffs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.mapping.association import (
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import KeyframeStack
from badslam_tpu.mapping.surfels import SurfelMap
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear_and_gradient

DIAG_EPSILON = 1e-8  # kDiagEpsilon (kernel_pcg.cu:44)


class Unknowns(NamedTuple):
    """The global unknown vector as a pytree."""

    pose: jax.Array   # [K, 6]
    geo: jax.Array    # [N] position offset along the surfel normal
    desc: jax.Array   # [N, 2]


def _zeros_like_unknowns(k, n):
    return Unknowns(
        pose=jnp.zeros((k, 6), jnp.float32),
        geo=jnp.zeros((n,), jnp.float32),
        desc=jnp.zeros((n, 2), jnp.float32),
    )


def _dot(a: Unknowns, b: Unknowns) -> jax.Array:
    return (jnp.vdot(a.pose, b.pose) + jnp.vdot(a.geo, b.geo)
            + jnp.vdot(a.desc, b.desc))


def _axpy(alpha, x: Unknowns, y: Unknowns) -> Unknowns:
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def _coeffs_for_keyframe(smap, cam, kf, baseline_fx, use_depth,
                         use_descriptor):
    """Per-surfel residuals/Jacobians of keyframe `kf` vs the map.

    Returns a list of residual groups, each a dict with:
      w [N] robust weight (0 where invalid), r [N] raw residual,
      jp [N, 6] pose Jacobian, jg [N] geometry Jacobian,
      jd ([N, 2] one-hot-ish descriptor Jacobian slot index or None).
    """
    (d, f_nx, f_ny, inten, q, t, m) = kf
    ftg = se3.inverse(se3.SE3(q, t))
    a = associate_surfels_with_frame(
        cam, smap.pos, smap.normal, smap.valid & smap.active, ftg.q, ftg.t,
        d, f_nx, f_ny, baseline_fx,
    )
    valid = a.valid & m
    dtype = smap.pos.dtype
    groups = []

    if use_depth:
        # Zero (not just down-weight) invalid rows: 1e30-scale Jacobians
        # from degenerate stddevs would otherwise produce inf*0 = NaN in
        # the matrix-free products.
        inv_stddev = jnp.where(
            valid, 1.0 / jnp.maximum(a.stddev, 1e-30), 0.0)
        un_x = cam.fx_inv * a.px.astype(dtype) + cam.cx_inv
        un_y = cam.fy_inv * a.py.astype(dtype) + cam.cy_inv
        ux, uy, uz = a.pixel_depth * un_x, a.pixel_depth * un_y, a.pixel_depth
        r = inv_stddev * (
            a.nlx * (ux - a.lx) + a.nly * (uy - a.ly) + a.nlz * (uz - a.lz)
        )
        w = jnp.where(valid, robust.depth_residual_weight(r), 0.0)
        # EXACT pose Jacobian (rotation rows use the surfel's local
        # position p_l, i.e. s*(p_l x n_l)). The alternating solver's
        # local-frame simplification (u at measured depth,
        # kernel_opt_pose.cu:85-93) is harmless there but creates spurious
        # joint stationary points when geometry is optimized simultaneously.
        jp = jnp.stack([
            inv_stddev * a.nlx,
            inv_stddev * a.nly,
            inv_stddev * a.nlz,
            inv_stddev * (-a.nly * a.lz + a.nlz * a.ly),
            inv_stddev * (a.nlx * a.lz - a.nlz * a.lx),
            inv_stddev * (-a.nlx * a.ly + a.nly * a.lx),
        ], axis=-1)
        jg = -inv_stddev
        groups.append(dict(w=w, r=r, jp=jp, jg=jg, jd=None))

    if use_descriptor:
        t1x, t1y, t2x, t2y, t_ok = tangent_projections(
            smap.pos, smap.normal, smap.radius2, ftg.q, ftg.t, cam
        )
        dvalid = valid & t_ok
        ic, c_dx, c_dy = bilinear_and_gradient(inten, a.pxy_x, a.pxy_y)
        i1, t1_dx, t1_dy = bilinear_and_gradient(inten, t1x, t1y)
        i2, t2_dx, t2_dy = bilinear_and_gradient(inten, t2x, t2y)
        inv_z = 1.0 / jnp.where(dvalid, a.lz, 1.0)
        inv_z_sq = inv_z * inv_z
        z_sq = a.lz * a.lz
        xy = a.lx * a.ly

        def desc_jp(gx_raw, gy_raw):
            gx = 180.0 * (gx_raw - c_dx) * cam.fx
            gy = 180.0 * (gy_raw - c_dy) * cam.fy
            return jnp.stack([
                -gx * inv_z,
                -gy * inv_z,
                (a.lx * gx + a.ly * gy) * inv_z_sq,
                ((a.ly * a.ly + z_sq) * gy + xy * gx) * inv_z_sq,
                -((a.lx * a.lx + z_sq) * gx + xy * gy) * inv_z_sq,
                -(a.lx * gy - a.ly * gx) * inv_z,
            ], axis=-1)

        for slot, (ik, dxk, dyk) in enumerate(
                ((i1, t1_dx, t1_dy), (i2, t2_dx, t2_dy))):
            r = jnp.where(dvalid, 180.0 * (ik - ic) - smap.desc[:, slot], 0.0)
            w = jnp.where(dvalid, robust.descriptor_residual_weight(r), 0.0)
            groups.append(dict(
                w=w, r=r, jp=desc_jp(dxk, dyk),
                jg=None, jd=slot,
            ))
    return groups


def _apply_groups(groups, p: Unknowns, kf_index):
    """v = J p restricted to this keyframe's residual groups; returns the
    J^T W v accumulation as an Unknowns increment."""
    out_pose = jnp.zeros((6,), jnp.float32)
    out_geo = None
    out_desc = []
    pk = p.pose[kf_index]
    for g in groups:
        v = g["jp"] @ pk
        if g["jg"] is not None:
            v = v + g["jg"] * p.geo
        if g["jd"] is not None:
            v = v + (-1.0) * p.desc[:, g["jd"]]
        wv = g["w"] * v
        out_pose = out_pose + g["jp"].T @ wv
        if g["jg"] is not None:
            gi = g["jg"] * wv
            out_geo = gi if out_geo is None else out_geo + gi
        if g["jd"] is not None:
            out_desc.append((g["jd"], -wv))
    return out_pose, out_geo, out_desc


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "use_depth", "use_descriptor",
                     "max_inner_iterations", "gauge_kf"),
)
def pcg_bundle_adjustment_step(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    baseline_fx: float = 40.0,
    use_depth: bool = True,
    use_descriptor: bool = True,
    max_inner_iterations: int = 30,
    gauge_kf: int = 0,
) -> Tuple[SurfelMap, jax.Array, jax.Array]:
    """One outer GN iteration solved by inner PCG; returns
    (updated map, updated poses q [K,4], t [K,3]). Fully on-device."""
    k = kstack.depth.shape[0]
    n = smap.capacity

    kf_axes = (kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
               kstack.q, kstack.t, kstack.mask)

    def gauge_fix(u: Unknowns) -> Unknowns:
        return u._replace(pose=u.pose.at[gauge_kf].set(0.0))

    # ---- init: b = -J^T W r ; M = diag(J^T W J) ----
    ids = jnp.arange(k, dtype=jnp.int32)

    def init_scan(carry, inputs):
        i, kf = inputs[0], inputs[1:]
        b, M = carry
        groups = _coeffs_for_keyframe(
            smap, cam, kf, baseline_fx, use_depth, use_descriptor)
        bp = jnp.zeros((6,), jnp.float32)
        Mp = jnp.zeros((6,), jnp.float32)
        for g in groups:
            wr = g["w"] * g["r"]
            bp = bp - g["jp"].T @ wr
            Mp = Mp + (g["w"][:, None] * g["jp"] ** 2).sum(axis=0)
            if g["jg"] is not None:
                b = b._replace(geo=b.geo - g["jg"] * wr)
                M = M._replace(geo=M.geo + g["w"] * g["jg"] ** 2)
            if g["jd"] is not None:
                s = g["jd"]
                b = b._replace(desc=b.desc.at[:, s].add(wr))
                M = M._replace(desc=M.desc.at[:, s].add(g["w"]))
        b = b._replace(pose=b.pose.at[i].add(bp))
        M = M._replace(pose=M.pose.at[i].add(Mp))
        return (b, M), None

    b0 = _zeros_like_unknowns(k, n)
    M0 = _zeros_like_unknowns(k, n)
    (b, M), _ = jax.lax.scan(init_scan, (b0, M0), (ids,) + kf_axes)
    b = gauge_fix(b)
    M_inv = jax.tree.map(
        lambda m: jnp.where(m > 0, 1.0 / (m + DIAG_EPSILON), 0.0), M)

    # ---- matrix-free A p = J^T W J p (gauge-fixed) ----
    def apply_A(p: Unknowns) -> Unknowns:
        p = gauge_fix(p)

        def body(acc: Unknowns, inputs):
            i, kf = inputs[0], inputs[1:]
            groups = _coeffs_for_keyframe(
                smap, cam, kf, baseline_fx, use_depth, use_descriptor)
            out_pose, out_geo, out_desc = _apply_groups(groups, p, i)
            acc = acc._replace(pose=acc.pose.at[i].add(out_pose))
            if out_geo is not None:
                acc = acc._replace(geo=acc.geo + out_geo)
            for slot, contrib in out_desc:
                acc = acc._replace(desc=acc.desc.at[:, slot].add(contrib))
            return acc, None

        out, _ = jax.lax.scan(
            body, _zeros_like_unknowns(k, n), (ids,) + kf_axes)
        return gauge_fix(out)

    # ---- PCG loop (PCGInit/Step1/Step2/Step3, kernel_pcg.cu) ----
    r = b                       # x0 = 0
    z = jax.tree.map(lambda mi, ri: mi * ri, M_inv, r)
    p = z
    rz = _dot(r, z)
    x = _zeros_like_unknowns(k, n)
    best_rnorm = jnp.asarray(jnp.inf, jnp.float32)

    def cond(state):
        it, _, _, _, rz, bad_steps, _ = state
        return (it < max_inner_iterations) & (bad_steps < 3) & (rz > 1e-20)

    def body(state):
        it, x, r, p, rz, bad_steps, best = state
        Ap = apply_A(p)
        pAp = _dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-30), 0.0)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = jax.tree.map(lambda mi, ri: mi * ri, M_inv, r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = _axpy(beta, p, z)
        rnorm = jnp.sqrt(rz_new)
        # 3 consecutive non-improving steps -> stop
        # (direct_ba_pcg.cc:440-456).
        improved = rnorm < best
        bad_steps = jnp.where(improved, 0, bad_steps + 1)
        best = jnp.minimum(best, rnorm)
        return it + 1, x, r, p, rz_new, bad_steps, best

    _, x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), x, r, p, rz, jnp.int32(0), best_rnorm),
    )
    x = gauge_fix(x)

    # ---- apply updates ----
    new_pos = smap.pos + jnp.where(
        (smap.valid & smap.active)[:, None],
        x.geo[:, None] * smap.normal, 0.0)
    new_desc = smap.desc + jnp.where(
        (smap.valid & smap.active)[:, None], x.desc, 0.0)
    new_map = smap._replace(pos=new_pos, desc=new_desc)

    def upd_pose(qi, ti, di, mi):
        upd = se3.mul(se3.SE3(qi, ti), se3.exp(di))
        return (jnp.where(mi, upd.q, qi), jnp.where(mi, upd.t, ti))

    new_q, new_t = jax.vmap(upd_pose)(
        kstack.q, kstack.t, x.pose, kstack.mask)
    return new_map, new_q, new_t


def pcg_bundle_adjustment(
    direct_ba,
    max_iterations: int = 10,
    max_inner_iterations: int = 30,
) -> None:
    """Outer GN loop over PCG steps, operating on a DirectBA
    (BundleAdjustmentPCG analog with the surfel-maintenance pipeline of the
    alternating scheme). The gauge keyframe rotates deterministically per
    outer iteration (the reference randomizes it,
    direct_ba_pcg.cc:318-337)."""
    ks = direct_ba.keyframes
    c = direct_ba.config
    if ks.count == 0:
        return
    direct_ba.surfels = direct_ba.surfels._replace(
        active=direct_ba.surfels.valid)
    for it in range(max_iterations):
        gauge = it % ks.count
        kstack = ks.stack(ks.valid)
        new_map, new_q, new_t = pcg_bundle_adjustment_step(
            direct_ba.surfels, direct_ba.cam, kstack,
            baseline_fx=c.baseline_fx,
            use_depth=c.use_geometric_residuals,
            use_descriptor=c.use_photometric_residuals,
            max_inner_iterations=max_inner_iterations,
            gauge_kf=gauge,
        )
        direct_ba.surfels = new_map
        ks.set_poses(new_q, new_t, ks.valid)
