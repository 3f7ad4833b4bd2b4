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
  * 2 per surfel (descriptor components) when photometric residuals are on,
  * 5 intrinsics (fx_inv, fy_inv, cx_inv, cy_inv, a) + 1 cfactor per
    sparsification cell when optimize_intrinsics is on. The reference keeps
    4 additional color-camera intrinsics (direct_ba_pcg.cc:300-307); this
    rebuild resamples color into depth geometry at preprocessing, so the
    photometric residuals' intrinsics Jacobians are chain-ruled into the
    SAME 5 inverse-parametrized unknowns (see intrinsics_opt
    _color_to_inverse_param_T) instead of duplicating the camera.

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

from badslam_tpu.ba.intrinsics_opt import A_PRIOR_WEIGHT, DepthParams
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

DIAG_EPSILON = 1e-8  # kDiagEpsilon (kernel_pcg.cu:44)


class Unknowns(NamedTuple):
    """The global unknown vector as a pytree."""

    pose: jax.Array     # [K, 6]
    geo: jax.Array      # [N] position offset along the surfel normal
    desc: jax.Array     # [N, 2]
    intr: jax.Array     # [5] fx_inv, fy_inv, cx_inv, cy_inv, a
    cfactor: jax.Array  # [C] per-sparsification-cell deformation


def _zeros_like_unknowns(k, n, c=1):
    return Unknowns(
        pose=jnp.zeros((k, 6), jnp.float32),
        geo=jnp.zeros((n,), jnp.float32),
        desc=jnp.zeros((n, 2), jnp.float32),
        intr=jnp.zeros((5,), jnp.float32),
        cfactor=jnp.zeros((c,), jnp.float32),
    )


def _dot(a: Unknowns, b: Unknowns) -> jax.Array:
    return (jnp.vdot(a.pose, b.pose) + jnp.vdot(a.geo, b.geo)
            + jnp.vdot(a.desc, b.desc))


def _axpy(alpha, x: Unknowns, y: Unknowns) -> Unknowns:
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def _coeffs_for_keyframe(smap, cam, kf, baseline_fx, use_depth,
                         use_descriptor, params=None, cell_size=4, wc=1,
                         optimize_intrinsics=False):
    """Per-surfel residuals/Jacobians of keyframe `kf` vs the map.

    Returns a list of residual groups, each a dict with:
      w [N] robust weight (0 where invalid), r [N] raw residual,
      jp [N, 6] pose Jacobian, jg [N] geometry Jacobian,
      jd ([N, 2] one-hot-ish descriptor Jacobian slot index or None),
      and with optimize_intrinsics: ji [N, 5] intrinsics Jacobian plus
      (depth groups only) jcf [N] cfactor Jacobian and cell [N] cell ids.
    """
    (d, f_nx, f_ny, inten, raw, q, t, m) = kf
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
        group = dict(w=w, r=r, jp=jp, jg=jg, jd=None)
        if optimize_intrinsics:
            # Depth-intrinsics + deformation Jacobians: same derivation as
            # intrinsics_opt.accumulate_intrinsics_coeffs (arrow-head
            # system), evaluated per (keyframe, surfel) pair here.
            cell = jnp.where(
                valid, (a.py // cell_size) * wc + (a.px // cell_size), 0)
            raw_d = gather_nearest(raw, a.px, a.py)
            # Guard BEFORE exp: on invalid pixels raw_inv would be ~1e12
            # and exp(-a/d) overflows to inf the moment `a` goes slightly
            # negative; inf/inf Jacobians then poison the matrix-free
            # products as 0*NaN. Compute with a safe depth and zero the
            # rows afterwards.
            raw_ok = raw_d > 0
            raw_inv = 1.0 / jnp.where(raw_ok, jnp.maximum(raw_d, 1e-12), 1.0)
            cf = params.cfactor.reshape(-1)[cell]
            e = jnp.exp(-params.a * raw_inv)
            ci = raw_inv + cf * e
            okd = valid & raw_ok & (jnp.abs(ci) > 1e-4)
            safe_ci = jnp.where(okd, ci, 1.0)
            dot = a.nlx * un_x + a.nly * un_y + a.nlz
            jac_base = jnp.where(
                okd, inv_stddev * dot * e / (safe_ci * safe_ci), 0.0)
            j_cx = jnp.where(okd, inv_stddev * a.pixel_depth * a.nlx, 0.0)
            j_cy = jnp.where(okd, inv_stddev * a.pixel_depth * a.nly, 0.0)
            ji = jnp.stack([
                a.px.astype(dtype) * j_cx,
                a.py.astype(dtype) * j_cy,
                j_cx, j_cy,
                cf * raw_inv * jac_base,
            ], axis=-1)
            group["w"] = jnp.where(okd, w, 0.0)
            group["ji"] = ji
            group["jcf"] = -jac_base
            group["cell"] = cell
        groups.append(group)

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
            group = dict(w=w, r=r, jp=desc_jp(dxk, dyk), jg=None, jd=slot)
            if optimize_intrinsics:
                # Photometric intrinsics Jacobian, chain-ruled into the
                # inverse parametrization (cam shared with depth; see the
                # module docstring): dr/dfx_inv = -g_x*fx*px etc.
                gxr = 180.0 * (dxk - c_dx)
                gyr = 180.0 * (dyk - c_dy)
                pxf = a.px.astype(dtype)
                pyf = a.py.astype(dtype)
                zero = jnp.zeros_like(gxr)
                group["ji"] = jnp.stack([
                    -gxr * cam.fx * pxf,
                    -gyr * cam.fy * pyf,
                    -gxr * cam.fx,
                    -gyr * cam.fy,
                    zero,
                ], axis=-1)
                group["jcf"] = None
                group["cell"] = None
            groups.append(group)
    return groups


def _apply_groups(groups, p: Unknowns, kf_index):
    """v = J p restricted to this keyframe's residual groups; returns the
    J^T W v accumulation as (pose, geo, desc contributions, intr, cfactor
    contributions)."""
    out_pose = jnp.zeros((6,), jnp.float32)
    out_geo = None
    out_desc = []
    out_intr = None
    out_cf = []
    pk = p.pose[kf_index]
    for g in groups:
        v = g["jp"] @ pk
        if g["jg"] is not None:
            v = v + g["jg"] * p.geo
        if g["jd"] is not None:
            v = v + (-1.0) * p.desc[:, g["jd"]]
        if g.get("ji") is not None:
            v = v + g["ji"] @ p.intr
        if g.get("jcf") is not None:
            v = v + g["jcf"] * p.cfactor[g["cell"]]
        wv = g["w"] * v
        out_pose = out_pose + g["jp"].T @ wv
        if g["jg"] is not None:
            gi = g["jg"] * wv
            out_geo = gi if out_geo is None else out_geo + gi
        if g["jd"] is not None:
            out_desc.append((g["jd"], -wv))
        if g.get("ji") is not None:
            ii = g["ji"].T @ wv
            out_intr = ii if out_intr is None else out_intr + ii
        if g.get("jcf") is not None:
            out_cf.append((g["cell"], g["jcf"] * wv))
    return out_pose, out_geo, out_desc, out_intr, out_cf


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "use_depth", "use_descriptor",
                     "max_inner_iterations", "gauge_kf", "cell_size",
                     "optimize_intrinsics"),
)
def pcg_bundle_adjustment_step(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    raw_depth: jax.Array = None,       # [K, H, W], required for intrinsics
    params: DepthParams = None,
    baseline_fx: float = 40.0,
    use_depth: bool = True,
    use_descriptor: bool = True,
    max_inner_iterations: int = 30,
    gauge_kf: int = 0,
    cell_size: int = 4,
    optimize_intrinsics: bool = False,
) -> Tuple[SurfelMap, jax.Array, jax.Array, PinholeCamera, DepthParams]:
    """One outer GN iteration solved by inner PCG; returns
    (updated map, q [K,4], t [K,3], updated cam, updated depth params).
    Fully on-device."""
    k = kstack.depth.shape[0]
    n = smap.capacity
    if params is None:
        params = DepthParams(a=jnp.zeros((), jnp.float32),
                             cfactor=jnp.zeros((1, 1), jnp.float32))
    if raw_depth is None:
        raw_depth = kstack.depth
    hc, wc = params.cfactor.shape
    c = hc * wc

    kf_axes = (kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
               raw_depth, kstack.q, kstack.t, kstack.mask)
    coeff_kw = dict(params=params, cell_size=cell_size, wc=wc,
                    optimize_intrinsics=optimize_intrinsics)

    def gauge_fix(u: Unknowns) -> Unknowns:
        return u._replace(pose=u.pose.at[gauge_kf].set(0.0))

    # ---- init: b = -J^T W r ; M = diag(J^T W J) ----
    ids = jnp.arange(k, dtype=jnp.int32)

    def init_scan(carry, inputs):
        i, kf = inputs[0], inputs[1:]
        b, M = carry
        groups = _coeffs_for_keyframe(
            smap, cam, kf, baseline_fx, use_depth, use_descriptor,
            **coeff_kw)
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
            if g.get("ji") is not None:
                b = b._replace(intr=b.intr - g["ji"].T @ wr)
                M = M._replace(
                    intr=M.intr + (g["w"][:, None] * g["ji"] ** 2).sum(0))
            if g.get("jcf") is not None:
                b = b._replace(
                    cfactor=b.cfactor.at[g["cell"]].add(-g["jcf"] * wr))
                M = M._replace(
                    cfactor=M.cfactor.at[g["cell"]].add(
                        g["w"] * g["jcf"] ** 2))
        b = b._replace(pose=b.pose.at[i].add(bp))
        M = M._replace(pose=M.pose.at[i].add(Mp))
        return (b, M), None

    b0 = _zeros_like_unknowns(k, n, c)
    M0 = _zeros_like_unknowns(k, n, c)
    (b, M), _ = jax.lax.scan(init_scan, (b0, M0), (ids,) + kf_axes)
    if optimize_intrinsics:
        # Weak zero-prior on `a` (kernel_opt_intrinsics.cc:154): residual
        # W*(a + x_a) -> b_a += -W^2*a, diag_a += W^2.
        w2 = jnp.float32(A_PRIOR_WEIGHT * A_PRIOR_WEIGHT)
        b = b._replace(intr=b.intr.at[4].add(-w2 * params.a))
        M = M._replace(intr=M.intr.at[4].add(w2))
    b = gauge_fix(b)
    M_inv = jax.tree.map(
        lambda m: jnp.where(m > 0, 1.0 / (m + DIAG_EPSILON), 0.0), M)

    # ---- matrix-free A p = J^T W J p (gauge-fixed) ----
    def apply_A(p: Unknowns) -> Unknowns:
        p = gauge_fix(p)

        def body(acc: Unknowns, inputs):
            i, kf = inputs[0], inputs[1:]
            groups = _coeffs_for_keyframe(
                smap, cam, kf, baseline_fx, use_depth, use_descriptor,
                **coeff_kw)
            out_pose, out_geo, out_desc, out_intr, out_cf = _apply_groups(
                groups, p, i)
            acc = acc._replace(pose=acc.pose.at[i].add(out_pose))
            if out_geo is not None:
                acc = acc._replace(geo=acc.geo + out_geo)
            for slot, contrib in out_desc:
                acc = acc._replace(desc=acc.desc.at[:, slot].add(contrib))
            if out_intr is not None:
                acc = acc._replace(intr=acc.intr + out_intr)
            for cell, contrib in out_cf:
                acc = acc._replace(
                    cfactor=acc.cfactor.at[cell].add(contrib))
            return acc, None

        out, _ = jax.lax.scan(
            body, _zeros_like_unknowns(k, n, c), (ids,) + kf_axes)
        if optimize_intrinsics:
            w2 = jnp.float32(A_PRIOR_WEIGHT * A_PRIOR_WEIGHT)
            out = out._replace(intr=out.intr.at[4].add(w2 * p.intr[4]))
        return gauge_fix(out)

    # ---- PCG loop (PCGInit/Step1/Step2/Step3, kernel_pcg.cu) ----
    r = b                       # x0 = 0
    z = jax.tree.map(lambda mi, ri: mi * ri, M_inv, r)
    p = z
    rz = _dot(r, z)
    x = _zeros_like_unknowns(k, n, c)
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

    new_cam, new_params = cam, params
    if optimize_intrinsics:
        # Additive update on the inverse parametrization, converted back to
        # corner-convention intrinsics (kernel_opt_intrinsics.cc:184-196).
        fx_inv = cam.fx_inv + x.intr[0]
        fy_inv = cam.fy_inv + x.intr[1]
        cx_inv = cam.cx_inv + x.intr[2]
        cy_inv = cam.cy_inv + x.intr[3]
        fx = 1.0 / fx_inv
        fy = 1.0 / fy_inv
        new_cam = cam.with_intrinsics(
            fx=fx, fy=fy, cx=-(fx * cx_inv) + 0.5, cy=-(fy * cy_inv) + 0.5)
        new_params = DepthParams(
            a=params.a + x.intr[4],
            cfactor=params.cfactor + x.cfactor.reshape(params.cfactor.shape),
        )
    return new_map, new_q, new_t, new_cam, new_params


def pcg_bundle_adjustment(
    direct_ba,
    max_iterations: int = 10,
    max_inner_iterations: int = 30,
    optimize_intrinsics: bool = False,
    do_surfel_updates: bool = True,
) -> None:
    """Outer GN loop over PCG steps, operating on a DirectBA
    (BundleAdjustmentPCG analog). Per outer iteration, like the reference
    (direct_ba_pcg.cc:181-227): surfel creation for newly-activated
    keyframes, surfel normal re-estimation, then the PCG solve; merge +
    compaction run as scheme-end tasks after the last iteration. The gauge
    keyframe rotates deterministically per outer iteration (the reference
    randomizes it, direct_ba_pcg.cc:318-337)."""
    from badslam_tpu.ba.geometry_opt import update_surfel_normals
    from badslam_tpu.mapping import surfels as sf

    ks = direct_ba.keyframes
    c = direct_ba.config
    if ks.count == 0:
        return
    direct_ba.surfels = direct_ba.surfels._replace(
        active=direct_ba.surfels.valid)
    for it in range(max_iterations):
        gauge = it % ks.count
        kstack = ks.stack(ks.valid)

        if do_surfel_updates:
            if it == 0:
                # Surfel creation for keyframes not yet contributing
                # (direct_ba_pcg.cc:181-206); activation keeps new surfels
                # in the system.
                direct_ba._create_surfels_masked(ks.valid)
            direct_ba.surfels = direct_ba.surfels._replace(
                active=direct_ba.surfels.valid)
            # Normals are not PCG unknowns: re-estimate them per outer
            # iteration (UpdateSurfelNormalsCUDA, direct_ba_pcg.cc:215-227).
            direct_ba.surfels = update_surfel_normals(
                direct_ba.surfels, direct_ba.cam, kstack,
                baseline_fx=c.baseline_fx,
            )

        new_map, new_q, new_t, new_cam, new_params = \
            pcg_bundle_adjustment_step(
                direct_ba.surfels, direct_ba.cam, kstack,
                raw_depth=ks.stack_raw(),
                params=direct_ba.depth_params,
                baseline_fx=c.baseline_fx,
                use_depth=c.use_geometric_residuals,
                use_descriptor=c.use_photometric_residuals,
                max_inner_iterations=max_inner_iterations,
                gauge_kf=gauge,
                cell_size=c.sparse_surfel_cell_size,
                optimize_intrinsics=optimize_intrinsics,
            )
        direct_ba.surfels = new_map
        ks.set_poses(new_q, new_t, ks.valid)
        if optimize_intrinsics:
            direct_ba.cam = new_cam.concrete()  # host floats (rare read)
            direct_ba.depth_params = new_params
            ks.recalibrate(
                direct_ba.cam, new_params.a, new_params.cfactor,
                c.sparse_surfel_cell_size,
            )
            direct_ba.intrinsics_updated = True

    if do_surfel_updates:
        # Scheme-end tasks: merge supporting surfels + compact
        # (PerformBASchemeEndTasks analog for the PCG path).
        direct_ba._merge_surfels_masked(ks.valid)
        direct_ba.surfels = sf.compact_surfels(direct_ba.surfels)
