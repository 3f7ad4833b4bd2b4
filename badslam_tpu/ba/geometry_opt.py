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

TPU redesign (round 4): the reference launches one accumulation kernel per
keyframe into persistent SoA scratch rows; round 1-3 used a lax.scan over
the keyframe axis, which re-reads EVERY surfel array once per keyframe —
the round-3 roofline profile measured ~100x the minimum HBM traffic for
the fused BA iteration. Now each stage scans over CHUNKS of `_KF_BATCH`
keyframes with the chunk processed as one batched ([C, N]) computation:
the surfel arrays are read once per chunk instead of once per keyframe
(C-fold less surfel traffic), the per-keyframe plane reads are unchanged,
and the [C, N] intermediates stay inside XLA reduction fusions. The final
solve is a vectorized 3x3 Cholesky over all surfels at once.

Deviation: averaged normals are re-normalized to unit length (the
reference stores the raw average, clamped by its 10-bit packing)."""

from __future__ import annotations

import functools
from typing import Tuple

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
from badslam_tpu.ops.interp import bilinear_and_gradient, gather_nearest
from badslam_tpu.ops.preprocess import normal_z

# Keyframes per batched chunk of the stage scans. Larger = fewer re-reads
# of the surfel arrays but bigger [C, N] live intermediates; 8 keeps the
# chunk working set a few MB at the usual surfel buckets.
_KF_BATCH = 8


_warned_chunk1: set = set()


def _chunk_of(k: int) -> int:
    """Largest power-of-two divisor of k, capped at _KF_BATCH (stacks have
    pow-2 capacity in the product path; odd test stacks fall back to 1).
    A chunk of 1 silently restores the per-keyframe surfel-array re-read
    pattern the chunking exists to kill (~100x HBM traffic, PERF_NOTES
    round 4), so any k>1 falling back to 1 is logged once per size."""
    c = 1
    while c < _KF_BATCH and k % (c * 2) == 0:
        c *= 2
    if c == 1 and k > 1 and k not in _warned_chunk1:
        _warned_chunk1.add(k)
        from badslam_tpu.utils.logging import warning

        warning(
            "BA stage scans over a non-pow-2 keyframe stack (K=%d): chunk "
            "size falls back to 1, re-reading the surfel arrays once per "
            "keyframe. Pad the stack to a power of two (the product path "
            "does) to restore chunked batching.", k)
    return c


def _chunked(c: int, *arrs):
    return tuple(a.reshape((-1, c) + a.shape[1:]) for a in arrs)


def _assoc_batch(cam, pos, normal, mask, q_c, t_c, d_c, nx_c, ny_c,
                 baseline_fx):
    """Associate all surfels against C keyframes at once ([C, N] fields).
    Keyframe poses are global_T_frame; inverted per keyframe inside."""

    def one(q, t, d, nx_, ny_):
        ftg = se3.inverse(se3.SE3(q, t))
        return ftg, associate_surfels_with_frame(
            cam, pos, normal, mask, ftg.q, ftg.t, d, nx_, ny_, baseline_fx)

    return jax.vmap(one)(q_c, t_c, d_c, nx_c, ny_c)


def _rotate_batch(R, x, y, z):
    """[C,3,3] x three [C,N] component planes -> [C,N,3] rotated vectors."""
    return (R[:, None, :, 0] * x[..., None]
            + R[:, None, :, 1] * y[..., None]
            + R[:, None, :, 2] * z[..., None])


# ---------------------------------------------------------------------------
# Fused activation + normals pass (one read of the keyframe planes for both)
# ---------------------------------------------------------------------------


def update_activation_and_normals(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,        # full stack; masks passed separately
    active_strict: jax.Array,     # [K] strictly-ACTIVE keyframes
    participating: jax.Array,     # [K] ACTIVE | COVISIBLE_ACTIVE keyframes
    baseline_fx: float,
    update_normals: bool = True,
) -> SurfelMap:
    """Surfel activation (UpdateSurfelActivationCUDA) and normal averaging
    (geometry step (a)) from ONE association pass over the keyframe planes.

    Associations are computed with the plain validity mask and filtered by
    the NEW activation afterwards — exact because a surfel's association
    against a frame is independent of its active flag (the reference's
    per-kernel recompute is redundant on this axis). Active surfel set
    matches update_surfel_activation; normals match update_surfel_normals
    run after it."""
    k = kstack.depth.shape[0]
    c = _chunk_of(k)
    n = smap.capacity
    d_c, nx_c, ny_c, q_c, t_c = _chunked(
        c, kstack.depth, kstack.nx, kstack.ny, kstack.q, kstack.t)
    am_c, pm_c = _chunked(c, active_strict, participating)

    def body(carry, xs):
        act, nsum, cnt = carry
        (d, nx_, ny_, q, t, am, pm) = xs
        _, a = _assoc_batch(cam, smap.pos, smap.normal, smap.valid,
                            q, t, d, nx_, ny_, baseline_fx)
        act = act | jnp.any(a.valid & am[:, None], axis=0)
        if update_normals:
            hit = a.valid & pm[:, None]
            mnx = jax.vmap(gather_nearest)(nx_, a.px, a.py)
            mny = jax.vmap(gather_nearest)(ny_, a.px, a.py)
            mnz = normal_z(mnx, mny)
            R = se3.quat_to_matrix(q)  # [C,3,3] global_R_frame
            gn = _rotate_batch(R, mnx, mny, mnz)
            nsum = nsum + jnp.sum(
                jnp.where(hit[..., None], gn, 0.0), axis=0)
            cnt = cnt + jnp.sum(hit.astype(jnp.int32), axis=0)
        return (act, nsum, cnt), None

    init = (jnp.zeros((n,), jnp.bool_),
            jnp.zeros((n, 3), smap.normal.dtype),
            jnp.zeros((n,), jnp.int32))
    (act, nsum, cnt), _ = jax.lax.scan(
        body, init, (d_c, nx_c, ny_c, q_c, t_c, am_c, pm_c))

    act = act & smap.valid
    smap = smap._replace(active=act)
    if not update_normals:
        return smap
    norm = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    new_normal = jnp.where(
        (act & (cnt >= 1))[:, None] & (norm > 1e-12),
        nsum / jnp.maximum(norm, 1e-12),
        smap.normal,
    )
    return smap._replace(normal=new_normal)


def _normals_chunk(carry, xs, smap, cam, baseline_fx):
    """One chunk of the normal-averaging scan: carry = (nsum, cnt),
    xs = (d, nx, ny, q, t, m) with [C, ...] leading axes. Shared by the
    local scan below and the plane-streamed SPMD scan
    (parallel/sharded.py), which feeds chunks broadcast over ICI."""
    nsum, cnt = carry
    (d, nx_, ny_, q, t, m) = xs
    _, a = _assoc_batch(cam, smap.pos, smap.normal,
                        smap.valid & smap.active,
                        q, t, d, nx_, ny_, baseline_fx)
    hit = a.valid & m[:, None]
    mnx = jax.vmap(gather_nearest)(nx_, a.px, a.py)
    mny = jax.vmap(gather_nearest)(ny_, a.px, a.py)
    mnz = normal_z(mnx, mny)
    R = se3.quat_to_matrix(q)
    gn = _rotate_batch(R, mnx, mny, mnz)
    nsum = nsum + jnp.sum(jnp.where(hit[..., None], gn, 0.0), axis=0)
    cnt = cnt + jnp.sum(hit.astype(jnp.int32), axis=0)
    return (nsum, cnt)


def _normals_finish(smap, nsum, cnt) -> SurfelMap:
    norm = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    new_normal = jnp.where(
        (cnt >= 1)[:, None] & (norm > 1e-12),
        nsum / jnp.maximum(norm, 1e-12),
        smap.normal,
    )
    return smap._replace(normal=new_normal)


@functools.partial(jax.jit, static_argnames=("baseline_fx",))
def update_surfel_normals(
    smap: SurfelMap, cam: PinholeCamera, kstack: KeyframeStack,
    baseline_fx: float,
) -> SurfelMap:
    """Step (a) standalone: re-estimate ACTIVE surfels' normals by
    averaging the observing keyframes' measurement normals (kstack.mask
    selects the participating keyframes)."""
    k = kstack.depth.shape[0]
    c = _chunk_of(k)
    n = smap.capacity
    d_c, nx_c, ny_c, q_c, t_c, m_c = _chunked(
        c, kstack.depth, kstack.nx, kstack.ny, kstack.q, kstack.t,
        kstack.mask)

    def body(carry, xs):
        return _normals_chunk(carry, xs, smap, cam, baseline_fx), None

    (nsum, cnt), _ = jax.lax.scan(
        body,
        (jnp.zeros((n, 3), smap.normal.dtype), jnp.zeros((n,), jnp.int32)),
        (d_c, nx_c, ny_c, q_c, t_c, m_c))
    return _normals_finish(smap, nsum, cnt)


# ---------------------------------------------------------------------------
# Step (b): position (+ descriptors) accumulation
# ---------------------------------------------------------------------------


def _position_step(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    baseline_fx: float,
    use_depth: bool,
    use_descriptor: bool,
) -> SurfelMap:
    """Accumulate the per-surfel position(+descriptor) Gauss-Newton system
    over all masked keyframes (chunk-batched) and solve."""
    k = kstack.depth.shape[0]
    c = _chunk_of(k)
    n = smap.capacity
    dtype = smap.pos.dtype
    d_c, nx_c, ny_c, i_c, q_c, t_c, m_c = _chunked(
        c, kstack.depth, kstack.nx, kstack.ny, kstack.intensity,
        kstack.q, kstack.t, kstack.mask)

    if not use_descriptor:
        # --- 1-D position along the normal from depth residuals only ---
        def body(carry, xs):
            return _pos1d_chunk(carry, xs, smap, cam, baseline_fx), None

        (H, b), _ = jax.lax.scan(
            body,
            (jnp.zeros((n,), dtype), jnp.zeros((n,), dtype)),
            (d_c, nx_c, ny_c, i_c, q_c, t_c, m_c))
        return _pos1d_finish(smap, H, b)

    # --- position + 2 descriptor components jointly (3x3 per surfel) ---
    def body(carry, xs):
        return _pos3d_chunk(carry, xs, smap, cam, baseline_fx,
                            use_depth), None

    z = jnp.zeros((n,), dtype)
    carry, _ = jax.lax.scan(
        body, (z, z, z, z, z, z, z, z, z),
        (d_c, nx_c, ny_c, i_c, q_c, t_c, m_c))
    return _pos3d_finish(smap, carry)


def _pos1d_chunk(carry, xs, smap, cam, baseline_fx):
    """One chunk of the depth-only position scan: carry = (H, b),
    xs = (d, nx, ny, inten, q, t, m). Shared with the plane-streamed SPMD
    scan (parallel/sharded.py)."""
    dtype = smap.pos.dtype
    Hacc, bacc = carry
    (d, nx_, ny_, inten, q, t, m) = xs
    _, a = _assoc_batch(cam, smap.pos, smap.normal,
                        smap.valid & smap.active,
                        q, t, d, nx_, ny_, baseline_fx)
    hit = a.valid & m[:, None]
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
    Hacc = Hacc + jnp.sum(w * J * J, axis=0)
    bacc = bacc + jnp.sum(w * r * J, axis=0)
    return (Hacc, bacc)


def _pos1d_finish(smap, H, b) -> SurfelMap:
    upd = smap.valid & smap.active & (H > 1e-6)
    step = jnp.where(upd, -b / jnp.maximum(H, 1e-6), 0.0)
    new_pos = smap.pos + step[:, None] * smap.normal
    return smap._replace(pos=new_pos)


def _pos3d_chunk(carry, xs, smap, cam, baseline_fx, use_depth):
    """One chunk of the joint position+descriptor scan: carry = the 9
    accumulator planes, xs = (d, nx, ny, inten, q, t, m)."""
    dtype = smap.pos.dtype
    (H00, H01, H02, H11, H12, H22, b0, b1, b2) = carry
    (d, nx_, ny_, inten, q, t, m) = xs
    ftg, a = _assoc_batch(cam, smap.pos, smap.normal,
                          smap.valid & smap.active,
                          q, t, d, nx_, ny_, baseline_fx)
    hit = a.valid & m[:, None]

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
        H00 = H00 + jnp.sum(w * Jd * Jd, axis=0)
        b0 = b0 + jnp.sum(w * r * Jd, axis=0)

    # Descriptor residuals at the tangent points.
    t1x, t1y, t2x, t2y, t_ok = jax.vmap(
        lambda fq, ft: tangent_projections(
            smap.pos, smap.normal, smap.radius2, fq, ft, cam)
    )(ftg.q, ftg.t)
    dhit = hit & t_ok
    ic, c_dx, c_dy = jax.vmap(bilinear_and_gradient)(
        inten, a.pxy_x, a.pxy_y)
    i1, t1_dx, t1_dy = jax.vmap(bilinear_and_gradient)(inten, t1x, t1y)
    i2, t2_dx, t2_dy = jax.vmap(bilinear_and_gradient)(inten, t2x, t2y)
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

    H00 = H00 + jnp.sum(w1 * jp1 * jp1 + w2 * jp2 * jp2, axis=0)
    H01 = H01 + jnp.sum(w1 * jp1 * jd, axis=0)
    H02 = H02 + jnp.sum(w2 * jp2 * jd, axis=0)
    H11 = H11 + jnp.sum(w1 * jd * jd, axis=0)
    H22 = H22 + jnp.sum(w2 * jd * jd, axis=0)
    b0 = b0 + jnp.sum(w1 * r1 * jp1 + w2 * r2 * jp2, axis=0)
    b1 = b1 + jnp.sum(w1 * r1 * jd, axis=0)
    b2 = b2 + jnp.sum(w2 * r2 * jd, axis=0)
    return (H00, H01, H02, H11, H12, H22, b0, b1, b2)


def _pos3d_finish(smap, carry) -> SurfelMap:
    (H00, H01, H02, H11, H12, H22, b0, b1, b2) = carry
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
    smap = update_surfel_normals.__wrapped__(smap, cam, kstack, baseline_fx)
    return _position_step(smap, cam, kstack, baseline_fx,
                          use_depth, use_descriptor)
