"""Surfel map as a static-capacity structure-of-arrays pytree + map ops.

TPU-native redesign of the reference's 17-row surfel SoA buffer and its
maintenance kernels (/root/reference/applications/badslam/src/badslam/
kernels.cuh:69-93, kernel_create_surfels.cu, kernel_supporting_surfels.cu,
kernel_delete_surfels.cu, kernel_compact_surfels.cu,
kernel_surfel_activation.cu). Key differences:

  * Scratch accumulators are local values inside fused XLA programs, not
    persisted SoA rows.
  * Holes are a `valid` bool mask instead of NaN-tagged x coordinates.
  * The atomicCAS cell-slot races become deterministic scatter-min passes
    (lowest surfel index wins each of the 3 merge slots), so merge results
    are reproducible run-to-run — the reference's are not (SURVEY §4).
  * Compaction is a cumsum-scatter permutation instead of CUB prefix sums
    + a hole-filling pass.

All ops run over the full static capacity with masking; capacity is chosen
by the host (power-of-two bucketing keeps recompiles bounded).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.geometry.linalg import rotate3, transform3
from badslam_tpu.mapping.association import (
    Association,
    associate_surfels_with_frame,
    tangent_projections,
)
from badslam_tpu.mapping.keyframes import KeyframeStack
from badslam_tpu.ops import robust
from badslam_tpu.ops.interp import bilinear, gather_nearest
from badslam_tpu.ops.preprocess import normal_z

# Plain Python int, NOT jnp.int32: a module-level device scalar would be
# closure-captured into every jit that uses it, and JAX reads captured
# device arrays back to the host at lowering time to embed them as HLO
# constants — a silent device->host read that permanently degrades the
# axon TPU relay (PERF_NOTES.md). Weak-typed ints promote identically.
_BIG = 2**30
MERGE_SLOT_COUNT = 3  # kMergeBufferCount (kernels.cuh:51)


class SurfelMap(NamedTuple):
    pos: jax.Array      # [N, 3] f32 global positions
    normal: jax.Array   # [N, 3] f32 global normals (unit)
    radius2: jax.Array  # [N] f32 squared radii
    color: jax.Array    # [N, 3] f32 RGB in [0, 255] (visualization)
    desc: jax.Array     # [N, 2] f32 descriptor components
    valid: jax.Array    # [N] bool
    active: jax.Array   # [N] bool (kSurfelActiveFlag analog)
    count: jax.Array    # [] int32 number of valid surfels

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


def empty_map(capacity: int, dtype=jnp.float32) -> SurfelMap:
    return SurfelMap(
        pos=jnp.zeros((capacity, 3), dtype),
        normal=jnp.zeros((capacity, 3), dtype),
        radius2=jnp.zeros((capacity,), dtype),
        color=jnp.zeros((capacity, 3), dtype),
        desc=jnp.zeros((capacity, 2), dtype),
        valid=jnp.zeros((capacity,), jnp.bool_),
        active=jnp.zeros((capacity,), jnp.bool_),
        count=jnp.zeros((), jnp.int32),
    )


def _associate(smap: SurfelMap, cam: PinholeCamera, frame_q, frame_t,
               depth, f_nx, f_ny, baseline_fx) -> Association:
    return associate_surfels_with_frame(
        cam, smap.pos, smap.normal, smap.valid, frame_q, frame_t,
        depth, f_nx, f_ny, baseline_fx,
    )


# ---------------------------------------------------------------------------
# Supporting surfels + merge
# ---------------------------------------------------------------------------


def _cell_index(px, py, cell_size: int, w_cells: int):
    return (py // cell_size) * w_cells + (px // cell_size)


def occupied_cells(
    smap: SurfelMap,
    cam: PinholeCamera,
    kf_q, kf_t, depth, f_nx, f_ny,   # global_T_frame keyframe pose
    baseline_fx: float,
    cell_size: int,
) -> jax.Array:
    """[Hc, Wc] bool: cells with at least one associated surfel.

    The supporting-surfels pass used to gate surfel creation
    (DetermineSupportingSurfelsCUDA, kernel_supporting_surfels.cu:40-100).
    Takes the keyframe's global_T_frame pose and inverts internally —
    surfels are projected INTO the frame. (Until round 5 this projected
    with the non-inverted pose: for keyframes away from the origin the
    support gate looked through a wrong camera, over- or under-creating
    surfels; surfaced by the plane-streamed equivalence test.)
    """
    h, w = depth.shape
    hc, wc = h // cell_size, w // cell_size
    ftg = se3.inverse(se3.SE3(kf_q, kf_t))
    assoc = _associate(smap, cam, ftg.q, ftg.t, depth, f_nx, f_ny, baseline_fx)
    cell = _cell_index(assoc.px, assoc.py, cell_size, wc)
    occ = jnp.zeros((hc * wc,), jnp.bool_)
    occ = occ.at[jnp.where(assoc.valid, cell, 0)].max(assoc.valid)
    return occ.reshape(hc, wc)


@functools.partial(
    jax.jit, static_argnames=("baseline_fx", "cell_size")
)
def merge_surfels_for_frame(
    smap: SurfelMap,
    cam: PinholeCamera,
    kf_q, kf_t, depth, f_nx, f_ny,   # global_T_frame keyframe pose
    baseline_fx: float,
    cell_size: int,
    merge_dist_factor: float = 0.8,
) -> SurfelMap:
    """Merge surfels that land in the same sparsification cell of a frame.

    Deterministic rebuild of DetermineSupportingSurfelsAndMergeSurfelsCUDA:
    for each of the 3 cell slots, the lowest-index remaining surfel claims
    the slot; other surfels in the cell are deleted if their normal agrees
    (cos > 0.76604) and their distance to the claimant is below
    merge_dist_factor * cell_size * min radius. Takes the keyframe's
    global_T_frame pose and inverts internally (same round-5 fix as
    occupied_cells: the pre-fix code projected with the non-inverted pose).
    """
    h, w = depth.shape
    hc, wc = h // cell_size, w // cell_size
    ftg = se3.inverse(se3.SE3(kf_q, kf_t))
    assoc = _associate(smap, cam, ftg.q, ftg.t, depth, f_nx, f_ny, baseline_fx)
    cell = jnp.where(assoc.valid, _cell_index(assoc.px, assoc.py, cell_size, wc), 0)
    n = smap.capacity
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    cell_merge_dist_sq = (cell_size * merge_dist_factor) ** 2

    remaining = assoc.valid
    valid = smap.valid
    for _ in range(MERGE_SLOT_COUNT):
        winner_per_cell = jnp.full((hc * wc,), _BIG, jnp.int32)
        winner_per_cell = winner_per_cell.at[cell].min(
            jnp.where(remaining, idx, _BIG)
        )
        my_winner = winner_per_cell[cell]
        is_winner = remaining & (my_winner == idx)
        loser = remaining & ~is_winner & (my_winner < _BIG)

        wn = smap.normal[jnp.clip(my_winner, 0, n - 1)]
        wp = smap.pos[jnp.clip(my_winner, 0, n - 1)]
        wr2 = smap.radius2[jnp.clip(my_winner, 0, n - 1)]
        normal_agree = (
            jnp.sum(smap.normal * wn, axis=-1)
            > robust.COS_NORMAL_COMPATIBILITY_THRESHOLD
        )
        dist_sq = jnp.sum((smap.pos - wp) ** 2, axis=-1)
        min_r2 = jnp.minimum(smap.radius2, wr2)
        merged = loser & normal_agree & (dist_sq < min_r2 * cell_merge_dist_sq)

        valid = valid & ~merged
        remaining = loser & ~merged  # survivors compete for the next slot

    deleted = jnp.sum(smap.valid & ~valid)
    return smap._replace(
        valid=valid,
        active=smap.active & valid,
        count=smap.count - deleted.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Surfel creation
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "cell_size", "filter_new_surfels"),
)
def create_surfels_for_keyframe(
    smap: SurfelMap,
    cam: PinholeCamera,
    kf_q, kf_t,              # global_T_frame of the new keyframe
    depth, f_nx, f_ny, radius2, intensity,  # keyframe planes [H, W]
    covis: KeyframeStack,    # covisible keyframes (global_T_frame poses)
    min_observation_count,   # traced scalar (bootstrapping-aware)
    baseline_fx: float,
    cell_size: int,
    filter_new_surfels: bool = True,
    rgb=None,                # optional [H, W, 3] color plane (u8 or f32)
) -> Tuple[SurfelMap, jax.Array]:
    """Create new surfels for unsupported cells of a keyframe.

    Pipeline per DirectBA::CreateSurfelsForKeyframe (direct_ba.cc:340-405):
    supporting-surfel gate -> one candidate pixel per sparsification cell
    (deterministic: lowest pixel index, vs the reference's atomicCAS race,
    kernel_create_surfels.cu:41-72) -> observation / free-space-violation
    counting against covisible keyframes -> filtered init + append.

    Returns (new_map, number_of_created_surfels).
    """
    h, w = depth.shape
    hc, wc = h // cell_size, w // cell_size
    n = smap.capacity
    dtype = smap.pos.dtype

    # --- supporting cells from the existing map ---
    occ = occupied_cells(
        smap, cam, kf_q, kf_t, depth, f_nx, f_ny, baseline_fx, cell_size
    ).reshape(-1)

    # --- candidate pixel per cell ---
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flag = (
        (depth > 0)
        & (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    )
    lin = ys * w + xs
    pri = jnp.where(flag, lin, _BIG)
    # [Hc, cs, Wc, cs] -> min linear index per cell
    pri_cells = (
        pri[: hc * cell_size, : wc * cell_size]
        .reshape(hc, cell_size, wc, cell_size)
        .transpose(0, 2, 1, 3)
        .reshape(hc * wc, cell_size * cell_size)
    )
    best = jnp.min(pri_cells, axis=-1)
    cand_valid = (best < _BIG) & ~occ
    best_safe = jnp.where(cand_valid, best, 0)
    cy = best_safe // w
    cx = best_safe - cy * w

    # --- candidate geometry (global frame) ---
    c_depth = gather_nearest(depth, cx, cy)
    un_x = cam.fx_inv * cx.astype(dtype) + cam.cx_inv
    un_y = cam.fy_inv * cy.astype(dtype) + cam.cy_inv
    p_local = jnp.stack([c_depth * un_x, c_depth * un_y, c_depth], axis=-1)
    R_g = se3.quat_to_matrix(kf_q)
    p_global = transform3(R_g, kf_t, p_local)

    c_nx = gather_nearest(f_nx, cx, cy)
    c_ny = gather_nearest(f_ny, cx, cy)
    c_nz = normal_z(c_nx, c_ny)
    n_local = jnp.stack([c_nx, c_ny, c_nz], axis=-1)
    n_global = rotate3(R_g, n_local)

    c_radius2 = gather_nearest(radius2, cx, cy)

    # --- observation / free-space-violation counting vs covisible KFs ---
    if filter_new_surfels:
        obs0 = jnp.ones_like(best, jnp.int32)  # self-observation
        fsv0 = jnp.zeros_like(best, jnp.int32)

        def count_one(carry, kf):
            obs, fsv = carry
            (c_depths, c_fnx, c_fny, cq, ct, cmask) = kf
            ftg = se3.inverse(se3.SE3(cq, ct))
            a = associate_surfels_with_frame(
                cam, p_global, n_global, cand_valid, ftg.q, ftg.t,
                c_depths, c_fnx, c_fny, baseline_fx,
            )
            obs = obs + (a.valid & cmask).astype(jnp.int32)
            fsv = fsv + (a.free_space_violation & cmask).astype(jnp.int32)
            return (obs, fsv), None

        (obs, fsv), _ = jax.lax.scan(
            count_one,
            (obs0, fsv0),
            (covis.depth, covis.nx, covis.ny, covis.q, covis.t, covis.mask),
        )
        keep = cand_valid & (obs >= min_observation_count) & (fsv <= obs)
    else:
        keep = cand_valid

    # --- descriptor init via tangent projections into the own keyframe ---
    ftg_own = se3.inverse(se3.SE3(kf_q, kf_t))
    t1x, t1y, t2x, t2y, t_ok = tangent_projections(
        p_global, n_global, c_radius2, ftg_own.q, ftg_own.t, cam
    )
    c_pxy_x = cx.astype(dtype) + 0.5
    c_pxy_y = cy.astype(dtype) + 0.5
    i_c = bilinear(intensity, c_pxy_x, c_pxy_y)
    i_t1 = bilinear(intensity, t1x, t1y)
    i_t2 = bilinear(intensity, t2x, t2y)
    desc1 = 180.0 * (i_t1 - i_c)
    desc2 = 180.0 * (i_t2 - i_c)

    # Creation-time color: real RGB sampled at the candidate pixel when the
    # keyframe retains a color plane (CreateSurfelsCUDA inits color from the
    # color texture, kernel_create_surfels.cu); gray fallback otherwise.
    if rgb is not None:
        rgbf = rgb.astype(dtype)
        c_color = jnp.stack(
            [bilinear(rgbf[..., ch], c_pxy_x, c_pxy_y) for ch in range(3)],
            axis=-1,
        )
    else:
        gray = 255.0 * i_c
        c_color = jnp.stack([gray, gray, gray], axis=-1)

    # --- append (overflow-safe) ---
    order = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = smap.count + order
    ok = keep & (dest < n)
    dest_safe = jnp.where(ok, dest, n - 1)  # dumped writes masked below

    def scatter(arr, values):
        return arr.at[dest_safe].set(
            jnp.where(ok.reshape((-1,) + (1,) * (values.ndim - 1)), values,
                      arr[dest_safe])
        )

    new_map = SurfelMap(
        pos=scatter(smap.pos, p_global),
        normal=scatter(smap.normal, n_global),
        radius2=scatter(smap.radius2, c_radius2),
        color=scatter(smap.color, c_color),
        desc=scatter(smap.desc, jnp.stack([desc1, desc2], axis=-1)),
        valid=scatter(smap.valid, ok),
        active=scatter(smap.active, ok),  # new surfels start active
        count=smap.count + jnp.sum(ok.astype(jnp.int32)),
    )
    return new_map, jnp.sum(ok.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Activation, deletion, compaction
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("baseline_fx",))
def update_surfel_activation(
    smap: SurfelMap, cam: PinholeCamera, kstack: KeyframeStack,
    baseline_fx: float,
) -> SurfelMap:
    """Surfel is active iff associated with any keyframe in `kstack`
    (UpdateSurfelActivationCUDA, kernel_surfel_activation.cu:38-96).
    Callers pass the stack of Active keyframes. Implemented as the
    activation half of the chunk-batched fused pass (geometry_opt):
    the surfel arrays are read once per keyframe CHUNK, not per keyframe."""
    from badslam_tpu.ba.geometry_opt import update_activation_and_normals

    return update_activation_and_normals(
        smap, cam, kstack, kstack.mask, kstack.mask, baseline_fx,
        update_normals=False)


@functools.partial(jax.jit, static_argnames=("baseline_fx",))
def delete_surfels_and_update_radii(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    min_observation_count,
    baseline_fx: float,
) -> SurfelMap:
    """Delete under-observed / free-space-violating surfels; shrink radii.

    Rebuild of DeleteSurfelsAndUpdateRadiiCUDA (kernel_delete_surfels.cu):
    count observations and free-space violations over the given keyframes;
    delete if obs < min_observation_count or fsv > obs; otherwise set
    radius^2 to the min observed pixel radius^2.
    """

    def body(carry, kf):
        obs, fsv, r2 = carry
        (d, fx_, fy_, rad, q, t, m) = kf
        ftg = se3.inverse(se3.SE3(q, t))
        a = _associate(smap, cam, ftg.q, ftg.t, d, fx_, fy_, baseline_fx)
        hit = a.valid & m
        obs = obs + hit.astype(jnp.int32)
        fsv = fsv + (a.free_space_violation & m).astype(jnp.int32)
        pr2 = gather_nearest(rad, a.px, a.py)
        r2 = jnp.where(hit, jnp.minimum(r2, pr2), r2)
        return (obs, fsv, r2), None

    n = smap.capacity
    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), jnp.inf, smap.radius2.dtype),
    )
    (obs, fsv, min_r2), _ = jax.lax.scan(
        body, init,
        (kstack.depth, kstack.nx, kstack.ny, kstack.radius2,
         kstack.q, kstack.t, kstack.mask),
    )
    delete = smap.valid & ((obs < min_observation_count) | (fsv > obs))
    new_valid = smap.valid & ~delete
    new_r2 = jnp.where(
        new_valid & jnp.isfinite(min_r2), min_r2, smap.radius2
    )
    return smap._replace(
        valid=new_valid,
        active=smap.active & new_valid,
        radius2=new_r2,
        count=smap.count - jnp.sum(delete.astype(jnp.int32)),
    )


@jax.jit
def compact_surfels(smap: SurfelMap) -> SurfelMap:
    """Pack valid surfels to the array prefix (CompactSurfelsCUDA analog).

    One cumsum + scatter permutation; deterministic, preserves relative
    order of survivors (the reference moves tail surfels into holes,
    scrambling order — nothing depends on it).
    """
    n = smap.capacity
    v = smap.valid
    rank_valid = jnp.cumsum(v.astype(jnp.int32)) - 1
    num_valid = smap.count
    rank_invalid = jnp.cumsum((~v).astype(jnp.int32)) - 1
    dest = jnp.where(v, rank_valid, num_valid + rank_invalid)

    def permute(arr):
        out = jnp.zeros_like(arr)
        return out.at[dest].set(arr)

    return SurfelMap(
        pos=permute(smap.pos),
        normal=permute(smap.normal),
        radius2=permute(smap.radius2),
        color=permute(smap.color),
        desc=permute(smap.desc),
        valid=permute(smap.valid),
        active=permute(smap.active),
        count=smap.count,
    )


# ---------------------------------------------------------------------------
# Batched (masked) per-keyframe creation / merge — one jitted program for the
# whole keyframe axis, replacing the reference's host loop of kernel launches
# (direct_ba_alternating.cc:397-430; SURVEY.md §7 decision 2). Host control
# flow never reads device values: which keyframes create/merge is a device
# mask computed from device-resident activation state.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "cell_size", "filter_new_surfels"),
)
def create_surfels_for_keyframes(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,       # full-capacity stack; kstack.mask = valid
    radius2_stack: jax.Array,    # [K, H, W]
    create_mask: jax.Array,      # [K] bool — keyframes to create surfels for
    covis_matrix: jax.Array,     # [K, K] bool
    min_observation_count,       # traced scalar
    baseline_fx: float,
    cell_size: int,
    filter_new_surfels: bool = True,
    rgb_stack: jax.Array | None = None,  # optional [K, H, W, 3] color planes
) -> Tuple[SurfelMap, jax.Array]:
    """Create surfels for every masked keyframe (scan with per-step cond)."""

    k = kstack.depth.shape[0]

    def body(smap_, inputs):
        if rgb_stack is None:
            (idx,) = inputs
            rgb = None
        else:
            (idx, rgb) = inputs

        def run(smap_):
            covis_mask = covis_matrix[idx] & kstack.mask
            covis = KeyframeStack(
                kstack.depth, kstack.nx, kstack.ny, kstack.radius2,
                kstack.intensity, kstack.q, kstack.t, covis_mask,
            )
            new_map, created = create_surfels_for_keyframe.__wrapped__(
                smap_, cam,
                kstack.q[idx], kstack.t[idx],
                kstack.depth[idx], kstack.nx[idx], kstack.ny[idx],
                radius2_stack[idx], kstack.intensity[idx],
                covis, min_observation_count,
                baseline_fx, cell_size, filter_new_surfels,
                rgb=rgb,
            )
            return new_map, created

        smap_, created = jax.lax.cond(
            create_mask[idx], run,
            lambda m: (m, jnp.zeros((), jnp.int32)), smap_,
        )
        return smap_, created

    ids = jnp.arange(k, dtype=jnp.int32)
    xs = (ids,) if rgb_stack is None else (ids, rgb_stack)
    smap, created = jax.lax.scan(body, smap, xs)
    return smap, jnp.sum(created)


@functools.partial(jax.jit, static_argnames=("baseline_fx", "cell_size"))
def merge_surfels_for_keyframes(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    merge_mask: jax.Array,   # [K] bool
    baseline_fx: float,
    cell_size: int,
    merge_dist_factor: float = 0.8,
) -> SurfelMap:
    """Run the supporting-surfels merge pass for every masked keyframe."""

    k = kstack.depth.shape[0]

    def body(smap_, inputs):
        (idx,) = inputs

        def run(smap_):
            return merge_surfels_for_frame.__wrapped__(
                smap_, cam,
                kstack.q[idx], kstack.t[idx],
                kstack.depth[idx], kstack.nx[idx], kstack.ny[idx],
                baseline_fx, cell_size, merge_dist_factor,
            )

        return jax.lax.cond(merge_mask[idx], run, lambda m: m, smap_), None

    ids = jnp.arange(k, dtype=jnp.int32)
    smap, _ = jax.lax.scan(body, smap, (ids,))
    return smap


@functools.partial(jax.jit, static_argnames=("baseline_fx",))
def assign_colors(
    smap: SurfelMap,
    cam: PinholeCamera,
    kstack: KeyframeStack,
    rgb_stack: jax.Array,   # [K, H, W, 3] keyframe color planes (u8 or f32)
    baseline_fx: float,
) -> SurfelMap:
    """Refresh surfel colors: average the color of every keyframe pixel each
    surfel is associated with (AssignColorsCUDA analog, kernels.h:301-308,
    kernel_assign_colors.cu:73-131). Bilinear color sample at the float
    projection, accumulate count+RGB over all masked keyframes, then mean.
    Surfels with zero observations keep their creation-time color."""
    dtype = smap.color.dtype

    def body(carry, kf):
        cnt, acc = carry
        (d, fx_, fy_, q, t, m, rgb) = kf
        ftg = se3.inverse(se3.SE3(q, t))
        a = _associate(smap, cam, ftg.q, ftg.t, d, fx_, fy_, baseline_fx)
        hit = a.valid & m
        rgbf = rgb.astype(dtype)
        sample = jnp.stack(
            [bilinear(rgbf[..., ch], a.pxy_x, a.pxy_y) for ch in range(3)],
            axis=-1,
        )
        cnt = cnt + hit.astype(dtype)
        acc = acc + jnp.where(hit[:, None], sample, 0.0)
        return (cnt, acc), None

    n = smap.capacity
    (cnt, acc), _ = jax.lax.scan(
        body,
        (jnp.zeros((n,), dtype), jnp.zeros((n, 3), dtype)),
        (kstack.depth, kstack.nx, kstack.ny, kstack.q, kstack.t, kstack.mask,
         rgb_stack),
    )
    observed = cnt > 0
    mean = acc / jnp.maximum(cnt, 1.0)[:, None]
    return smap._replace(
        color=jnp.where((smap.valid & observed)[:, None], mean, smap.color)
    )


@jax.jit
def assign_descriptor_colors(smap: SurfelMap) -> SurfelMap:
    """Debug visualization: map the two descriptor components to RG channels
    with contrast stretch (AssignDescriptorColorsCUDA analog,
    kernel_assign_colors.cu:233-258: descriptor/180 -> sign*|d|^0.35 ->
    255.99*(0.5*d+0.5), blue fixed at 127)."""

    def stretch(d):
        d = d / 180.0
        d = jnp.sign(d) * jnp.abs(d) ** 0.35
        return jnp.clip(255.99 * (0.5 * d + 0.5), 0.0, 255.0)

    r = stretch(smap.desc[:, 0])
    g = stretch(smap.desc[:, 1])
    b = jnp.full_like(r, 127.0)
    return smap._replace(color=jnp.stack([r, g, b], axis=-1))


@jax.jit
def debug_verify_surfel_count(smap: SurfelMap) -> jax.Array:
    """DEVICE-side consistency check (DebugVerifySurfelCount analog,
    kernel_verify_count.cu): True iff the tracked count equals the number
    of set validity bits. Returns a device bool — assert on it only in
    tests/offline tooling (reading it is a sync)."""
    return jnp.sum(smap.valid.astype(jnp.int32)) == smap.count
