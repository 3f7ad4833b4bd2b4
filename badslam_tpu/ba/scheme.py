"""DirectBA: map state owner + the alternating bundle-adjustment scheme.

TPU rebuild of the reference back-end
(/root/reference/applications/badslam/src/badslam/direct_ba.h:65-550,
direct_ba.cc, direct_ba_alternating.cc:285-738). The host drives only the
ITERATION STRUCTURE (fixed counts, capacities); every value-dependent
decision — which keyframes are active/covisible, which create surfels,
which moved — lives in device-resident masks updated by jitted programs.
The steady-state loop performs ZERO device→host reads (PERF_NOTES.md).

Per BA iteration (BundleAdjustmentAlternating order):
  surfel creation (newly-activated KFs, batched scan) -> surfel activation
  -> geometry optimization -> surfel merge + compaction -> batched per-KF
  pose optimization + keyframe re-activation -> optional intrinsics step.

Deviation from the reference: the all-keyframes-converged early exit
(direct_ba_alternating.cc:692-701) requires reading the activation values;
we run the fixed `max_iterations` instead (the wall-clock `time_limit`
check, which is host-only, is kept).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.mapping import keyframes as kfs
from badslam_tpu.mapping import surfels as sf
from badslam_tpu.mapping.keyframes import KeyframeStore
from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
from badslam_tpu.ba.intrinsics_opt import (
    DepthParams,
    empty_depth_params,
    optimize_intrinsics,
)
from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
from badslam_tpu.ops.preprocess import ProcessedFrame
from badslam_tpu.utils.timing import Timing

ACTIVE = kfs.ACTIVE
INACTIVE = kfs.INACTIVE


def _backend_tolerates_readbacks() -> bool:
    """False on the axon TPU relay, where ONE device->host value read
    permanently degrades the session to per-kernel sync (~1000x,
    PERF_NOTES.md). All opt-in sync paths must check this.

    NOTE: the axon plugin registers its platform as plain "tpu"
    (jax.default_backend() == "tpu"), so detection goes through the
    jax_platforms CONFIG string, which sitecustomize sets to "axon,cpu".
    Verified empirically: with the wrong check, one surfel-count read made
    odometry steps jump 0.3ms -> 32ms for the rest of the session."""
    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:
        platforms = ""
    return "axon" not in platforms


@jax.jit
def _begin_iteration_masks(valid, activation, last_active, last_covis,
                           ba_iter):
    """Device bookkeeping for one BA iteration: which keyframes get surfels
    created (first time ACTIVE in this BA block) and the updated counters
    (direct_ba_alternating.cc:397-430)."""
    newly_active = valid & (activation == kfs.ACTIVE) & (last_active != ba_iter)
    newly_covis = (
        valid & (activation == kfs.COVISIBLE_ACTIVE) & (last_covis != ba_iter)
    )
    last_active = jnp.where(newly_active, ba_iter, last_active)
    last_covis = jnp.where(newly_covis, ba_iter, last_covis)
    return newly_active, last_active, last_covis


@jax.jit
def _reactivation(activation, participating, moved):
    """Keyframes that moved stay ACTIVE, converged ones go INACTIVE
    (direct_ba_alternating.cc:562-574)."""
    return jnp.where(
        participating,
        jnp.where(moved, kfs.ACTIVE, kfs.INACTIVE),
        activation,
    )


# ---------------------------------------------------------------------------
# Fused BA iteration: the whole alternating-scheme iteration (masks ->
# creation -> activation -> geometry -> merge -> compact -> pose opt ->
# reactivation -> covisibility propagation) as ONE jitted program.
#
# The TPU relay charges ~2.5-3 ms per program submission once its queue is
# deep (measured, tools/probe_frame_phases.py vs probe_frame_amortized.py),
# so the per-stage dispatch structure — fine on a local device — caps the
# full-SLAM loop. One program per iteration also lets XLA overlap stages.
# This also realizes SURVEY §7 hard-part #4 (few large jitted calls).
# ---------------------------------------------------------------------------


def _iteration_core(
    smap,
    cam,
    depth_s, nx_s, ny_s, radius2_s, intensity_s, rgb_s,
    q_s, t_s, valid, activation, last_active, last_covis, covis,
    ba_iter, min_obs,
    *,
    baseline_fx: float,
    cell_size: int,
    merge_dist_factor: float,
    use_depth: bool,
    use_descriptor: bool,
    optimize_geometry: bool,
    do_surfel_updates: bool,
    optimize_poses: bool,
    pose_iterations: int,
    activate_all: bool = False,
):
    """One alternating-BA iteration (BundleAdjustmentAlternating body,
    direct_ba_alternating.cc:345-626) as pure traced computation; wrapped
    by `_ba_iteration` (single program) and `_ba_iterations` (device
    while_loop over iterations with read-free convergence exit).

    With `activate_all` (disable_deactivation=true, the reference DEFAULT:
    bad_slam.cc:268-269 passes window [0, K-1], and
    direct_ba_alternating.cc:355-372 then re-activates every keyframe at
    the START of every iteration), all valid keyframes participate in every
    iteration; pose opt's moved-based re-activation still runs afterwards,
    which is what the all-converged early exit observes."""
    from badslam_tpu.mapping.keyframes import KeyframeStack

    if activate_all:
        activation = jnp.where(valid, jnp.int32(kfs.ACTIVE),
                               jnp.int32(kfs.INACTIVE))
    newly_active = valid & (activation == kfs.ACTIVE) & (last_active != ba_iter)
    newly_covis = (
        valid & (activation == kfs.COVISIBLE_ACTIVE) & (last_covis != ba_iter)
    )
    last_active = jnp.where(newly_active, ba_iter, last_active)
    last_covis = jnp.where(newly_covis, ba_iter, last_covis)
    create_mask = newly_active

    full_stack = KeyframeStack(
        depth_s, nx_s, ny_s, radius2_s, intensity_s, q_s, t_s, valid)

    if optimize_geometry and do_surfel_updates:
        smap, _ = sf.create_surfels_for_keyframes.__wrapped__(
            smap, cam, full_stack, radius2_s, create_mask, covis, min_obs,
            baseline_fx=baseline_fx, cell_size=cell_size,
            filter_new_surfels=True, rgb_stack=rgb_s,
        )

    active_strict = valid & (activation == kfs.ACTIVE)
    participating = valid & (
        (activation == kfs.ACTIVE) | (activation == kfs.COVISIBLE_ACTIVE)
    )
    kstack = full_stack._replace(mask=participating)

    # Activation + geometry step (a) normals share ONE association pass
    # over the keyframe planes (round-3 verdict #3: each stage used to
    # re-associate every surfel with every plane).
    from badslam_tpu.ba.geometry_opt import (
        _position_step,
        update_activation_and_normals,
    )

    smap = update_activation_and_normals(
        smap, cam, full_stack, active_strict, participating,
        baseline_fx=baseline_fx, update_normals=optimize_geometry)

    if optimize_geometry:
        smap = _position_step(
            smap, cam, kstack, baseline_fx=baseline_fx,
            use_depth=use_depth, use_descriptor=use_descriptor,
        )

    if do_surfel_updates:
        smap = sf.merge_surfels_for_keyframes.__wrapped__(
            smap, cam, full_stack, create_mask, baseline_fx=baseline_fx,
            cell_size=cell_size, merge_dist_factor=merge_dist_factor,
        )
        smap = sf.compact_surfels.__wrapped__(smap)

    if optimize_poses:
        result = optimize_keyframe_poses.__wrapped__(
            smap, cam, kstack, baseline_fx=baseline_fx,
            use_depth=use_depth, use_descriptor=use_descriptor,
            max_iterations=pose_iterations,
        )
        k = result.q.shape[0]
        q_s = q_s.at[:k].set(
            jnp.where(participating[:, None], result.q, q_s[:k]))
        t_s = t_s.at[:k].set(
            jnp.where(participating[:, None], result.t, t_s[:k]))
        activation = jnp.where(
            participating,
            jnp.where(result.moved, kfs.ACTIVE, kfs.INACTIVE),
            activation,
        )

    activation = kfs._propagate_covisible_active.__wrapped__(
        covis, activation, valid)
    return smap, q_s, t_s, activation, last_active, last_covis


_BA_STATICS = ("baseline_fx", "cell_size", "merge_dist_factor",
               "use_depth", "use_descriptor", "optimize_geometry",
               "do_surfel_updates", "optimize_poses", "pose_iterations",
               "activate_all")


@functools.partial(jax.jit, static_argnames=_BA_STATICS, donate_argnums=(0,))
def _ba_iteration(smap, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s,
                  rgb_s, q_s, t_s, valid, activation, last_active,
                  last_covis, covis, ba_iter, min_obs, **statics):
    """One BA iteration as a single XLA program. The surfel map is donated
    (updated in place); keyframe poses are NOT donated — callers hold the
    pre-BA snapshot for trajectory deformation."""
    return _iteration_core(
        smap, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s, rgb_s,
        q_s, t_s, valid, activation, last_active, last_covis, covis,
        ba_iter, min_obs, **statics)


def _iterations_while(smap, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s,
                      rgb_s, q_s, t_s, valid, activation, last_active,
                      last_covis, covis, ba_iter, min_obs,
                      max_iterations: int, statics):
    """Up to `max_iterations` BA iterations, with the reference's
    all-keyframes-converged early exit (direct_ba_alternating.cc:692-701)
    evaluated ON DEVICE — read-free, unlike the host-synced
    `sync_convergence_checks` path. A lax.while_loop predicate
    (`i < max && any keyframe ACTIVE`) replaces the reference's
    per-iteration host check; converged calls cost one predicate
    evaluation instead of a full iteration. Shared by the full-capacity
    and keyframe-bucketed program wrappers."""

    def cond(state):
        i, _, _, _, act, _, _ = state
        return (i < max_iterations) & jnp.any(valid & (act == kfs.ACTIVE))

    def body(state):
        i, m, q, t, act, la, lc = state
        m, q, t, act, la, lc = _iteration_core(
            m, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s, rgb_s,
            q, t, valid, act, la, lc, covis, ba_iter, min_obs, **statics)
        return (i + 1, m, q, t, act, la, lc)

    if statics.get("activate_all"):
        # The while predicate runs BEFORE the first body; with the
        # activate-all window the reference always enters iteration 0
        # (re-activation happens at iteration start), so seed the loop
        # with every valid keyframe active.
        activation = jnp.where(valid, jnp.int32(kfs.ACTIVE),
                               jnp.int32(kfs.INACTIVE))
    state = (jnp.int32(0), smap, q_s, t_s, activation, last_active,
             last_covis)
    i, smap, q_s, t_s, activation, last_active, last_covis = (
        jax.lax.while_loop(cond, body, state))
    return smap, q_s, t_s, activation, last_active, last_covis, i


@functools.partial(jax.jit, static_argnames=_BA_STATICS,
                   donate_argnums=(0,))
def _ba_iterations(smap, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s,
                   rgb_s, q_s, t_s, valid, activation, last_active,
                   last_covis, covis, ba_iter, min_obs, *,
                   max_iterations, **statics):
    """All iterations over the FULL keyframe capacity in one program.

    `max_iterations` is TRACED (it only feeds the while_loop predicate):
    the parallel-BA drain calls this with a queue-depth-dependent count
    (1..2*chunk), and a static count compiled one ~25-50 s relay program
    PER DISTINCT VALUE per keyframe rung — measured landing mid-run in
    the round-4 long-run bench (BA-iterations max 52.2 s in the timed
    pass, the dominant cause of its 360->19 FPS segment collapse)."""
    return _iterations_while(
        smap, cam, depth_s, nx_s, ny_s, radius2_s, intensity_s, rgb_s,
        q_s, t_s, valid, activation, last_active, last_covis, covis,
        ba_iter, min_obs, max_iterations, statics)


@functools.partial(jax.jit, static_argnames=_BA_STATICS,
                   donate_argnums=(0,))
def _ba_iterations_bucketed(smap, cam, sel, depth_s, nx_s, ny_s, radius2_s,
                            intensity_s, rgb_s, q_s, t_s, valid, activation,
                            last_active, last_covis, covis, ba_iter, min_obs,
                            *, max_iterations, **statics):
    """Keyframe-bucketed BA program: gather the live keyframes into a dense
    pow-2 substack (`sel` [B] slot ids — live slots first, padded with
    DISTINCT dead slot ids so the scatter back is an injection), run all
    iterations on the [B] axis, scatter poses/activation/counters back.

    This is the keyframe analog of the surfel high-water slice
    (`_slice_map`): each fused iteration costs O(live keyframes), not
    O(capacity) — the reference loops only over active keyframes
    (direct_ba_alternating.cc:543-577). Gather/scatter cost one pass over
    the planes per BA CALL, amortized over all iterations inside."""
    g = lambda a: a[sel]
    out = _iterations_while(
        smap, cam, g(depth_s), g(nx_s), g(ny_s), g(radius2_s),
        g(intensity_s), g(rgb_s), g(q_s), g(t_s), g(valid), g(activation),
        g(last_active), g(last_covis), covis[sel][:, sel],
        ba_iter, min_obs, max_iterations, statics)
    smap, q_b, t_b, act_b, la_b, lc_b, i = out
    return (smap,
            q_s.at[sel].set(q_b), t_s.at[sel].set(t_b),
            activation.at[sel].set(act_b),
            last_active.at[sel].set(la_b), last_covis.at[sel].set(lc_b), i)


@functools.partial(
    jax.jit,
    static_argnames=("baseline_fx", "cell_size", "merge_dist_factor",
                     "do_surfel_updates"),
    donate_argnums=(0,),
)
def _scheme_end_tasks(
    smap,
    cam,
    depth_s, nx_s, ny_s, radius2_s, intensity_s,
    q_s, t_s, valid, last_active, ba_iter, min_obs,
    sel=None,
    *,
    baseline_fx: float,
    cell_size: int,
    merge_dist_factor: float,
    do_surfel_updates: bool,
):
    """PerformBASchemeEndTasks (direct_ba.cc:566-653) as one program:
    final merge over this block's active keyframes + delete + compact.
    With `sel` the keyframe axis is gathered to the live bucket first
    (inside this same program — no extra dispatches)."""
    from badslam_tpu.mapping.keyframes import KeyframeStack

    if sel is not None:
        (depth_s, nx_s, ny_s, radius2_s, intensity_s, q_s, t_s, valid,
         last_active) = (a[sel] for a in (
            depth_s, nx_s, ny_s, radius2_s, intensity_s, q_s, t_s, valid,
            last_active))
    full_stack = KeyframeStack(
        depth_s, nx_s, ny_s, radius2_s, intensity_s, q_s, t_s, valid)
    if do_surfel_updates:
        recently_active = valid & (last_active == ba_iter)
        smap = sf.merge_surfels_for_keyframes.__wrapped__(
            smap, cam, full_stack, recently_active, baseline_fx=baseline_fx,
            cell_size=cell_size, merge_dist_factor=merge_dist_factor,
        )
    smap = sf.delete_surfels_and_update_radii.__wrapped__(
        smap, cam, full_stack, min_obs, baseline_fx=baseline_fx,
    )
    return sf.compact_surfels.__wrapped__(smap)


@functools.partial(jax.jit, static_argnames=("bucket",))
def _slice_map(smap, *, bucket: int):
    """High-water working slice of the surfel map (one program)."""
    return jax.tree.map(
        lambda a: a[:bucket] if getattr(a, "ndim", 0) > 0 else a, smap)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_back_map(full, view):
    """Write the worked-on slice back into the full-capacity map
    (donated: in-place on device)."""
    b = view.pos.shape[0]
    return full._replace(
        pos=full.pos.at[:b].set(view.pos),
        normal=full.normal.at[:b].set(view.normal),
        radius2=full.radius2.at[:b].set(view.radius2),
        color=full.color.at[:b].set(view.color),
        desc=full.desc.at[:b].set(view.desc),
        valid=full.valid.at[:b].set(view.valid),
        active=full.active.at[:b].set(view.active),
        count=view.count,
    )


class DirectBA:
    def __init__(
        self,
        cam: PinholeCamera,
        config: Optional[BadSlamConfig] = None,
        surfel_capacity: Optional[int] = None,
    ):
        self.config = config or BadSlamConfig()
        self.cam = cam
        cap = surfel_capacity or self.config.max_surfel_count
        self.surfels = sf.empty_map(cap)
        self.keyframes = KeyframeStore(
            cam=cam, capacity=self.config.keyframe_bucket_base
        )
        self.ba_iteration_count = 0
        self.last_ba_iteration_count = -1
        # Depth-deformation self-calibration state (DepthParameters analog).
        self.depth_params: DepthParams = empty_depth_params(
            cam.height, cam.width, self.config.sparse_surfel_cell_size
        )
        self.intrinsics_updated = False
        # Host-side upper bound on the surfel count ("surfels_size_" analog,
        # kernels.cuh:69-93): grown pessimistically on creation (once per
        # BA epoch), resynced from the device once per BA call when
        # sync_surfel_bucket is on AND the backend tolerates readbacks.
        # `prebudget_epochs(e)` pre-sizes the bound for the first e epochs
        # up front (frontends with a known dataset length use it so the
        # bucket — and therefore every BA program shape — is fixed for the
        # whole run; each bucket growth is a full recompile of the fused
        # BA programs, minutes each through the relay).
        self.known_surfel_bound = 0
        self._bound_epoch = -1
        self._prebudgeted_epochs = 0
        # Per-BA-run timing rows (SetSaveTimings analog, direct_ba.h:382;
        # rows mirror direct_ba_alternating.cc:630-688). The fused path
        # writes one synced row per BA call; combine with
        # sync_stage_profiling for true per-stage rows.
        self.timings_stream = None
        self._mesh = None
        self._kf_bucket_floor = 0
        self._streaming = False  # plane-streamed multi-chip BA active

    def set_save_timings(self, stream) -> None:
        self.timings_stream = stream

    # ------------------------------------------------------------------
    # Multi-chip mesh (config.n_devices > 1): surfel-axis sharding
    # ------------------------------------------------------------------

    def _ba_mesh(self):
        """jax Mesh for the integrated multi-chip BA mode, or None.
        Cached; axis name "d" matches badslam_tpu.parallel.sharded."""
        n = self.config.n_devices
        if n is None or n <= 1:
            return None
        if self._mesh is None:
            from jax.sharding import Mesh

            devices = jax.devices()
            if len(devices) < n:
                raise RuntimeError(
                    f"config.n_devices={n} but only {len(devices)} jax "
                    f"devices are visible")
            self._mesh = Mesh(np.array(devices[:n]), ("d",))
        return self._mesh

    def _shard_for_ba(self, ks=None, stream_planes: bool = False):
        """Place the surfel map sharded over the mesh's surfel axis and
        (with `ks`) the keyframe store replicated — a no-op re-placement on
        subsequent calls. The SAME fused BA programs then run SPMD: XLA's
        partitioner inserts the psum/all-gather collectives (pose-opt H/b
        reductions over surfel shards, creation/merge scatters), per the
        annotate-shardings-and-let-XLA-partition recipe.

        With `stream_planes` (the over-budget regime, see
        `_plane_streaming_wanted`) the big keyframe PLANES are sharded over
        the keyframe axis instead of replicated — per-chip plane memory
        drops K -> K/D — and BA runs through the plane-streamed stage
        programs (parallel/streamed.py) instead of the fused program."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh
        shard = NamedSharding(mesh, P("d"))
        repl = NamedSharding(mesh, P())
        self.surfels = jax.device_put(
            self.surfels,
            jax.tree.map(
                lambda a: shard if getattr(a, "ndim", 0) >= 1 else repl,
                self.surfels),
        )
        if ks is None:
            return
        plane_names = ("depth", "nx", "ny", "radius2", "intensity", "rgb")
        for name in plane_names + (
                "q", "t", "valid", "activation", "covis",
                "last_active_iter", "last_covis_iter"):
            arr = getattr(ks, name)
            if arr is not None:
                want = shard if (stream_planes and name in plane_names) \
                    else repl
                setattr(ks, name, jax.device_put(arr, want))

    def _plane_streaming_wanted(self) -> bool:
        """True when the integrated multi-chip mode should stream keyframe
        planes instead of replicating them: the replicated-plane footprint
        (f32 depth/nx/ny/radius2/intensity + u8 rgb per pixel) exceeds
        config.plane_replication_budget_mb and the keyframe capacity
        divides the mesh. Host-only arithmetic — no device reads."""
        mesh = self._mesh
        if mesh is None:
            return False
        n = mesh.devices.size
        ks = self.keyframes
        if ks.capacity % n != 0 or self.surfels.capacity % n != 0:
            return False
        mb = ks.capacity * self.cam.height * self.cam.width * 23 / 1e6
        return mb > self.config.plane_replication_budget_mb

    @property
    def _stage_sync(self):
        """Lazy per-stage sync for Timing when sync_stage_profiling is on:
        block_until_ready on the state a stage produced (a sync, NOT a
        value read — safe on axon) so stage timers measure device time."""
        if not self.config.sync_stage_profiling:
            return None
        return lambda: (self.surfels.pos, self.surfels.valid,
                        self.keyframes.q, self.keyframes.activation)

    # ------------------------------------------------------------------
    # Keyframe management
    # ------------------------------------------------------------------

    @property
    def surfel_count(self) -> int:
        return int(self.surfels.count)  # device read — diagnostics only

    def add_keyframe(
        self, frame: ProcessedFrame, global_T_frame: se3.SE3,
        frame_index: int = -1,
    ) -> int:
        return self.keyframes.add_keyframe(frame, global_T_frame, frame_index)

    # ------------------------------------------------------------------
    # Surfel lifecycle
    # ------------------------------------------------------------------

    def min_observation_count(self) -> int:
        """Bootstrapping-aware filter from the HOST-known keyframe count."""
        return self.config.min_observation_count_at(self.keyframes.count)

    def _keyframe_bucket(self):
        """Gather plan for the keyframe-bucketed BA program: a [B] slot-id
        array (live slots first, padded with distinct non-live ids), or
        None to run at full capacity. Built from HOST metadata only
        (count/free_slots — value-free).

        Buckets only when B <= capacity/2: every distinct B is a fresh
        compile of the fused program (minutes through the relay), and a
        mostly-live store gains nothing from a gather pass."""
        ks = self.keyframes
        cap = ks.capacity
        live = ks.live_count
        disable_bucket = os.environ.get(
            "BADSLAM_DISABLE_KF_BUCKET", "0") not in ("", "0")
        if live == 0 or disable_bucket:
            # The env knob exists for D2H-wedge bisection on the relay
            # (PERF_NOTES.md): it forces the full-capacity programs so a
            # bench run can isolate whether the bucketed gather/scatter
            # programs are what wedges the post-run transfer path.
            return None
        # Pow-2 bucket ladder from keyframe_bucket_base: each fused BA call
        # runs on exactly the pow2(live) keyframe substack, so early-run BA
        # cost is O(live) — the reference loops only over active keyframes
        # (direct_ba_alternating.cc:543-577). Each rung is one fresh compile
        # of the fused programs (covered by the warmup pass / persistent
        # cache); `_kf_bucket_floor` is a high-water mark so the bucket
        # never SHRINKS after keyframe merging (a shrink-regrow bounce
        # would recompile with zero upside). Round 3 pinned the floor to
        # pow2(expected) up front, which deadlocked against the `cap // 2`
        # rule on pre-sized runs and made every call O(capacity) — the
        # ladder restores O(live) at the cost of one compile per rung.
        b = max(1, self.config.keyframe_bucket_base, self._kf_bucket_floor)
        while b < live:
            b *= 2
        if b > cap // 2:
            return None
        self._kf_bucket_floor = b
        free = ks.free_slot_set
        live_slots = [s for s in range(ks.count) if s not in free]
        pad = [s for s in range(cap)
               if s >= ks.count or s in free][: b - len(live_slots)]
        return jnp.array(np.array(live_slots + pad, np.int32))

    def prebudget_epochs(self, expected_keyframes: int) -> None:
        """Pre-size the pessimistic surfel bound for a run with a known
        keyframe budget: covers the first `expected_keyframes` BA epochs
        (each adds at most count * cells, count <= e), exactly matching
        what the incremental per-epoch growth would accumulate — so the
        pow-2 bucket, and with it every fused BA program shape, is fixed
        from the first frame. Epochs beyond the budget (final BA) resume
        incremental growth."""
        e = max(0, int(expected_keyframes))
        cells = self._cells_per_keyframe()
        self.known_surfel_bound = max(
            self.known_surfel_bound,
            min(cells * (e * (e + 1)) // 2, self.surfels.capacity),
        )
        self._prebudgeted_epochs = e
        # NOTE: the keyframe bucket is NOT pinned to pow2(e) — the ladder in
        # _keyframe_bucket keeps early-run BA O(live). (Round 3 pinned it,
        # which made pre-sized runs scan the full capacity from keyframe 1:
        # pow2(expected) == capacity tripped the cap//2 full-stack fallback.)

    def _cells_per_keyframe(self) -> int:
        c = self.config
        return ((self.cam.height // c.sparse_surfel_cell_size)
                * (self.cam.width // c.sparse_surfel_cell_size))

    def _bucket_size(self, needed: int) -> int:
        cap = self.surfels.capacity
        b = max(1, self.config.surfel_bucket_base)
        while b < needed and b < cap:
            b *= 2
        return min(b, cap)

    def create_surfels_for_keyframe(
        self, kf_id: int, filter_new_surfels: bool = True
    ):
        """Create surfels for one host-chosen keyframe id (bootstrap path).
        Returns the created count as a DEVICE scalar (callers must not read
        it in the hot loop)."""
        ks = self.keyframes
        mask = jnp.zeros((ks.capacity,), jnp.bool_).at[kf_id].set(True)
        self.known_surfel_bound += self._cells_per_keyframe()
        return self._create_surfels_masked(mask, filter_new_surfels)

    def _create_surfels_masked(self, create_mask, filter_new_surfels=True):
        ks = self.keyframes
        c = self.config
        self.surfels, created = sf.create_surfels_for_keyframes(
            self.surfels, self.cam, ks.stack(), ks.radius2,
            create_mask, ks.covis,
            jnp.int32(self.min_observation_count()),
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            filter_new_surfels=filter_new_surfels,
            rgb_stack=ks.rgb,
        )
        return created

    def _merge_surfels_masked(self, merge_mask) -> None:
        ks = self.keyframes
        c = self.config
        self.surfels = sf.merge_surfels_for_keyframes(
            self.surfels, self.cam, ks.stack(), merge_mask,
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            merge_dist_factor=c.surfel_merge_dist_factor,
        )

    def _run_iterations_streamed(
        self, max_iterations: int, optimize_geometry: bool,
        do_surfel_updates: bool, optimize_poses: bool, activate_all: bool,
    ) -> None:
        """`max_iterations` alternating-BA iterations through the
        plane-streamed multi-chip stage programs (parallel/streamed.py):
        keyframe planes stay sharded over the keyframe axis; each stage
        streams exactly the planes it needs over ICI. Same iteration
        structure as `_iteration_core` (creation -> activation+normals ->
        position -> merge -> compact -> pose opt -> covis propagation);
        iteration count is fixed (the read-free all-converged exit lives
        inside the fused single-chip program only)."""
        from badslam_tpu.parallel import streamed as st

        c = self.config
        ks = self.keyframes
        mesh = self._mesh
        for _ in range(max_iterations):
            if activate_all:
                ks.set_activation_window(0, ks.capacity - 1)
            create_mask, ks.last_active_iter, ks.last_covis_iter = (
                _begin_iteration_masks(
                    ks.valid, ks.activation, ks.last_active_iter,
                    ks.last_covis_iter, jnp.int32(self.ba_iteration_count)))
            if optimize_geometry and do_surfel_updates:
                self.surfels, _ = st.create_surfels_streamed(
                    mesh, self.surfels, self.cam,
                    ks.depth, ks.nx, ks.ny, ks.radius2, ks.intensity,
                    ks.rgb, ks.q, ks.t, create_mask, ks.covis, ks.valid,
                    jnp.int32(self.min_observation_count()),
                    baseline_fx=c.baseline_fx,
                    cell_size=c.sparse_surfel_cell_size,
                )
            active_strict = ks.active_mask(include_covisible=False)
            participating = ks.active_mask(include_covisible=True)
            self.surfels = st.activation_geometry_streamed(
                mesh, self.surfels, self.cam,
                ks.depth, ks.nx, ks.ny, ks.intensity, ks.q, ks.t,
                active_strict, participating,
                baseline_fx=c.baseline_fx,
                use_depth=c.use_geometric_residuals,
                use_descriptor=c.use_photometric_residuals,
                optimize_geometry=optimize_geometry,
            )
            if do_surfel_updates:
                self.surfels = st.merge_surfels_streamed(
                    mesh, self.surfels, self.cam,
                    ks.depth, ks.nx, ks.ny, ks.q, ks.t, create_mask,
                    baseline_fx=c.baseline_fx,
                    cell_size=c.sparse_surfel_cell_size,
                    merge_dist_factor=c.surfel_merge_dist_factor,
                )
                self.surfels = st.compact_surfels_streamed(
                    mesh, self.surfels)
            if optimize_poses:
                result = st.optimize_poses_streamed(
                    mesh, self.surfels, self.cam,
                    ks.depth, ks.nx, ks.ny, ks.radius2, ks.intensity,
                    ks.q, ks.t, participating,
                    baseline_fx=c.baseline_fx,
                    use_depth=c.use_geometric_residuals,
                    use_descriptor=c.use_photometric_residuals,
                    max_iterations=30,
                )
                ks.set_poses(result.q, result.t, participating)
                ks.activation = _reactivation(
                    ks.activation, participating, result.moved)
            ks.propagate_covisible_active()

    def perform_ba_scheme_end_tasks(self, do_surfel_updates: bool = True):
        """Final merge over this block's active KFs + delete + compact
        (PerformBASchemeEndTasks, direct_ba.cc:566-653) — one program,
        keyframe-bucketed like the iteration path (the delete pass counts
        observations over every keyframe). In the plane-streamed multi-chip
        mode the same three stages run as streamed programs instead."""
        ks = self.keyframes
        if ks.count == 0:
            return
        c = self.config
        if self._streaming:
            from badslam_tpu.parallel import streamed as st

            mesh = self._mesh
            if do_surfel_updates:
                recently_active = ks.valid & (
                    ks.last_active_iter == jnp.int32(self.ba_iteration_count))
                self.surfels = st.merge_surfels_streamed(
                    mesh, self.surfels, self.cam,
                    ks.depth, ks.nx, ks.ny, ks.q, ks.t, recently_active,
                    baseline_fx=c.baseline_fx,
                    cell_size=c.sparse_surfel_cell_size,
                    merge_dist_factor=c.surfel_merge_dist_factor,
                )
            self.surfels = st.delete_surfels_streamed(
                mesh, self.surfels, self.cam,
                ks.depth, ks.nx, ks.ny, ks.radius2, ks.q, ks.t, ks.valid,
                jnp.int32(self.min_observation_count()),
                baseline_fx=c.baseline_fx,
            )
            self.surfels = st.compact_surfels_streamed(mesh, self.surfels)
            return
        self.surfels = _scheme_end_tasks(
            self.surfels, self.cam,
            ks.depth, ks.nx, ks.ny, ks.radius2, ks.intensity,
            ks.q, ks.t, ks.valid, ks.last_active_iter,
            jnp.int32(self.ba_iteration_count),
            jnp.int32(self.min_observation_count()),
            self._keyframe_bucket(),
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            merge_dist_factor=c.surfel_merge_dist_factor,
            do_surfel_updates=do_surfel_updates,
        )

    # ------------------------------------------------------------------
    # Intrinsics / self-calibration
    # ------------------------------------------------------------------

    def optimize_intrinsics_step(
        self,
        optimize_depth_intrinsics: bool = True,
        optimize_color_intrinsics: bool = False,
    ) -> None:
        ks = self.keyframes
        if ks.count == 0:
            return
        c = self.config
        self.cam, self.depth_params = optimize_intrinsics(
            self.surfels, self.cam, ks.stack(), ks.stack_raw(),
            self.depth_params,
            baseline_fx=c.baseline_fx,
            cell_size=c.sparse_surfel_cell_size,
            optimize_depth=optimize_depth_intrinsics,
            optimize_color=optimize_color_intrinsics,
        )
        if optimize_depth_intrinsics:
            ks.recalibrate(
                self.cam, self.depth_params.a, self.depth_params.cfactor,
                c.sparse_surfel_cell_size,
            )
        self.intrinsics_updated = True

    # ------------------------------------------------------------------
    # The alternating BA scheme
    # ------------------------------------------------------------------

    def _run_iteration_staged(
        self, optimize_geometry, do_surfel_updates, optimize_poses,
        inner_iteration: int = 0,
    ) -> None:
        """One BA iteration as separate per-stage programs (profiling mode:
        each stage gets its own timer + optional sync). The default path is
        the fused single-program `_ba_iteration`."""
        import contextlib

        c = self.config
        ks = self.keyframes
        stream = self.timings_stream
        if stream is not None:
            stream.write(
                f"BA_count {self.ba_iteration_count} inner_iteration "
                f"{inner_iteration} keyframe_count {ks.live_count} "
                f"surfel_bound {self.known_surfel_bound}\n")

        @contextlib.contextmanager
        def stage(name):
            # Reference row names (direct_ba_alternating.cc:640-688); the
            # trailing sync inside Timing.time makes the elapsed time real
            # device time when sync_stage_profiling is on.
            t0 = time.perf_counter()
            with Timing.time(name, sync=self._stage_sync):
                yield
            if stream is not None:
                ms = 1e3 * (time.perf_counter() - t0)
                stream.write(f"{name.replace(' ', '_')} {ms:.3f}\n")
        create_mask, ks.last_active_iter, ks.last_covis_iter = (
            _begin_iteration_masks(
                ks.valid, ks.activation, ks.last_active_iter,
                ks.last_covis_iter, jnp.int32(self.ba_iteration_count),
            )
        )

        if optimize_geometry and do_surfel_updates:
            with stage("BA surfel creation"):
                self._create_surfels_masked(create_mask)

        with stage("BA surfel activation"):
            self.surfels = sf.update_surfel_activation(
                self.surfels, self.cam,
                ks.stack(ks.active_mask(include_covisible=False)),
                baseline_fx=c.baseline_fx,
            )

        participating = ks.active_mask(include_covisible=True)
        kstack = ks.stack(participating)

        if optimize_geometry:
            with stage("BA geometry optimization"):
                self.surfels = optimize_geometry_iteration(
                    self.surfels, self.cam, kstack,
                    baseline_fx=c.baseline_fx,
                    use_depth=c.use_geometric_residuals,
                    use_descriptor=c.use_photometric_residuals,
                )

        if do_surfel_updates:
            with stage("BA surfel merge"):
                self._merge_surfels_masked(create_mask)
            with stage("BA surfel compaction"):
                self.surfels = sf.compact_surfels(self.surfels)

        if optimize_poses:
            with stage("BA pose optimization"):
                result = optimize_keyframe_poses(
                    self.surfels, self.cam, kstack,
                    baseline_fx=c.baseline_fx,
                    use_depth=c.use_geometric_residuals,
                    use_descriptor=c.use_photometric_residuals,
                    max_iterations=30,
                )
                ks.set_poses(result.q, result.t, participating)
                ks.activation = _reactivation(
                    ks.activation, participating, result.moved
                )
        ks.propagate_covisible_active()

    def bundle_adjustment(
        self,
        optimize_poses: bool = True,
        optimize_geometry: bool = True,
        do_surfel_updates: bool = True,
        min_iterations: int = 0,
        max_iterations: int = 10,
        active_keyframe_window: Optional[tuple] = None,
        increase_ba_iteration_count: bool = True,
        time_limit: float = 0.0,
        optimize_depth_intrinsics: bool = False,
        optimize_color_intrinsics: bool = False,
        convergence_check: Optional[bool] = None,
        activate_all: Optional[bool] = None,
    ) -> int:
        """Run the alternating scheme; returns iterations run.

        `activate_all` re-activates EVERY keyframe at each iteration start
        (the reference's disable_deactivation default, bad_slam.cc:268-269
        -> direct_ba_alternating.cc:355-372; the parallel-BA thread always
        runs this way, bad_slam.cc:1287-1288). Default: the config flag.

        Read-free by default: fixed `max_iterations` (plus host wall-clock
        `time_limit`), device masks for everything value-dependent. With
        `convergence_check` (or config.sync_convergence_checks) the
        reference's all-keyframes-converged early exit
        (direct_ba_alternating.cc:692-701) is restored at the cost of one
        device->host read per iteration — do NOT enable on the axon runtime.
        """
        c = self.config
        ks = self.keyframes
        if ks.count == 0:
            return 0

        # Multi-chip mode: place the FULL map + keyframe store on the mesh
        # first so every downstream program (slice, iterations, scheme-end,
        # write-back) sees a consistent device set. Above the plane budget
        # the planes are sharded over the keyframe axis and the call runs
        # through the plane-streamed stage programs (parallel/streamed.py).
        mesh_on = self._ba_mesh() is not None
        self._streaming = mesh_on and self._plane_streaming_wanted()
        if mesh_on:
            self._shard_for_ba(ks, stream_planes=self._streaming)

        # --- high-water working slice of the surfel map ---
        # Each valid keyframe creates surfels at most once per BA EPOCH
        # (last_active_iter is compared against ba_iteration_count), so the
        # pessimistic bound grows once per epoch — not per call. The
        # parallel-BA mode drains several calls per epoch; growing per call
        # blew the bound to full capacity within a few keyframes.
        if self._bound_epoch != self.ba_iteration_count:
            if self.ba_iteration_count >= self._prebudgeted_epochs:
                self.known_surfel_bound += (
                    ks.count * self._cells_per_keyframe())
            self._bound_epoch = self.ba_iteration_count
        bucket = self._bucket_size(self.known_surfel_bound)
        full_map = self.surfels
        if bucket < full_map.capacity:
            self.surfels = _slice_map(full_map, bucket=bucket)

        if (not increase_ba_iteration_count
                and self.ba_iteration_count != self.last_ba_iteration_count):
            self.last_ba_iteration_count = self.ba_iteration_count
            self.perform_ba_scheme_end_tasks(do_surfel_updates)

        fixed_window = active_keyframe_window is not None
        if activate_all is None:
            activate_all = c.disable_deactivation and not fixed_window

        # Reset surfel active flags for this BA block
        # (direct_ba_alternating.cc:338).
        self.surfels = self.surfels._replace(
            active=jnp.zeros_like(self.surfels.active)
        )

        # Per-stage mode (sync_stage_profiling) keeps the old one-program-
        # per-stage structure so the stage timers stay meaningful; the
        # default path dispatches ONE fused program per iteration.
        staged = c.sync_stage_profiling
        if convergence_check is None:
            convergence_check = (c.sync_convergence_checks
                                 and _backend_tolerates_readbacks())

        # Hot path: ALL iterations in one program with the device-side
        # all-keyframes-converged early exit (read-free; the host paths
        # below keep per-iteration dispatch for windowing/intrinsics/
        # profiling/synced-convergence).
        iterations_done = 0
        if (self._streaming and not staged and not fixed_window
                and not convergence_check and not time_limit
                and not (optimize_depth_intrinsics
                         or optimize_color_intrinsics)):
            # Plane-streamed multi-chip path: per-iteration stage programs
            # (the device while_loop early exit and the keyframe bucket
            # need the fused single program; at the streamed regime's
            # keyframe counts the per-stage dispatch cost is negligible
            # against the stage work, and the bucket's O(live) goal is
            # moot — streaming IS the many-keyframes regime).
            self._shard_for_ba(stream_planes=True)  # re-pin sliced view
            with Timing.time("BA iterations (streamed)"):
                self._run_iterations_streamed(
                    max_iterations, optimize_geometry, do_surfel_updates,
                    optimize_poses, activate_all)
            iterations_done = max_iterations
            max_iterations = 0
        elif (not staged and not fixed_window and not convergence_check
                and not time_limit
                and not (optimize_depth_intrinsics
                         or optimize_color_intrinsics)):
            sel = self._keyframe_bucket()
            if mesh_on:
                self._shard_for_ba()  # re-pin the sliced working view
            with Timing.time("BA iterations (fused)"):
                args = (self.surfels, self.cam) + (
                    () if sel is None else (sel,)) + (
                    ks.depth, ks.nx, ks.ny, ks.radius2, ks.intensity,
                    ks.rgb, ks.q, ks.t, ks.valid, ks.activation,
                    ks.last_active_iter, ks.last_covis_iter, ks.covis,
                    jnp.int32(self.ba_iteration_count),
                    jnp.int32(self.min_observation_count()),
                )
                fn = _ba_iterations if sel is None else _ba_iterations_bucketed
                (self.surfels, ks.q, ks.t, ks.activation,
                 ks.last_active_iter, ks.last_covis_iter, _) = fn(
                    *args,
                    # traced (single compile per rung; see _ba_iterations)
                    max_iterations=jnp.int32(max_iterations),
                    baseline_fx=c.baseline_fx,
                    cell_size=c.sparse_surfel_cell_size,
                    merge_dist_factor=c.surfel_merge_dist_factor,
                    use_depth=c.use_geometric_residuals,
                    use_descriptor=c.use_photometric_residuals,
                    optimize_geometry=optimize_geometry,
                    do_surfel_updates=do_surfel_updates,
                    optimize_poses=optimize_poses,
                    pose_iterations=30,
                    activate_all=activate_all,
                )
            iterations_done = max_iterations  # host upper bound (read-free)
            max_iterations = 0                # skip the per-iteration loop
            if self.timings_stream is not None:
                # One synced row per fused BA call (SetSaveTimings analog;
                # per-stage rows need sync_stage_profiling). The sync is a
                # block, not a value read — safe on the relay.
                t0 = time.perf_counter()
                jax.block_until_ready((ks.q, self.surfels.valid))
                self.timings_stream.write(
                    f"BA_count {self.ba_iteration_count} fused_iterations "
                    f"{iterations_done} keyframe_count {ks.live_count} "
                    f"surfel_bound {self.known_surfel_bound} sync_ms "
                    f"{1e3 * (time.perf_counter() - t0):.3f}\n")

        start_time = time.perf_counter()
        for _ in range(max_iterations):
            iterations_done += 1
            if fixed_window:
                lo, hi = active_keyframe_window
                ks.set_activation_window(lo, hi)
                ks.propagate_covisible_active()

            if activate_all:
                ks.set_activation_window(0, ks.capacity - 1)

            if staged:
                self._run_iteration_staged(
                    optimize_geometry, do_surfel_updates, optimize_poses,
                    inner_iteration=iterations_done - 1)
            else:
                with Timing.time("BA iteration"):
                    (self.surfels, new_q, new_t, ks.activation,
                     ks.last_active_iter, ks.last_covis_iter) = _ba_iteration(
                        self.surfels, self.cam,
                        ks.depth, ks.nx, ks.ny, ks.radius2, ks.intensity,
                        ks.rgb, ks.q, ks.t, ks.valid, ks.activation,
                        ks.last_active_iter, ks.last_covis_iter, ks.covis,
                        jnp.int32(self.ba_iteration_count),
                        jnp.int32(self.min_observation_count()),
                        baseline_fx=c.baseline_fx,
                        cell_size=c.sparse_surfel_cell_size,
                        merge_dist_factor=c.surfel_merge_dist_factor,
                        use_depth=c.use_geometric_residuals,
                        use_descriptor=c.use_photometric_residuals,
                        optimize_geometry=optimize_geometry,
                        do_surfel_updates=do_surfel_updates,
                        optimize_poses=optimize_poses,
                        pose_iterations=30,
                    )
                    ks.q, ks.t = new_q, new_t
                    # (activate_all is applied host-side above; the fused
                    # statics path is only used by _ba_iterations)

            # --- intrinsics optimization ---
            if optimize_depth_intrinsics or optimize_color_intrinsics:
                with Timing.time("BA intrinsics optimization", sync=self._stage_sync):
                    self.optimize_intrinsics_step(
                        optimize_depth_intrinsics and c.use_geometric_residuals,
                        optimize_color_intrinsics
                        and c.use_photometric_residuals,
                    )

            if (convergence_check and iterations_done >= max(1, min_iterations)
                    and optimize_poses
                    and int(jnp.sum(ks.active_mask(False))) == 0):
                break
            if time_limit and (time.perf_counter() - start_time) > time_limit:
                break

        if increase_ba_iteration_count:
            self.perform_ba_scheme_end_tasks(do_surfel_updates)
            self.ba_iteration_count += 1

        # --- write the working slice back + resync the high-water bound ---
        if bucket < full_map.capacity:
            self.surfels = _write_back_map(full_map, self.surfels)
        if (c.sync_surfel_bucket and increase_ba_iteration_count
                and _backend_tolerates_readbacks()):
            # One scalar read per BA call ("surfels_size_" resync). Only
            # after scheme-end compaction: valid surfels are then packed
            # into the [0, count) prefix, so the bound may shrink safely.
            # NEVER on the axon relay: a single readback permanently
            # degrades the session ~1000x (PERF_NOTES.md) — there the
            # pessimistic per-epoch bound is used instead.
            self.known_surfel_bound = int(self.surfels.count) + 64

        return iterations_done

    # ------------------------------------------------------------------
    # Export
    # ------------------------------------------------------------------

    def export_point_cloud(self, refresh_colors: bool = True):
        """(positions, normals, colors) numpy arrays of valid surfels
        (ExportToPointCloud analog, direct_ba.cc:461-547). End-of-run only:
        this reads device values. With refresh_colors the AssignColors pass
        first averages every surfel's color over all its keyframe
        observations (direct_ba.cc:506-511 -> AssignColorsCUDA)."""
        if refresh_colors and self.keyframes.count > 0:
            self.surfels = sf.assign_colors(
                self.surfels, self.cam, self.keyframes.stack(),
                self.keyframes.rgb, baseline_fx=self.config.baseline_fx,
            )
        m = self.surfels
        valid = np.asarray(m.valid)
        return (
            np.asarray(m.pos)[valid],
            np.asarray(m.normal)[valid],
            np.asarray(m.color)[valid],
        )
