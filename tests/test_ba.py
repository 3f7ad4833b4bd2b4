"""Synthetic round-trip tests for the BA back-end.

Port of the reference's test strategy (SURVEY.md section 4 /
applications/badslam/src/badslam/test/): analytic scenes, perturb ground
truth, optimize, assert recovery. Deterministic XLA reductions allow tight
tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3

import fixtures
import synthetic

CAP = 1 << 14


def build_ba(rng, width=160, height=120, num_planes=3):
    cam = synthetic.default_camera(width, height)
    scene = synthetic.random_plane_scene(rng, num_planes)
    cfg = BadSlamConfig(max_surfel_count=CAP)
    ba = DirectBA(cam, cfg, surfel_capacity=CAP)
    return cam, scene, ba


def add_rendered_keyframe(ba, cam, scene, pose, idx):
    d, i = synthetic.render_scene(cam, scene, pose)
    f = fixtures.frame_from_render(cam, d, i)
    return ba.add_keyframe(f, pose, idx)


@pytest.mark.parametrize("use_desc", [False, True],
                         ids=["geometric", "geo+photometric"])
def test_pose_optimization_recovers_perturbation(use_desc):
    """Analog of test_pose_optimization_*_residual.cc: perturb a keyframe
    pose, optimize against the map, expect recovery."""
    rng = np.random.default_rng(11)
    cam, scene, ba = build_ba(rng)
    kf0 = add_rendered_keyframe(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    assert ba.surfel_count > 500

    gt1 = synthetic.pose(tx=0.03, ty=0.01, rz=0.01)
    kf1 = add_rendered_keyframe(ba, cam, scene, gt1, 1)
    ba.surfels = ba.surfels._replace(active=ba.surfels.valid)

    # Perturb in several directions (reference uses 12; a representative set).
    for i, pert in enumerate([
        synthetic.pose(tx=0.005),
        synthetic.pose(ty=-0.005),
        synthetic.pose(tz=0.005),
        synthetic.pose(rx=0.002),
        synthetic.pose(ry=-0.002, tx=-0.003),
    ]):
        ba.keyframes.set_pose(kf1, se3.mul(gt1, pert))
        ks = ba.keyframes.stack([kf1])
        res = optimize_keyframe_poses(
            ba.surfels, cam, ks, use_descriptor=use_desc
        )
        # Results align with the full-capacity keyframe axis.
        err = float(jnp.linalg.norm(se3.log(
            se3.mul(se3.inverse(se3.SE3(res.q[kf1], res.t[kf1])), gt1)
        )))
        # Photometric residuals carry u8-quantization bias; geometric-only
        # converges tighter (same ordering as the reference fixtures).
        tol = 5e-4 if use_desc else 2e-4
        assert err < tol, f"perturbation {i}: recovery error {err}"
        assert bool(res.moved[kf1])


@pytest.mark.parametrize("use_desc", [False, True],
                         ids=["geometric", "geo+photometric"])
def test_geometry_optimization_recovers_perturbation(use_desc):
    """Analog of test_geometry_optimization_*_residual.cc: perturb surfel
    positions along their normals, run geometry iterations, expect
    convergence back to the surface."""
    rng = np.random.default_rng(12)
    cam, scene, ba = build_ba(rng)
    kf0 = add_rendered_keyframe(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    gt1 = synthetic.pose(tx=0.03, ty=0.01, rz=0.01)
    add_rendered_keyframe(ba, cam, scene, gt1, 1)

    m = ba.surfels._replace(active=ba.surfels.valid)
    original = m
    noise = 0.005 * jnp.array(
        np.random.default_rng(5).uniform(-1, 1, (m.capacity,)), jnp.float32
    )
    m = m._replace(pos=m.pos + noise[:, None] * m.normal)

    kstack = ba.keyframes.stack([0, 1])
    for _ in range(3):
        m = optimize_geometry_iteration(
            m, cam, kstack, use_descriptor=use_desc
        )
    valid = np.asarray(m.valid)
    err = np.linalg.norm(
        np.asarray(m.pos)[valid] - np.asarray(original.pos)[valid], axis=-1
    )
    assert err.mean() < 1e-4, err.mean()


def test_full_ba_improves_relative_pose():
    """Full alternating scheme: perturbed keyframe pose improves; map stays
    consistent (gauge-invariant relative-pose metric)."""
    rng = np.random.default_rng(13)
    cam, scene, ba = build_ba(rng)
    gt = [se3.identity(), synthetic.pose(tx=0.03, ty=0.01, rz=0.01)]
    kf0 = add_rendered_keyframe(ba, cam, scene, gt[0], 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    kf1 = add_rendered_keyframe(ba, cam, scene, gt[1], 1)

    pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
    ba.keyframes.set_pose(kf1, se3.mul(gt[1], pert))
    err_before = fixtures.relative_pose_error(
        se3, ba.keyframes.pose(kf0), ba.keyframes.pose(kf1), gt[0], gt[1]
    )
    ba.bundle_adjustment(max_iterations=8)
    err_after = fixtures.relative_pose_error(
        se3, ba.keyframes.pose(kf0), ba.keyframes.pose(kf1), gt[0], gt[1]
    )
    assert err_after < err_before / 5, (err_before, err_after)
    assert ba.surfel_count > 500


def test_ba_converges_and_early_exits():
    rng = np.random.default_rng(14)
    cam, scene, ba = build_ba(rng)
    kf0 = add_rendered_keyframe(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    add_rendered_keyframe(ba, cam, scene, synthetic.pose(tx=0.02), 1)
    # Unperturbed: should converge in very few iterations (opt-in sync
    # convergence check; disabled by default for read-free operation).
    iters = ba.bundle_adjustment(max_iterations=10, convergence_check=True)
    assert iters <= 3


def _run_ba_variant(staged: bool, iters=4, disable_deactivation=False):
    rng = np.random.default_rng(13)
    cam, scene, ba = build_ba(rng)
    ba.config.sync_stage_profiling = staged
    ba.config.disable_deactivation = disable_deactivation
    gt = [se3.identity(), synthetic.pose(tx=0.03, ty=0.01, rz=0.01)]
    kf0 = add_rendered_keyframe(ba, cam, scene, gt[0], 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    add_rendered_keyframe(ba, cam, scene, gt[1], 1)
    pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
    ba.keyframes.set_pose(1, se3.mul(gt[1], pert))
    ba.bundle_adjustment(max_iterations=iters)
    return (np.asarray(ba.keyframes.q), np.asarray(ba.keyframes.t),
            np.asarray(ba.keyframes.activation),
            int(ba.surfel_count))


def test_fused_iterations_match_staged_path():
    """The single-program while_loop BA (_ba_iterations) must produce the
    same poses/activation as the per-stage dispatch path.

    Moved-based deactivation mode, 4 iterations: with activate-all
    (disable_deactivation, the default) the fused path's device-side
    convergence exit could stop before the staged loop (which has no
    read-free way to exit), so the multi-iteration comparison pins the
    moved-based mode; test_fused_matches_staged_activate_all covers the
    activate-all statics for a single iteration."""

    q_f, t_f, act_f, n_f = _run_ba_variant(staged=False)
    q_s, t_s, act_s, n_s = _run_ba_variant(staged=True)
    # The staged path differs only in program structure, not math; the
    # while_loop adds a convergence exit which cannot fire here (the
    # perturbed keyframe stays active for these few iterations).
    np.testing.assert_allclose(q_f, q_s, atol=1e-6)
    np.testing.assert_allclose(t_f, t_s, atol=1e-6)
    np.testing.assert_array_equal(act_f, act_s)
    assert n_f == n_s


def test_fused_matches_staged_activate_all():
    """Activate-all (disable_deactivation) equivalence between the fused
    statics path and the staged host-window path for one iteration (no
    early exit possible)."""
    q_f, t_f, act_f, n_f = _run_ba_variant(staged=False, iters=1,
                                           disable_deactivation=True)
    q_s, t_s, act_s, n_s = _run_ba_variant(staged=True, iters=1,
                                           disable_deactivation=True)
    np.testing.assert_allclose(q_f, q_s, atol=1e-6)
    np.testing.assert_allclose(t_f, t_s, atol=1e-6)
    np.testing.assert_array_equal(act_f, act_s)
    assert n_f == n_s


def test_fused_iterations_device_early_exit():
    """Read-free convergence: with an unperturbed scene the device
    while_loop exits early, leaving all keyframes INACTIVE."""
    rng = np.random.default_rng(14)
    cam, scene, ba = build_ba(rng)
    kf0 = add_rendered_keyframe(ba, cam, scene, se3.identity(), 0)
    ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
    add_rendered_keyframe(ba, cam, scene, synthetic.pose(tx=0.02), 1)
    ba.bundle_adjustment(max_iterations=10)
    assert int(jnp.sum(ba.keyframes.active_mask(False))) == 0


def test_disable_deactivation_controls_ba_scope():
    """disable_deactivation=true (reference DEFAULT, bad_slam_config.h:194)
    re-activates EVERY keyframe at each BA iteration start
    (bad_slam.cc:268-269 -> direct_ba_alternating.cc:355-372), so even an
    inactive, non-covisible keyframe gets optimized; with the flag off it
    must stay untouched."""
    def run(disable_deactivation: bool):
        rng = np.random.default_rng(21)
        cam, scene, ba = build_ba(rng)
        ba.config.disable_deactivation = disable_deactivation
        gt0 = se3.identity()
        kf0 = add_rendered_keyframe(ba, cam, scene, gt0, 0)
        ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
        add_rendered_keyframe(ba, cam, scene, synthetic.pose(tx=0.02), 1)
        # A spatially separate keyframe: its frustum does not intersect the
        # first cluster, so covisibility cannot re-activate kf0/kf1.
        far_scene = synthetic.PlaneScene(
            scene.points + np.array([50.0, 0, 0], np.float32), scene.normals)
        kf2 = add_rendered_keyframe(ba, cam, far_scene,
                                    synthetic.pose(tx=50.0), 2)

        # Perturb kf0, then mark only kf2 active (the "new keyframe" state).
        pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
        ba.keyframes.set_pose(kf0, se3.mul(gt0, pert))
        import jax.numpy as jnp2
        act = np.full(ba.keyframes.capacity, 0, np.int32)
        act[kf2] = 2  # ACTIVE
        ba.keyframes.activation = jnp2.array(act)
        before = np.concatenate([np.asarray(ba.keyframes.q[kf0]),
                                 np.asarray(ba.keyframes.t[kf0])])
        ba.bundle_adjustment(max_iterations=2, do_surfel_updates=False)
        after = np.concatenate([np.asarray(ba.keyframes.q[kf0]),
                                np.asarray(ba.keyframes.t[kf0])])
        return float(np.abs(after - before).max())

    moved_on = run(disable_deactivation=True)
    moved_off = run(disable_deactivation=False)
    assert moved_off == 0.0, moved_off      # inactive + non-covisible: frozen
    assert moved_on > 1e-5, moved_on        # activate-all: optimized


def test_keyframe_bucketed_ba_matches_full():
    """The keyframe-bucketed fused BA (gather live slots -> dense pow-2
    substack -> scatter back) must match the full-capacity program on a
    store with dead slots (round-2 verdict: BA cost must scale with the
    live set, the keyframe analog of the surfel high-water slice)."""

    def run(bucket_base: int):
        rng = np.random.default_rng(17)
        cam, scene, ba = build_ba(rng)
        ba.config.keyframe_bucket_base = bucket_base
        ba.keyframes._ensure_capacity(32)   # capacity >> live
        gt0 = se3.identity()
        kf0 = add_rendered_keyframe(ba, cam, scene, gt0, 0)
        ba.create_surfels_for_keyframe(kf0, filter_new_surfels=False)
        for i in range(1, 6):
            add_rendered_keyframe(
                ba, cam, scene, synthetic.pose(tx=0.005 * i), i)
        ba.keyframes.remove_keyframe(3)     # dead slot inside the live range
        pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
        ba.keyframes.set_pose(5, se3.mul(synthetic.pose(tx=0.025), pert))
        ba.bundle_adjustment(max_iterations=2)
        return (np.asarray(ba.keyframes.q), np.asarray(ba.keyframes.t),
                np.asarray(ba.keyframes.activation), int(ba.surfel_count))

    q_b, t_b, act_b, n_b = run(bucket_base=8)    # B=8 <= cap/2: bucketed
    q_f, t_f, act_f, n_f = run(bucket_base=64)   # b > cap/2: full capacity
    live = [s for s in range(6) if s != 3]
    # Live rows must agree (summation-order differences only).
    np.testing.assert_allclose(q_b[live], q_f[live], atol=2e-5)
    np.testing.assert_allclose(t_b[live], t_f[live], atol=2e-5)
    np.testing.assert_array_equal(act_b[live], act_f[live])
    assert n_b == n_f
