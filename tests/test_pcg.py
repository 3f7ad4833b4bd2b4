"""PCG solver round-trip tests (the reference runs its geometry/pose
round-trip tests against BOTH solvers, e.g.
test_geometry_optimization_geometric_residual.cc:216-221)."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.ba.pcg import pcg_bundle_adjustment, pcg_bundle_adjustment_step
from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3

import fixtures
import synthetic

CAP = 1 << 13


def build_ba(rng, num_kf=3, width=128, height=96):
    cam = synthetic.default_camera(width, height)
    scene = synthetic.random_plane_scene(rng, 4)
    cfg = BadSlamConfig(max_surfel_count=CAP)
    ba = DirectBA(cam, cfg, surfel_capacity=CAP)
    gt = [synthetic.pose(tx=0.02 * i, ry=0.005 * i) for i in range(num_kf)]
    for i, g in enumerate(gt):
        d, inten = synthetic.render_scene(cam, scene, g)
        ba.add_keyframe(fixtures.frame_from_render(cam, d, inten), g, i)
    ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
    ba.surfels = ba.surfels._replace(active=ba.surfels.valid)
    return cam, ba, gt


@pytest.mark.parametrize("use_desc", [False, True],
                         ids=["geometric", "geo+photometric"])
def test_pcg_recovers_pose_perturbation(use_desc):
    rng = np.random.default_rng(31)
    cam, ba, gt = build_ba(rng)
    ks = ba.keyframes

    pert = synthetic.pose(tx=0.004, ty=-0.002, rz=0.001)
    ks.set_pose(1, se3.mul(gt[1], pert))

    def rel_err():
        return fixtures.relative_pose_error(
            se3, ks.pose(0), ks.pose(1), gt[0], gt[1])

    err0 = rel_err()
    pcg_bundle_adjustment(ba, max_iterations=8, max_inner_iterations=25)
    err1 = rel_err()
    # The joint pose+geometry system converges more gradually than the
    # alternating scheme (1-DOF surfel modes); require a solid reduction.
    assert err1 < 0.5 * err0, (err0, err1)


def test_pcg_recovers_geometry_perturbation():
    rng = np.random.default_rng(32)
    cam, ba, gt = build_ba(rng)
    original = ba.surfels
    noise = 0.004 * jnp.array(
        np.random.default_rng(5).uniform(-1, 1, (CAP,)), jnp.float32)
    ba.surfels = ba.surfels._replace(
        pos=ba.surfels.pos + noise[:, None] * ba.surfels.normal)

    # do_surfel_updates=False: creation/compaction would change surfel
    # identity and break the row-wise comparison below.
    pcg_bundle_adjustment(ba, max_iterations=4, max_inner_iterations=20,
                          do_surfel_updates=False)

    v = np.asarray(ba.surfels.valid)
    err = np.linalg.norm(
        np.asarray(ba.surfels.pos)[v] - np.asarray(original.pos)[v], axis=-1)
    noise_mag = float(jnp.mean(jnp.abs(noise)))
    assert err.mean() < 0.3 * noise_mag, (err.mean(), noise_mag)


def test_pcg_step_respects_gauge():
    rng = np.random.default_rng(33)
    cam, ba, gt = build_ba(rng, num_kf=2)
    ks = ba.keyframes
    q_before = np.asarray(ks.q[0])
    t_before = np.asarray(ks.t[0])
    new_map, new_q, new_t, _, _ = pcg_bundle_adjustment_step(
        ba.surfels, cam, ks.stack(ks.valid), gauge_kf=0,
        max_inner_iterations=10)
    np.testing.assert_allclose(np.asarray(new_q[0]), q_before, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_t[0]), t_before, atol=1e-7)


def test_pcg_recovers_intrinsics_perturbation():
    """Intrinsics unknowns folded into the PCG system (the reference runs
    its intrinsics round-trip tests against both solvers; unknown layout
    direct_ba_pcg.cc:240-307): a perturbed camera estimate is pulled back
    toward the truth through the PCG solver.

    Note the assertion is a solid reduction, not exact recovery: the PCG
    system optimizes surfel geometry JOINTLY with intrinsics, so part of a
    small calibration error is legitimately absorbed by the map until the
    joint system is self-consistent (the alternating Schur test recovers
    exactly only because its surfels are held fixed during that step)."""
    rng = np.random.default_rng(34)
    cam, ba, gt = build_ba(rng, num_kf=5)

    bad_cam = cam.with_intrinsics(
        fx=cam.fx * 1.01, fy=cam.fy * 0.995,
        cx=cam.cx + 1.0, cy=cam.cy - 1.0,
    )
    ba.cam = bad_cam

    def err():
        c = ba.cam
        return (abs(c.fx - cam.fx) / cam.fx + abs(c.fy - cam.fy) / cam.fy
                + (abs(c.cx - cam.cx) + abs(c.cy - cam.cy)) / cam.fx)

    err0 = err()
    pcg_bundle_adjustment(ba, max_iterations=3, max_inner_iterations=25,
                          optimize_intrinsics=True, do_surfel_updates=False)
    err1 = err()
    assert np.isfinite(err1)
    assert np.isfinite(np.asarray(ba.depth_params.cfactor)).all()
    assert err1 < 0.6 * err0, (err0, err1)
