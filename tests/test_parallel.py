"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded BA
stages must produce the same results as the single-device programs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.ba.geometry_opt import optimize_geometry_iteration
from badslam_tpu.ba.pose_opt import optimize_keyframe_poses
from badslam_tpu.ba.scheme import DirectBA
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.parallel import (
    estimate_pose_sharded,
    make_mesh,
    optimize_geometry_sharded,
    optimize_keyframe_poses_sharded,
)

import fixtures
import synthetic

CAP = 1 << 13  # divisible by 8


def build_scene():
    rng = np.random.default_rng(41)
    cam = synthetic.default_camera(128, 96)
    scene = synthetic.random_plane_scene(rng, 3)
    cfg = BadSlamConfig(max_surfel_count=CAP)
    ba = DirectBA(cam, cfg, surfel_capacity=CAP)
    gt = [se3.identity(), synthetic.pose(tx=0.03, rz=0.01),
          synthetic.pose(tx=0.05, ty=0.02), synthetic.pose(ty=-0.03),
          synthetic.pose(tz=0.02), synthetic.pose(tx=-0.02, ry=0.01),
          synthetic.pose(ty=0.04, rx=-0.01), synthetic.pose(tx=0.01, tz=-0.02)]
    for i, g in enumerate(gt):
        d, inten = synthetic.render_scene(cam, scene, g)
        ba.add_keyframe(fixtures.frame_from_render(cam, d, inten), g, i)
    ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
    ba.surfels = ba.surfels._replace(active=ba.surfels.valid)
    return cam, ba, gt


@pytest.fixture(scope="module")
def scene():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return build_scene()


def test_pose_opt_sharded_matches_single(scene):
    cam, ba, gt = scene
    mesh = make_mesh(8)
    # Perturb all 8 keyframe poses.
    for i in range(8):
        ba.keyframes.set_pose(
            i, se3.mul(gt[i], synthetic.pose(tx=0.003 * ((i % 3) - 1),
                                             rz=0.001 * (i % 2)))
        )
    ks = ba.keyframes.stack(list(range(8)))
    ref = optimize_keyframe_poses(ba.surfels, cam, ks)
    shd = optimize_keyframe_poses_sharded(mesh, ba.surfels, cam, ks)
    np.testing.assert_allclose(
        np.asarray(shd.t), np.asarray(ref.t), atol=1e-5
    )
    qr, qs = np.asarray(ref.q), np.asarray(shd.q)
    sign = np.sign(np.sum(qr * qs, axis=-1, keepdims=True))
    np.testing.assert_allclose(qs * sign, qr, atol=1e-5)


def test_geometry_opt_sharded_matches_single(scene):
    cam, ba, gt = scene
    mesh = make_mesh(8)
    for i in range(8):
        ba.keyframes.set_pose(i, gt[i])
    ks = ba.keyframes.stack(list(range(8)))
    noise = 0.004 * jnp.array(
        np.random.default_rng(7).uniform(-1, 1, (ba.surfels.capacity,)),
        jnp.float32,
    )
    m = ba.surfels._replace(
        pos=ba.surfels.pos + noise[:, None] * ba.surfels.normal
    )
    ref = optimize_geometry_iteration(m, cam, ks)
    shd = optimize_geometry_sharded(mesh, m, cam, ks)
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(shd.pos)[v], np.asarray(ref.pos)[v], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(shd.desc)[v], np.asarray(ref.desc)[v], atol=1e-4
    )


def test_geometry_plane_streamed_matches_single(scene):
    """Plane-streamed variant (keyframe planes sharded over the mesh and
    broadcast chunk-by-chunk over ICI; nothing replicated) must match the
    single-device geometry stage and leave per-device plane shards in
    place (the round-3 multi-chip memory critique: replicating planes
    costs ~9 MB/keyframe/chip)."""
    from badslam_tpu.parallel import optimize_geometry_plane_streamed

    cam, ba, gt = scene
    mesh = make_mesh(8)
    for i in range(8):
        ba.keyframes.set_pose(i, gt[i])
    ks = ba.keyframes.stack(list(range(8)))
    noise = 0.004 * jnp.array(
        np.random.default_rng(7).uniform(-1, 1, (ba.surfels.capacity,)),
        jnp.float32,
    )
    m = ba.surfels._replace(
        pos=ba.surfels.pos + noise[:, None] * ba.surfels.normal
    )
    ref = optimize_geometry_iteration(m, cam, ks)
    shd = optimize_geometry_plane_streamed(mesh, m, cam, ks)
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(shd.pos)[v], np.asarray(ref.pos)[v], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(shd.desc)[v], np.asarray(ref.desc)[v], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(shd.normal)[v], np.asarray(ref.normal)[v], atol=1e-5
    )
    # Depth-only (1-D position) path too.
    ref1 = optimize_geometry_iteration(m, cam, ks, use_descriptor=False)
    shd1 = optimize_geometry_plane_streamed(
        mesh, m, cam, ks, use_descriptor=False)
    np.testing.assert_allclose(
        np.asarray(shd1.pos)[v], np.asarray(ref1.pos)[v], atol=1e-5
    )


def test_estimate_pose_sharded_psum(scene):
    cam, ba, gt = scene
    mesh = make_mesh(8)
    ks = ba.keyframes
    pert = se3.mul(gt[1], synthetic.pose(tx=0.004, rz=0.002))
    q, t = estimate_pose_sharded(
        mesh, ba.surfels, cam, pert.q, pert.t,
        ks.depth[1], ks.nx[1], ks.ny[1], ks.intensity[1],
    )
    err = float(jnp.linalg.norm(se3.log(
        se3.mul(se3.inverse(se3.SE3(q, t)), gt[1])
    )))
    assert err < 2e-4, err


def test_integrated_mesh_ba_matches_single_device():
    """config.n_devices=8 turns on the INTEGRATED multi-chip BA mode: the
    same fused _ba_iterations program runs SPMD with the surfel axis
    sharded over the mesh and keyframe planes replicated (XLA partitioner
    inserts the collectives). Results must match single-device modulo
    reduction order."""
    import fixtures
    import synthetic
    from badslam_tpu.ba.scheme import DirectBA
    from badslam_tpu.config import BadSlamConfig
    from badslam_tpu.geometry import se3

    def run(n_devices):
        rng = np.random.default_rng(13)
        cam = synthetic.default_camera(96, 72)
        scene = synthetic.random_plane_scene(rng, 3)
        cfg = BadSlamConfig(max_surfel_count=1 << 13, n_devices=n_devices)
        ba = DirectBA(cam, cfg, surfel_capacity=1 << 13)
        gt = [se3.identity(), synthetic.pose(tx=0.03, ty=0.01, rz=0.01)]
        for i, g in enumerate(gt):
            d, inten = synthetic.render_scene(cam, scene, g)
            ba.add_keyframe(fixtures.frame_from_render(cam, d, inten), g, i)
            if i == 0:
                ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
        pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
        ba.keyframes.set_pose(1, se3.mul(gt[1], pert))
        ba.bundle_adjustment(max_iterations=2)
        return (np.asarray(ba.keyframes.q), np.asarray(ba.keyframes.t),
                int(ba.surfels.count))

    q1, t1, n1 = run(0)
    q8, t8, n8 = run(8)
    assert n1 == n8
    np.testing.assert_allclose(q8, q1, atol=2e-5)
    np.testing.assert_allclose(t8, t1, atol=2e-5)


def test_integrated_plane_streamed_ba_matches_single_device():
    """The INTEGRATED streamed mode (round-4 verdict #6): with
    plane_replication_budget_mb <= 0 the n_devices BA call keeps the
    keyframe PLANES sharded over the keyframe axis and runs the
    plane-streamed stage programs (parallel/streamed.py) — creation,
    activation+normals, position, merge, compaction, pose opt and the
    scheme-end tasks all included. Results must match single-device up to
    float reduction order; surfel counts exactly."""
    from jax.sharding import PartitionSpec as P

    def run(n_devices):
        rng = np.random.default_rng(13)
        cam = synthetic.default_camera(96, 72)
        scene = synthetic.random_plane_scene(rng, 3)
        cfg = BadSlamConfig(
            max_surfel_count=1 << 13, n_devices=n_devices,
            plane_replication_budget_mb=0.0 if n_devices else 2048.0)
        ba = DirectBA(cam, cfg, surfel_capacity=1 << 13)
        gt = [se3.identity(), synthetic.pose(tx=0.03, ty=0.01, rz=0.01)]
        for i, g in enumerate(gt):
            d, inten = synthetic.render_scene(cam, scene, g)
            ba.add_keyframe(fixtures.frame_from_render(cam, d, inten), g, i)
            if i == 0:
                ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
        pert = synthetic.pose(tx=0.004, ty=-0.003, rz=0.001)
        ba.keyframes.set_pose(1, se3.mul(gt[1], pert))
        ba.bundle_adjustment(max_iterations=2)
        if n_devices:
            assert ba._streaming, "streamed mode must have been selected"
            # The planes must actually be sharded over the keyframe axis.
            spec = ba.keyframes.depth.sharding.spec
            assert spec == P("d"), spec
        return (np.asarray(ba.keyframes.q), np.asarray(ba.keyframes.t),
                int(ba.surfels.count),
                np.asarray(ba.surfels.valid).sum())

    q1, t1, n1, v1 = run(0)
    q8, t8, n8, v8 = run(8)
    assert n1 == n8
    assert v1 == v8
    np.testing.assert_allclose(q8, q1, atol=2e-5)
    np.testing.assert_allclose(t8, t1, atol=2e-5)
