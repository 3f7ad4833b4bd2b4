"""Pairwise-tracking convergence tests (test_pairwise_frame_tracking.cc
analog, on analytic plane scenes instead of GL-rendered heightmaps)."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3
from badslam_tpu.ops.pyramid import build_pyramid
from badslam_tpu.tracking import track_frame_pairwise

import fixtures
import synthetic

NUM_SCALES = 4


def setup_pair(rng, gt_motion, width=160, height=120, num_planes=3):
    cam = synthetic.default_camera(width, height)
    scene = synthetic.random_plane_scene(rng, num_planes)
    d0, i0 = synthetic.render_scene(cam, scene, se3.identity())
    d1, i1 = synthetic.render_scene(cam, scene, gt_motion)
    f0 = fixtures.frame_from_render(cam, d0, i0)
    f1 = fixtures.frame_from_render(cam, d1, i1)
    cams = tuple(cam.pyramid_level(i) for i in range(NUM_SCALES))
    p0 = build_pyramid(f0.depth, f0.nx, f0.ny, f0.intensity, NUM_SCALES)
    p1 = build_pyramid(f1.depth, f1.nx, f1.ny, f1.intensity, NUM_SCALES)
    return cams, p0, p1


def track(cams, p0, p1, init=None, **kw):
    I = init or se3.identity()
    return track_frame_pairwise(cams, p0, p1, I.q, I.t, I.q, I.t, **kw)


@pytest.mark.parametrize("use_desc", [False, True],
                         ids=["geometric", "geo+photometric"])
def test_tracking_recovers_small_motion(use_desc):
    rng = np.random.default_rng(31)
    gt = synthetic.pose(tx=0.01, ty=-0.008, tz=0.012, rx=0.004, rz=0.005)
    # Depth-only tracking needs geometric richness (the reference tests it on
    # a random heightmap); photometric works on sparser scenes.
    cams, p0, p1 = setup_pair(rng, gt, num_planes=3 if use_desc else 8)
    res = track(cams, p0, p1, use_descriptor=use_desc)
    err = float(jnp.linalg.norm(se3.log(
        se3.mul(se3.inverse(se3.SE3(res.q, res.t)), gt)
    )))
    assert err < 1e-3, err
    assert int(res.residual_count) > 5000


def test_tracking_recovers_larger_motion():
    rng = np.random.default_rng(32)
    gt = synthetic.pose(tx=-0.04, tz=0.03, ry=0.03)
    cams, p0, p1 = setup_pair(rng, gt, num_planes=6)
    res = track(cams, p0, p1)
    err = float(jnp.linalg.norm(se3.log(
        se3.mul(se3.inverse(se3.SE3(res.q, res.t)), gt)
    )))
    assert err < 1e-3, err


def test_tracking_duel_picks_better_initialization():
    rng = np.random.default_rng(33)
    gt = synthetic.pose(tx=0.02, rz=0.01)
    cams, p0, p1 = setup_pair(rng, gt)
    bad = synthetic.pose(tx=-0.3, ty=0.2)
    res = track_frame_pairwise(
        cams, p0, p1, bad.q, bad.t, gt.q, gt.t,
        test_two_initial_estimates=True,
    )
    err = float(jnp.linalg.norm(se3.log(
        se3.mul(se3.inverse(se3.SE3(res.q, res.t)), gt)
    )))
    # This test exercises the duel mechanism (a grossly wrong init must be
    # rejected), not peak accuracy; the reference's own fixture tables span
    # 2.8e-2..3.6e-5 (test_pairwise_frame_tracking.cc:49-80).
    assert err < 2e-3, err


def test_tracking_empty_frames_returns_initial():
    cam = synthetic.default_camera(160, 120)
    cams = tuple(cam.pyramid_level(i) for i in range(NUM_SCALES))
    zero = jnp.zeros((120, 160), jnp.float32)
    p = build_pyramid(zero, zero, zero, zero, NUM_SCALES)
    init = synthetic.pose(tx=0.05)
    res = track_frame_pairwise(cams, p, p, init.q, init.t, init.q, init.t)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(init.t))
    assert int(res.residual_count) == 0


def test_tracking_gradmag_mode():
    """The reference's third photometric mode: gradient-magnitude planes
    instead of raw intensity (cost_function.cuh:322-352)."""
    from badslam_tpu.ops.preprocess import compute_sobel_gradient_magnitude

    rng = np.random.default_rng(41)
    gt = synthetic.pose(tx=0.012, ty=-0.006, rz=0.004)
    cams, p0, p1 = setup_pair(rng, gt, num_planes=4)

    def to_gradmag(pyr):
        return tuple(
            lvl._replace(intensity=compute_sobel_gradient_magnitude(
                lvl.intensity)) for lvl in pyr)

    g0, g1 = to_gradmag(p0), to_gradmag(p1)
    res = track_frame_pairwise(
        cams, g0, g1,
        se3.identity().q, se3.identity().t,
        se3.identity().q, se3.identity().t,
        use_depth=True, use_descriptor=False, use_gradmag=True,
    )
    err = float(jnp.linalg.norm(se3.log(
        se3.mul(se3.inverse(se3.SE3(res.q, res.t)), gt)
    )))
    assert err < 2e-3, err
