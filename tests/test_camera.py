import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera, unproject_map


CAM = PinholeCamera(fx=176.0, fy=176.0, cx=160.0, cy=120.0, width=320, height=240)


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, CAM.width, 50)
    py = rng.integers(0, CAM.height, 50)
    depth = rng.uniform(0.5, 3.0, 50).astype(np.float32)
    p = CAM.unproject(jnp.array(px, jnp.float32), jnp.array(py, jnp.float32),
                      jnp.array(depth))
    pxy = CAM.project(p)
    # Center-convention unprojection maps back to pixel centers (idx + 0.5).
    np.testing.assert_allclose(np.asarray(pxy[:, 0]), px + 0.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pxy[:, 1]), py + 0.5, atol=1e-3)
    # Floor recovers the pixel index.
    assert np.all(np.floor(np.asarray(pxy[:, 0])).astype(int) == px)


def test_project_valid_bounds():
    p = jnp.array(
        [
            [0.0, 0.0, 1.0],      # center, valid
            [0.0, 0.0, -1.0],     # behind camera
            [100.0, 0.0, 1.0],    # far out of image
        ],
        jnp.float32,
    )
    _, _, valid = CAM.project_valid(p)
    assert np.asarray(valid).tolist() == [True, False, False]


def test_scaled_camera_consistency():
    half = CAM.scaled(0.5)
    assert (half.width, half.height) == (160, 120)
    # A 3D point projecting to corner coords (x, y) projects to (x/2, y/2).
    p = jnp.array([[0.3, -0.2, 1.7]], jnp.float32)
    full_xy = np.asarray(CAM.project(p))[0]
    half_xy = np.asarray(half.project(p))[0]
    np.testing.assert_allclose(half_xy, full_xy / 2.0, atol=1e-5)


def test_pyramid_level_matches_repeated_scaling():
    lvl2 = CAM.pyramid_level(2)
    assert (lvl2.width, lvl2.height) == (80, 60)
    np.testing.assert_allclose(lvl2.fx, CAM.fx / 4.0)
    np.testing.assert_allclose(lvl2.cx, CAM.cx / 4.0)


def test_unproject_map_shape():
    depth = jnp.ones((CAM.height, CAM.width), jnp.float32)
    pts = unproject_map(CAM, depth)
    assert pts.shape == (CAM.height, CAM.width, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 1.0)
