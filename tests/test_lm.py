"""Generic LM optimizer tests (libvis lm_optimizer test analogs: line
fitting + Schur-complement structure)."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.utils.lm import optimize, optimize_schur


def test_lm_line_fitting():
    rng = np.random.default_rng(0)
    xs = jnp.array(rng.uniform(-2, 2, 50), jnp.float32)
    gt = jnp.array([1.7, -0.3])
    ys = gt[0] * xs + gt[1]

    def residuals(p):
        return p[0] * xs + p[1] - ys

    res = optimize(residuals, jnp.array([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(gt), atol=1e-5)
    assert float(res.cost) < 1e-9


def test_lm_nonlinear():
    # Fit y = exp(a x) + b.
    rng = np.random.default_rng(1)
    xs = jnp.array(rng.uniform(0, 1, 40), jnp.float32)
    ys = jnp.exp(0.8 * xs) + 0.25

    def residuals(p):
        return jnp.exp(p[0] * xs) + p[1] - ys

    res = optimize(residuals, jnp.array([0.2, 0.0]))
    np.testing.assert_allclose(np.asarray(res.x), [0.8, 0.25], atol=1e-4)


def test_lm_schur_matches_dense():
    """BA-structured toy problem: a 2-dof dense block observed jointly with
    20 1-dof block states; Schur solution must match the dense solve."""
    rng = np.random.default_rng(2)
    nb = 20
    obs = jnp.array(rng.normal(size=(nb, 3)), jnp.float32)

    def model(a, b):
        # row i: 3 residual entries; a couples via obs^2 (distinct from
        # b's obs coupling so the problem is non-degenerate).
        return obs * b + a[0] + a[1] * obs * obs

    a_gt = jnp.array([0.5, -1.0])
    b_gt = jnp.array(rng.normal(size=(nb, 1)), jnp.float32)
    target = model(a_gt, b_gt)

    def residual_rows(a, b):
        return model(a, b) - target

    a, b, cost = optimize_schur(
        residual_rows, jnp.zeros(2), jnp.zeros((nb, 1)), max_iterations=30)
    assert float(cost) < 1e-8
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_gt), atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_gt), atol=1e-3)
