import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3


RNG = np.random.default_rng(0)


def random_xi(scale_t=1.0, scale_r=1.0):
    v = RNG.uniform(-scale_t, scale_t, 3)
    w = RNG.uniform(-scale_r, scale_r, 3)
    return jnp.array(np.concatenate([v, w]), jnp.float32)


def test_exp_log_roundtrip():
    for _ in range(20):
        xi = random_xi(0.5, 1.2)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-5)


def test_exp_log_small_angle():
    xi = jnp.array([1e-9, -2e-9, 3e-9, 1e-10, -1e-10, 2e-10], jnp.float32)
    T = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(T.q)))
    np.testing.assert_allclose(np.asarray(se3.log(T)), np.asarray(xi), atol=1e-12)


def test_identity_and_inverse():
    T = se3.exp(random_xi())
    I = se3.mul(T, se3.inverse(T))
    np.testing.assert_allclose(np.abs(np.asarray(I.q)[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-6)


def test_action_matches_matrix():
    T = se3.exp(random_xi())
    p = jnp.array(RNG.normal(size=(17, 3)), jnp.float32)
    m = np.asarray(se3.to_matrix(T))
    expect = np.asarray(p) @ m[:, :3].T + m[:, 3]
    np.testing.assert_allclose(np.asarray(se3.act(T, p)), expect, atol=1e-5)


def test_compose_action():
    A = se3.exp(random_xi())
    B = se3.exp(random_xi())
    p = jnp.array(RNG.normal(size=(5, 3)), jnp.float32)
    lhs = se3.act(se3.mul(A, B), p)
    rhs = se3.act(A, se3.act(B, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_matrix_roundtrip():
    for _ in range(10):
        T = se3.exp(random_xi())
        m = se3.to_matrix(T)
        T2 = se3.from_matrix(m)
        q, q2 = np.asarray(T.q), np.asarray(T2.q)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-6)


def test_interpolate_endpoints():
    A = se3.exp(random_xi())
    B = se3.exp(random_xi())
    for alpha, ref in ((0.0, A), (1.0, B)):
        I = se3.interpolate(A, B, alpha)
        qa, qb = np.asarray(I.q), np.asarray(ref.q)
        if np.dot(qa, qb) < 0:
            qb = -qb
        np.testing.assert_allclose(qa, qb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), np.asarray(ref.t), atol=1e-6)


def test_interpolate_midpoint_rotation_angle():
    w = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.8], jnp.float32)
    A = se3.identity()
    B = se3.exp(w)
    M = se3.interpolate(A, B, 0.5)
    xi = np.asarray(se3.log(M))
    np.testing.assert_allclose(xi[5], 0.4, atol=1e-5)


def test_batched_exp():
    xis = jnp.array(RNG.normal(size=(8, 6)) * 0.3, jnp.float32)
    T = se3.exp(xis)
    assert T.q.shape == (8, 4)
    for i in range(8):
        Ti = se3.exp(xis[i])
        np.testing.assert_allclose(np.asarray(T.q[i]), np.asarray(Ti.q), atol=1e-6)


def test_ate_moments_match_host_se3_alignment():
    """Device-moments + host-SVD ATE (synthetic.ate_moments_device /
    ate_rmse_from_moments — the crash-proof bench path, BENCH_r04
    long_run.read_error) must equal the host Horn/Umeyama reference
    ate_rmse(align='se3')."""
    from badslam_tpu import synthetic as syn

    rng = np.random.default_rng(3)
    n = 50
    gt_t = rng.normal(size=(n, 3)).astype(np.float32)
    # est = a rigidly-moved, noisy copy of gt
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0.0],
                  [np.sin(ang), np.cos(ang), 0.0],
                  [0.0, 0.0, 1.0]])
    est_t = (gt_t @ R.T + np.array([0.3, -0.1, 0.2])
             + 0.01 * rng.normal(size=(n, 3))).astype(np.float32)

    C, se_m, sg = syn.ate_moments_device(jnp.asarray(est_t), gt_t)
    got = syn.ate_rmse_from_moments(np.asarray(C), float(se_m),
                                    float(sg), n)

    identity_q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    mk = lambda ts: [se3.SE3(identity_q, t) for t in ts]
    want = syn.ate_rmse(mk(est_t), mk(gt_t), align="se3")
    # f32 device moments vs the f64 host path: the residual
    # se + sg - 2*trace cancels heavily, so tolerance is ~1e-3 relative.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
